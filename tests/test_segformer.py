"""SegFormer (MiT) model contract + stochastic depth behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aadg_tpu.models.segformer import SegFormer


@pytest.mark.slow
def test_segformer_contract():
    m = SegFormer(num_classes=2, variant="mit_b0")
    x = jnp.zeros((1, 64, 64, 3))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    logits, feat = m.apply(v, x, train=False)
    assert logits.shape == (1, 64, 64, 2)
    assert feat.shape == (1, 256)  # b0 last-stage width
    assert np.isfinite(np.asarray(logits)).all()


@pytest.mark.slow
def test_drop_path_train_vs_eval():
    m = SegFormer(num_classes=2, variant="mit_b0", drop_path_rate=0.5)
    x = jnp.ones((4, 32, 32, 3))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    # eval: deterministic, identical to a rate-0 model (identity branches)
    e1, _ = m.apply(v, x, train=False)
    e0, _ = SegFormer(num_classes=2, variant="mit_b0").apply(
        v, x, train=False)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e0))
    # train: stochastic per rng; params carry no extra entries (DropPath
    # is parameter-free, so checkpoints stay naming-compatible)
    (t1, _), _ = m.apply(v, x, train=True, mutable=["batch_stats"],
                         rngs={"dropout": jax.random.PRNGKey(1)})
    (t2, _), _ = m.apply(v, x, train=True, mutable=["batch_stats"],
                         rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(t1), np.asarray(t2))


def test_variant_table_b4_b5():
    # mix_transformer.py:374-424 hyperparameters: b4 depths (3,8,27,3),
    # b5 (3,6,40,3); both 512-wide last stage, heads (1,2,5,8), mlp x4
    from aadg_tpu.models.segformer import VARIANTS
    for name, depths in (("mit_b4", (3, 8, 27, 3)),
                         ("mit_b5", (3, 6, 40, 3))):
        dims, d, heads, srs, mlp = VARIANTS[name]
        assert d == depths, name
        assert dims == (64, 128, 320, 512), name
        assert heads == (1, 2, 5, 8) and srs == (8, 4, 2, 1) and mlp == 4


@pytest.mark.slow
def test_segformer_b4_contract():
    m = SegFormer(num_classes=2, variant="mit_b4")
    x = jnp.zeros((1, 32, 32, 3))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    logits, feat = m.apply(v, x, train=False)
    assert logits.shape == (1, 32, 32, 2)
    assert feat.shape == (1, 512)
    assert np.isfinite(np.asarray(logits)).all()


@pytest.mark.slow
def test_mit_remat_identical_tree_outputs_grads():
    """remat=True (per-block nn.remat over the MiT blocks) must be a pure
    scheduling change: identical variable tree (explicit block names),
    identical outputs and gradients. The lever's production case is
    b4/b5 x 512^2 training; equality is shape-independent, so b0 at 32^2
    proves it."""
    x = jnp.linspace(0.0, 1.0, 2 * 32 * 32 * 3).reshape((2, 32, 32, 3))
    base = SegFormer(num_classes=2, variant="mit_b0")
    rmt = SegFormer(num_classes=2, variant="mit_b0", remat=True)
    v = base.init(jax.random.PRNGKey(0), x, train=False)
    v2 = rmt.init(jax.random.PRNGKey(0), x, train=False)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(v2)), \
        "remat changed the variable tree"

    def loss(model, params):
        (logits, feat), _ = model.apply(
            {**v, "params": params}, x, train=True,
            mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(1)})
        return jnp.mean(logits ** 2) + jnp.mean(feat ** 2)

    l1, g1 = jax.value_and_grad(lambda p: loss(base, p))(v["params"])
    l2, g2 = jax.value_and_grad(lambda p: loss(rmt, p))(v["params"])
    # not bit-identical: remat moves XLA fusion boundaries, so the attn
    # softmax/matmul reductions reassociate at f32-ulp scale (measured
    # max abs grad delta 1.2e-6; loss delta 6e-7 rel)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)
