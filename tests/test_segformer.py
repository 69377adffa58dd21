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
