import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aadg_tpu import models
from aadg_tpu.models import controller as C
from aadg_tpu.models.deeplab import DeepLabV3Plus
from aadg_tpu.models.unet import UNet


class TestController:
    @pytest.fixture
    def spec(self):
        return C.ControllerSpec(num_ops=10)

    def test_sample_shapes(self, spec):
        params = C.init_params(jax.random.PRNGKey(0), spec)
        pols, op_p, mag_p, logp, ent = C.sample(
            params, spec, jax.random.PRNGKey(1), 6)
        assert pols.shape == (6, 20)
        assert op_p.shape == (10,) and mag_p.shape == (10,)
        assert logp.shape == (6,) and ent.shape == (6,)
        assert float(jnp.sum(op_p)) == pytest.approx(1.0, abs=1e-4)
        # op tokens < num_ops, mag tokens < num_mags (alternating layout)
        toks = np.asarray(pols).reshape(6, 5, 2, 2)
        assert toks[..., 0].max() < 10 and toks[..., 1].max() < 10

    def test_evaluate_matches_sample_logprobs(self, spec):
        params = C.init_params(jax.random.PRNGKey(0), spec)
        pols, _, _, logp, _ = C.sample(params, spec, jax.random.PRNGKey(2), 4)
        logp_eval = C.evaluate(params, spec, pols)
        np.testing.assert_allclose(np.asarray(logp), np.asarray(logp_eval),
                                   atol=1e-5)

    def test_evaluate_differentiable(self, spec):
        params = C.init_params(jax.random.PRNGKey(0), spec)
        pols, *_ = C.sample(params, spec, jax.random.PRNGKey(3), 2)
        g = jax.grad(lambda p: jnp.sum(C.evaluate(p, spec, pols)))(params)
        norms = [float(jnp.abs(x).sum())
                 for x in jax.tree_util.tree_leaves(g)]
        assert any(n > 0 for n in norms)

    def test_sampling_deterministic_under_key(self, spec):
        params = C.init_params(jax.random.PRNGKey(0), spec)
        a = C.sample(params, spec, jax.random.PRNGKey(7), 3)[0]
        b = C.sample(params, spec, jax.random.PRNGKey(7), 3)[0]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_policies_to_tensor(self, spec):
        pols = jnp.arange(20, dtype=jnp.int32)[None]
        t = C.policies_to_tensor(pols, spec)
        assert t.shape == (1, 5, 2, 2)
        # token order: (op, mag) pairs
        np.testing.assert_array_equal(np.asarray(t[0, 0]), [[0, 1], [2, 3]])


class TestDiscriminators:
    def test_momentum_branches_and_update(self):
        disc = models.MomentumFeatureDiscriminator(3, 64)
        x = jnp.ones((4, 64))
        variables = disc.init(jax.random.PRNGKey(0), x)
        params = variables["params"]
        out_online = disc.apply({"params": params}, x, momentum=False)
        out_mom = disc.apply({"params": params}, x, momentum=True)
        assert out_online.shape == (4, 3)
        # branches initialized independently -> different outputs
        assert not np.allclose(np.asarray(out_online), np.asarray(out_mom))
        # sync copies online -> momentum
        synced = models.synchronize_parameters(params)
        out_mom2 = disc.apply({"params": synced}, x, momentum=True)
        np.testing.assert_allclose(np.asarray(out_online),
                                   np.asarray(out_mom2), rtol=1e-6)
        # EMA: m=0.999 moves momentum slightly toward online
        upd = models.momentum_update(params, m=0.999)
        w_old = params["momentum"]["dis"]["kernel"]
        w_new = upd["momentum"]["dis"]["kernel"]
        w_q = params["online"]["dis"]["kernel"]
        np.testing.assert_allclose(np.asarray(w_new),
                                   np.asarray(0.999 * w_old + 0.001 * w_q),
                                   rtol=1e-6)

    def test_momentum_branch_blocks_gradients(self):
        disc = models.MomentumFeatureDiscriminator(3, 16)
        x = jnp.ones((2, 16))
        params = disc.init(jax.random.PRNGKey(0), x)["params"]

        def loss(p):
            return jnp.sum(disc.apply({"params": p}, x, momentum=True))

        g = jax.grad(loss)(params)
        assert all(float(jnp.abs(v).sum()) == 0
                   for v in jax.tree_util.tree_leaves(g))

    def test_image_discriminator(self):
        disc = models.ImageDiscriminator(3)
        x = jnp.ones((2, 64, 64, 3))
        variables = disc.init(jax.random.PRNGKey(0), x, train=False)
        out, fe = disc.apply(variables, x, train=False, return_feature=True)
        assert out.shape == (2, 3) and fe.shape == (2, 128)


class TestSegModels:
    @pytest.mark.slow  # full UNet compile: 23 s warm (r5 tiering)
    def test_unet_contract(self):
        model = UNet(in_channels=3, out_channels=2)
        x = jnp.zeros((1, 64, 64, 3))
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        logits, feat = model.apply(variables, x, train=False)
        assert logits.shape == (1, 64, 64, 2)
        assert feat.shape == (1, 512)

    @pytest.mark.slow
    def test_deeplab_contract(self):
        model = DeepLabV3Plus(num_classes=2)
        x = jnp.zeros((1, 128, 128, 3))
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        logits, feat = model.apply(variables, x, train=False)
        assert logits.shape == (1, 128, 128, 2)
        assert feat.shape == (1, 1280)
        # train mode updates batch stats
        (logits, feat), upd = model.apply(
            variables, jnp.ones((2, 128, 128, 3)), train=True,
            mutable=["batch_stats"])
        assert "batch_stats" in upd


@pytest.mark.slow
def test_deeplab_remat_identical_tree_outputs_grads():
    """remat=True (per-block nn.remat in the MobileNetV2 encoder) must be
    a pure scheduling change: identical param/stat tree (explicit
    sequential block names = the unlifted auto-names, so checkpoints
    interoperate), identical outputs, identical gradients."""
    x = jnp.linspace(0, 255, 2 * 64 * 64 * 3).reshape((2, 64, 64, 3))
    base = DeepLabV3Plus(num_classes=2)
    rmt = DeepLabV3Plus(num_classes=2, remat=True)
    v = base.init(jax.random.PRNGKey(0), x, train=False)
    v2 = rmt.init(jax.random.PRNGKey(0), x, train=False)
    p1 = jax.tree_util.tree_structure(v)
    p2 = jax.tree_util.tree_structure(v2)
    assert p1 == p2, "remat changed the variable tree"

    def loss(model, variables):
        (logits, feat), _ = model.apply(variables, x, train=True,
                                        mutable=["batch_stats"])
        return jnp.mean(logits ** 2) + jnp.mean(feat ** 2)

    l1, g1 = jax.value_and_grad(lambda p: loss(base, {**v, "params": p}))(
        v["params"])
    l2, g2 = jax.value_and_grad(lambda p: loss(rmt, {**v, "params": p}))(
        v["params"])
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
