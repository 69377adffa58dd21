import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aadg_tpu.ops import diffaug as D


@pytest.fixture
def imgs(rng):
    return jnp.asarray(rng.random((2, 16, 16, 3)), jnp.float32)


def test_ste_round_identity_gradient():
    g = jax.grad(lambda x: jnp.sum(D.ste_round(x * 7.3)))(jnp.ones(4))
    np.testing.assert_allclose(np.asarray(g), 7.3, rtol=1e-6)


def test_all_ops_preserve_shape_and_range(imgs):
    key = jax.random.PRNGKey(0)
    m = jnp.full((2,), 0.5)
    for name, fn in D.DIFF_OPS:
        out = fn(imgs, m, key)
        assert out.shape == imgs.shape, name
        assert np.all(np.isfinite(np.asarray(out))), name
        assert float(out.min()) >= -1e-3 and float(out.max()) <= 1.001, name


@pytest.mark.slow  # grad through all 19 relaxed ops: ~12 s host-bound
def test_gradients_flow_to_policy_params(imgs):
    params = D.init_policy_params(jax.random.PRNGKey(0))

    def loss(p):
        out = D.apply_diffaug(p, imgs, jax.random.PRNGKey(1))
        return jnp.mean((out - 0.2) ** 2)

    g = jax.grad(loss)(params)
    assert np.any(np.asarray(g["magnitude"]) != 0)
    assert np.any(np.asarray(g["prob_logit"]) != 0)
    assert np.all(np.isfinite(np.asarray(g["magnitude"])))


def test_apply_diffaug_jits(imgs):
    params = D.init_policy_params(jax.random.PRNGKey(0))
    out = jax.jit(D.apply_diffaug)(params, imgs, jax.random.PRNGKey(2))
    assert out.shape == imgs.shape


def test_zero_prob_is_identity(imgs):
    params = D.init_policy_params(jax.random.PRNGKey(0))
    params = {**params, "prob_logit": jnp.full_like(
        params["prob_logit"], -50.0)}  # sigmoid -> ~0
    out = D.apply_diffaug(params, imgs, jax.random.PRNGKey(3),
                          temperature=0.01)
    np.testing.assert_allclose(np.asarray(out), np.asarray(imgs), atol=1e-3)


def test_equalize_flattens_histogram(rng):
    # a skewed image should become closer to uniform after equalization
    x = jnp.asarray((rng.random((1, 32, 32, 3)) ** 3), jnp.float32)
    out = D.d_equalize(x, None, None)
    # equalized CDF should be closer to the identity than the input's
    def cdf_dev(v):
        s = np.sort(np.asarray(v).reshape(-1))
        u = np.linspace(0, 1, s.size)
        return np.abs(s - u).mean()
    assert cdf_dev(out) < cdf_dev(x)
