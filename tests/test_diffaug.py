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


def test_op_table_matches_reference_class_list():
    # the 19 `_Operation` classes of `data/operations.py:142-399`, with
    # their magnitude_scale / flip_magnitude defaults
    specs = {s.name: s for s in D.DIFF_OPS}
    assert len(D.DIFF_OPS) == 19
    assert specs["ShearX"].magnitude_scale == 0.3
    assert specs["TranslateY"].magnitude_scale == 0.45
    assert specs["Rotate"].magnitude_scale == 30.0
    assert specs["Hue"].magnitude_scale == 2.0
    for name in ("ShearX", "ShearY", "TranslateX", "TranslateY", "Rotate",
                 "Contrast", "Saturate", "Brightness", "Sharpness"):
        assert specs[name].flip_magnitude, name
    for name in ("HorizontalFlip", "VerticalFlip", "Invert", "Gray",
                 "AutoContrast", "Equalize"):
        assert not specs[name].has_magnitude, name


def test_all_ops_preserve_shape_and_range(imgs):
    key = jax.random.PRNGKey(0)
    for spec in D.DIFF_OPS:
        m = jnp.full((2,), 0.5) * spec.magnitude_scale
        out = spec.fn(imgs, m, key)
        assert out.shape == imgs.shape, spec.name
        assert np.all(np.isfinite(np.asarray(out))), spec.name
        assert float(out.min()) >= -1e-3 and float(out.max()) <= 1.001, \
            spec.name


def test_geometric_ops_reference_semantics(imgs):
    key = jax.random.PRNGKey(0)
    zero = jnp.zeros((2,))
    # zero magnitude = identity for the warps
    for fn in (D.d_shear_x, D.d_shear_y, D.d_translate_x, D.d_translate_y,
               D.d_rotate):
        np.testing.assert_allclose(np.asarray(fn(imgs, zero, key)),
                                   np.asarray(imgs), atol=1e-5)
    # flips are exact axis reversals
    np.testing.assert_array_equal(np.asarray(D.d_hflip(imgs, None, key)),
                                  np.asarray(imgs[:, :, ::-1]))
    np.testing.assert_array_equal(np.asarray(D.d_vflip(imgs, None, key)),
                                  np.asarray(imgs[:, ::-1]))
    # translate by +0.25 of width moves content right and zero-fills
    t = D.d_translate_x(imgs, jnp.full((2,), -0.25), key)
    np.testing.assert_allclose(np.asarray(t[:, :, 4:]),
                               np.asarray(imgs[:, :, :-4]), atol=1e-5)
    assert float(jnp.abs(t[:, :, :4]).max()) < 1e-6
    # warp gradients flow to the magnitude
    g = jax.grad(lambda m: jnp.sum(D.d_rotate(imgs, m, key)))(
        jnp.full((2,), 10.0))
    assert np.all(np.isfinite(np.asarray(g))) and np.any(
        np.asarray(g) != 0)


def test_blend_ops_match_reference_formulas(imgs):
    """`functional.py`: color ops are _blend_image(img, target, 1 - mag);
    _gray uses the 0.110 blue weight."""
    key = jax.random.PRNGKey(0)
    m = jnp.full((2,), 0.3)
    x = np.asarray(imgs, np.float64)
    gray = (x[..., :1] * 0.299 + x[..., 1:2] * 0.587 + x[..., 2:] * 0.110)
    want = np.clip(gray + (1 - 0.3) * (x - gray), 0, 1)
    np.testing.assert_allclose(np.asarray(D.d_saturate(imgs, m, key)),
                               want, atol=1e-5)
    want_b = np.clip((1 - 0.3) * x, 0, 1)
    np.testing.assert_allclose(np.asarray(D.d_brightness(imgs, m, key)),
                               want_b, atol=1e-6)
    # contrast blends toward the ROUNDED gray mean
    gm = np.floor((gray * 255).reshape(2, -1).mean(1) + 0.5)[..., None,
                                                            None, None] / 255
    want_c = np.clip(gm + (1 - 0.3) * (x - gm), 0, 1)
    np.testing.assert_allclose(np.asarray(D.d_contrast(imgs, m, key)),
                               want_c, atol=1e-5)


def test_solarize_hard_threshold_grads_to_magnitude(imgs):
    key = jax.random.PRNGKey(0)
    m = jnp.full((2,), 0.5)
    out = D.d_solarize(imgs, m, key)
    x = np.asarray(imgs)
    np.testing.assert_allclose(np.asarray(out),
                               np.where(x < 0.5, x, 1 - x), atol=1e-6)
    # reference STE: gradient flows to the magnitude, not the image
    gm = jax.grad(lambda mm: jnp.sum(D.d_solarize(imgs, mm, key)))(m)
    assert np.all(np.asarray(gm) != 0)
    gi = jax.grad(lambda im: jnp.sum(D.d_solarize(im, m, key)))(imgs)
    np.testing.assert_allclose(np.asarray(gi), 0.0)


def test_hue_wraps_and_full_cycle_is_identity(imgs):
    key = jax.random.PRNGKey(0)
    out = D.d_hue(imgs, jnp.full((2,), 1.0), key)  # full wrap
    np.testing.assert_allclose(np.asarray(out), np.asarray(imgs),
                               atol=2e-5)


def test_sample_pairing_blends_batch(imgs):
    key = jax.random.PRNGKey(4)
    out = D.d_sample_pairing(imgs, jnp.full((2,), 0.5), key)
    x = np.asarray(imgs)
    # result is a 50/50 blend of the two batch elements in some order
    blend = 0.5 * (x[0] + x[1])
    got = np.asarray(out)
    assert (np.allclose(got[0], blend, atol=1e-6)
            or np.allclose(got[0], x[0], atol=1e-6))


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
