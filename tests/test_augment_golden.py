"""Golden tests: on-device augmentation ops vs PIL reference semantics.

Each photometric op must reproduce PIL's uint8 output exactly (they are LUT /
blend ops with deterministic quantization). Geometric ops are compared
against PIL's affine/rotate with a tiny pixel tolerance: PIL's C loop
accumulates the source coordinate incrementally in floating point, so a
handful of pixels sit on truncation boundaries that flip (measured ~2/256 on
random 16x16 inputs).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import PIL
import PIL.ImageOps
import PIL.ImageEnhance
import PIL.ImageFilter
from PIL import Image

from aadg_tpu.ops import augment as A


@pytest.fixture
def img_mask(rng):
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    mask = rng.integers(0, 2, (32, 32), dtype=np.uint8) * 255
    return img, mask


def _run(fn, img, mask, v=0.0, seed=0):
    key = jax.random.PRNGKey(seed)
    out_img, out_mask = fn(jnp.asarray(img, jnp.float32),
                           jnp.asarray(mask, jnp.float32), v, key)
    return np.asarray(out_img).astype(np.uint8), np.asarray(out_mask)


class TestPhotometricGolden:
    def test_invert(self, img_mask):
        img, mask = img_mask
        out, m = _run(A.invert, img, mask)
        ref = np.asarray(PIL.ImageOps.invert(Image.fromarray(img)))
        np.testing.assert_array_equal(out, ref)
        np.testing.assert_array_equal(m, mask)

    def test_autocontrast(self, img_mask):
        img, mask = img_mask
        out, _ = _run(A.autocontrast, img, mask)
        ref = np.asarray(PIL.ImageOps.autocontrast(Image.fromarray(img)))
        np.testing.assert_array_equal(out, ref)

    def test_autocontrast_constant_channel(self):
        img = np.full((8, 8, 3), 77, dtype=np.uint8)
        out, _ = _run(A.autocontrast, img, np.zeros((8, 8), np.uint8))
        ref = np.asarray(PIL.ImageOps.autocontrast(Image.fromarray(img)))
        np.testing.assert_array_equal(out, ref)

    def test_equalize(self, img_mask):
        img, mask = img_mask
        out, _ = _run(A.equalize, img, mask)
        ref = np.asarray(PIL.ImageOps.equalize(Image.fromarray(img)))
        np.testing.assert_array_equal(out, ref)

    def test_equalize_skewed_histogram(self, rng):
        # heavily skewed histogram exercises the integer-LUT edge cases
        img = (rng.random((64, 64, 3)) ** 4 * 255).astype(np.uint8)
        out, _ = _run(A.equalize, img, np.zeros((64, 64), np.uint8))
        ref = np.asarray(PIL.ImageOps.equalize(Image.fromarray(img)))
        np.testing.assert_array_equal(out, ref)

    @pytest.mark.parametrize("level", [0.0, 0.3, 0.77, 1.0])
    def test_solarize(self, img_mask, level):
        img, mask = img_mask
        out, _ = _run(A.solarize, img, mask, v=level * 256.0)
        ref = np.asarray(PIL.ImageOps.solarize(Image.fromarray(img),
                                               level * 256.0))
        np.testing.assert_array_equal(out, ref)

    @pytest.mark.parametrize("level", [0.0, 0.5, 0.99])
    def test_posterize(self, img_mask, level):
        img, mask = img_mask
        v = level * 4.0 + 4.0
        out, _ = _run(A.posterize, img, mask, v=v)
        ref = np.asarray(PIL.ImageOps.posterize(Image.fromarray(img), int(v)))
        np.testing.assert_array_equal(out, ref)

    @pytest.mark.parametrize("factor", [0.1, 0.73, 1.0, 1.9])
    def test_contrast(self, img_mask, factor):
        img, mask = img_mask
        out, _ = _run(A.contrast, img, mask, v=factor)
        ref = np.asarray(PIL.ImageEnhance.Contrast(
            Image.fromarray(img)).enhance(factor))
        np.testing.assert_array_equal(out, ref)

    @pytest.mark.parametrize("factor", [0.1, 0.73, 1.9])
    def test_color(self, img_mask, factor):
        img, mask = img_mask
        out, _ = _run(A.color, img, mask, v=factor)
        ref = np.asarray(PIL.ImageEnhance.Color(
            Image.fromarray(img)).enhance(factor))
        np.testing.assert_array_equal(out, ref)

    @pytest.mark.parametrize("factor", [0.1, 0.73, 1.9])
    def test_brightness(self, img_mask, factor):
        img, mask = img_mask
        out, _ = _run(A.brightness, img, mask, v=factor)
        ref = np.asarray(PIL.ImageEnhance.Brightness(
            Image.fromarray(img)).enhance(factor))
        np.testing.assert_array_equal(out, ref)

    @pytest.mark.parametrize("factor", [0.1, 0.73, 1.9])
    def test_sharpness(self, img_mask, factor):
        img, mask = img_mask
        out, _ = _run(A.sharpness, img, mask, v=factor)
        ref = np.asarray(PIL.ImageEnhance.Sharpness(
            Image.fromarray(img)).enhance(factor))
        np.testing.assert_array_equal(out, ref)

    @pytest.mark.parametrize("gamma", [0.5, 1.0, 2.2, 4.5])
    def test_gamma_correction(self, img_mask, gamma):
        img, mask = img_mask
        out, _ = _run(A.gamma_correction, img, mask, v=gamma)
        inv = 1.0 / gamma
        table = np.array([((i / 255.0) ** inv) * 255
                          for i in range(256)]).astype("uint8")
        ref = table[img]
        np.testing.assert_array_equal(out, ref)


class TestGeometricGolden:
    @pytest.mark.parametrize("mat", [
        (1, 0.23, 0, 0, 1, 0),     # ShearX
        (1, 0, 0, -0.17, 1, 0),    # ShearY (negative)
        (1, 0, 5.3, 0, 1, 0),      # TranslateX
        (1, 0, 0, 0, 1, -7.1),     # TranslateY
    ])
    def test_affine_matches_pil(self, img_mask, mat):
        img, mask = img_mask
        out_img, out_mask = A.affine_warp(
            jnp.asarray(img, jnp.float32), jnp.asarray(mask, jnp.float32),
            mat)
        pim = Image.fromarray(img).transform((32, 32), Image.AFFINE, mat)
        pma = Image.fromarray(mask).transform((32, 32), Image.AFFINE, mat)
        mismatch = (np.asarray(out_img).astype(np.uint8) != np.asarray(pim))
        assert mismatch.mean() < 0.01
        mismatch_m = (np.asarray(out_mask).astype(np.uint8) != np.asarray(pma))
        assert mismatch_m.mean() < 0.01

    @pytest.mark.parametrize("angle", [0.0, 17.0, -23.0, 30.0])
    def test_rotate_matches_pil(self, img_mask, angle):
        img, mask = img_mask
        # bypass the mirror randomness by calling the warp directly
        import math
        h, w = 32, 32
        a = -(angle % 360.0) * math.pi / 180.0
        cos, sin = math.cos(a), math.sin(a)
        cx, cy = w / 2.0, h / 2.0
        mat = (cos, sin, cx - cos * cx - sin * cy,
               -sin, cos, cy + sin * cx - cos * cy)
        out_img, _ = A.affine_warp(jnp.asarray(img, jnp.float32),
                                   jnp.asarray(mask, jnp.float32), mat)
        ref = np.asarray(Image.fromarray(img).rotate(angle))
        mismatch = (np.asarray(out_img).astype(np.uint8) != ref)
        assert mismatch.mean() < 0.02

    def test_flip_both_image_and_mask(self, img_mask):
        img, mask = img_mask
        out, m = _run(A.flip, img, mask)
        np.testing.assert_array_equal(out, img[:, ::-1])
        np.testing.assert_array_equal(m, mask[:, ::-1])


class TestCutout:
    def test_cutout_fills_gray_and_zeroes_mask(self, img_mask):
        img, mask = img_mask
        mask = np.full_like(mask, 200)
        out, m = _run(A.cutout, img, mask, v=0.2, seed=3)
        cut = (m == 0)
        assert cut.sum() > 0
        assert np.all(out[cut] == 127)
        # rectangle: the cut region is a contiguous box
        rows = np.where(cut.any(axis=1))[0]
        cols = np.where(cut.any(axis=0))[0]
        assert np.all(cut[rows[0]:rows[-1] + 1, cols[0]:cols[-1] + 1])

    def test_cutout_zero_magnitude_identity(self, img_mask):
        img, mask = img_mask
        out, m = _run(A.cutout, img, mask, v=0.0)
        np.testing.assert_array_equal(out, img)
        np.testing.assert_array_equal(m, mask)


class TestPolicyApplier:
    def test_multi_policy_shapes_and_search_space(self, img_mask, rng):
        img, mask = img_mask
        imgs = jnp.asarray(np.stack([img] * 3), jnp.float32)
        masks = jnp.asarray(np.stack([mask] * 3), jnp.float32)
        names = A.augment_list()
        assert names == ["AutoContrast", "Invert", "Equalize", "Solarize",
                         "Posterize", "Contrast", "Color", "Brightness",
                         "Sharpness", "Cutout"]
        apply = A.make_multi_policy_applier(names, n_subpolicies=5, L=2,
                                            num_mags=10)
        policies = jnp.asarray(
            rng.integers(0, 10, (4, 5, 2, 2)), jnp.int32)
        out_i, out_m = jax.jit(apply)(imgs, masks, policies,
                                      jax.random.PRNGKey(0))
        assert out_i.shape == (3, 4, 32, 32, 3)
        assert out_m.shape == (3, 4, 32, 32)
        assert np.all(np.asarray(out_i) >= 0) and np.all(
            np.asarray(out_i) <= 255)

    def test_exclude_ops(self):
        names = A.search_space_ops(exclude_ops=["Invert", "Cutout"])
        assert "Invert" not in names and "Cutout" not in names
        assert len(names) == 8

    def test_apply_augment_named(self, img_mask):
        img, mask = img_mask
        out, _ = A.apply_augment(jnp.asarray(img, jnp.float32),
                                 jnp.asarray(mask, jnp.float32),
                                 "Invert", 0.5, jax.random.PRNGKey(0))
        ref = np.asarray(PIL.ImageOps.invert(Image.fromarray(img)))
        np.testing.assert_array_equal(np.asarray(out).astype(np.uint8), ref)
