"""Pallas histogram/LUT kernels == jnp nibble-matmul path, bit-exact.

On CPU the kernels run via the Pallas interpreter (slow but exact); on
TPU they compile to Mosaic. The fused switcher's use_pallas flag is also
exercised end-to-end against the generic lax.switch path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # Pallas interpret mode on CPU: ~100 s
from jax.experimental.pallas import tpu as pltpu

from aadg_tpu.ops import augment as aug
from aadg_tpu.ops import lut_pallas


def _img(key, h, w):
    return jax.random.randint(key, (h, w, 3), 0, 256).astype(jnp.float32)


@pytest.mark.parametrize("hw", [(64, 64), (32, 32)])
def test_hist_kernel_exact(hw):
    h, w = hw
    img = _img(jax.random.PRNGKey(0), h, w)
    with pltpu.force_tpu_interpret_mode():
        hist = np.asarray(lut_pallas.hist3_pallas(img))
    ref = np.stack([
        np.bincount(np.asarray(img[..., c]).astype(np.int64).ravel(),
                    minlength=256) for c in range(3)])
    np.testing.assert_array_equal(hist, ref.astype(np.float32))


@pytest.mark.parametrize("hw", [(64, 64), (32, 32)])
def test_apply_kernel_exact(hw):
    h, w = hw
    img = _img(jax.random.PRNGKey(1), h, w)
    luts = jax.random.randint(jax.random.PRNGKey(2), (3, 256), 0,
                              256).astype(jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(lut_pallas.lut_apply3_pallas(img, luts))
    luts_np = np.asarray(luts)
    idx = np.asarray(img).astype(np.int64)
    ref = np.stack([luts_np[c][idx[..., c]] for c in range(3)], axis=-1)
    np.testing.assert_array_equal(out, ref.astype(np.float32))


def test_block_support():
    assert lut_pallas.supported(512, 512)
    assert lut_pallas.supported(256, 256)
    assert lut_pallas.supported(64, 64)
    assert not lut_pallas.supported(40, 36)  # falls back to jnp path


def test_fused_switcher_pallas_matches_generic():
    names = aug.augment_list()
    fused = aug.make_fused_op_switcher(names, use_pallas=True)
    generic = aug.make_op_switcher(names)
    key = jax.random.PRNGKey(3)
    with pltpu.force_tpu_interpret_mode():
        for op_idx in (0, 2, 4, 5, 9):  # autocontrast/equalize/posterize/
            key, k_img, k_op = jax.random.split(key, 3)  # contrast/cutout
            img = _img(k_img, 32, 32)
            mask = jnp.zeros((32, 32), jnp.float32)
            fi, fm = fused(jnp.int32(op_idx), jnp.float32(0.7), img, mask,
                           k_op)
            gi, gm = generic(jnp.int32(op_idx), jnp.float32(0.7), img,
                             mask, k_op)
            np.testing.assert_array_equal(np.asarray(fi), np.asarray(gi),
                                          err_msg=names[op_idx])
            np.testing.assert_array_equal(np.asarray(fm), np.asarray(gm))


def test_fused_switcher_pallas_under_vmap():
    names = aug.augment_list()
    fused = aug.make_fused_op_switcher(names, use_pallas=True)
    ref = aug.make_fused_op_switcher(names, use_pallas=False)
    n = 4
    key = jax.random.PRNGKey(4)
    k_img, k_ops, k_lvl, k_keys = jax.random.split(key, 4)
    imgs = jax.random.randint(k_img, (n, 32, 32, 3), 0, 256).astype(
        jnp.float32)
    masks = jnp.zeros((n, 32, 32), jnp.float32)
    op_idx = jax.random.randint(k_ops, (n,), 0, len(names))
    levels = jax.random.uniform(k_lvl, (n,))
    keys = jax.random.split(k_keys, n)
    with pltpu.force_tpu_interpret_mode():
        fi, fm = jax.vmap(fused)(op_idx, levels, imgs, masks, keys)
    gi, gm = jax.vmap(ref)(op_idx, levels, imgs, masks, keys)
    np.testing.assert_array_equal(np.asarray(fi), np.asarray(gi))
    np.testing.assert_array_equal(np.asarray(fm), np.asarray(gm))
