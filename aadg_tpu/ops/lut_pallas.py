"""Pallas TPU kernels: uint8 histogram + 256-entry LUT application.

An opt-in alternative backend for the photometric augmentation engine.
The reference does these per sample on the CPU via PIL's C
histogram/point() loops (`/root/reference/data/basic.py:70-134`); the
pure-jnp path (`augment._hist_and_apply_lut`) replaces per-element
gathers with nibble-factored one-hot matmuls. These kernels were built on
the hypothesis that the jnp path's (P, 16) one-hot temporaries cost HBM
traffic; keeping them in VMEM (image read once, output written once)
would then be speed of light. Measurement falsified the hypothesis — see
MEASURED RESULT below.

Layout: the (H, W, 3) f32 image (exact integers 0..255) is viewed as
(8, L) with L = H*W*3/8 — dense sublane x lane tiling, channel id of a
lane = col % 3 (valid because L and the block width are multiples of 3).

Channel selection is folded into the one-hot itself: the low-nibble
one-hot is built against the 48-key cid*16 + (v & 0xF), so the
per-channel LUT/histogram contraction is ONE matmul with a (16, 48)
operand instead of per-channel mask multiplies:

  hist[h, 16c+l]  = dot(hi_oh16, lo_oh48)[h, 16c+l]      (MXU, f32 acc)
  out[p] = sum_h hi_oh16[h,p] * (lutB @ lo_oh48)[h,p],   lutB[h, 16c+l]
                                                         = lut[c, 16h+l]

All values are exact small integers, so bf16 operands are exact; the
histogram accumulates in f32. Bit-identical to the jnp path
(tests/test_lut_pallas.py), which remains the fallback for CPU runs and
for shapes whose L has no block-aligned divisor.

MEASURED RESULT (TPU v5e, 144 images @512², hist+apply): pallas 5.87 ms
vs jnp 5.14 ms. XLA already fuses the one-hot construction into the
matmul operands (the (P, 16) temporaries never reach HBM), so both
formulations sit at the VPU envelope (~100 vector ops/element for the
nibble compares + select-sum) and the kernel buys nothing. Kept as an
opt-in backend (`make_fused_op_switcher(..., use_pallas=True)`) and as
the measured record of why the jnp path is the default.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# block widths tried in order; must be multiples of lcm(128, 3) = 384
_BLOCK_WIDTHS = (3072, 1536, 768, 384)


def _pick_block(h: int, w: int) -> Optional[int]:
    n = h * w * 3
    if n % 24 != 0:
        return None
    length = n // 8
    for cb in _BLOCK_WIDTHS:
        if length % cb == 0:
            return cb
    return None


def _one_hots(x_row, cb: int):
    """(1, CB) f32 exact-int image row chunk -> (16, CB) high-nibble and
    (48, CB) channel-keyed low-nibble one-hots, bf16. (Mosaic's tpu.matmul
    wants 2D operands, so rows are processed individually.)"""
    xi = x_row.astype(jnp.int32)
    cid = jax.lax.broadcasted_iota(jnp.int32, (1, cb), 1) % 3
    hi = xi >> 4
    lo48 = cid * 16 + (xi & 0xF)
    i16 = jax.lax.broadcasted_iota(jnp.int32, (16, cb), 0)
    i48 = jax.lax.broadcasted_iota(jnp.int32, (48, cb), 0)
    hi_oh = (i16 == hi).astype(jnp.bfloat16)
    lo_oh = (i48 == lo48).astype(jnp.bfloat16)
    return hi_oh, lo_oh


def _hist_kernel(img_ref, hist_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        hist_ref[:] = jnp.zeros_like(hist_ref)

    cb = img_ref.shape[1]
    acc = jnp.zeros((16, 48), jnp.float32)
    for r in range(8):
        hi_oh, lo_oh = _one_hots(img_ref[r:r + 1, :], cb)
        # contract the CB element dim: (16, 48) partial histogram
        acc += jax.lax.dot_general(
            hi_oh, lo_oh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    hist_ref[:] += acc


def _apply_kernel(img_ref, lut_ref, out_ref):
    cb = img_ref.shape[1]
    lut_b = lut_ref[:]
    for r in range(8):
        hi_oh, lo_oh = _one_hots(img_ref[r:r + 1, :], cb)
        # u[h, col] = lut value of pixel col had its high nibble been h
        # (tpu.matmul requires a 32-bit accumulator)
        u = jax.lax.dot_general(
            lut_b, lo_oh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (16, CB)
        out_ref[r:r + 1, :] = jnp.sum(hi_oh.astype(jnp.float32) * u,
                                      axis=0, keepdims=True)


def hist3_pallas(img: jnp.ndarray) -> jnp.ndarray:
    """(H, W, 3) f32 exact-int image -> (3, 256) f32 per-channel counts."""
    h, w, _ = img.shape
    cb = _pick_block(h, w)
    assert cb is not None, f"unsupported shape {img.shape}"
    length = h * w * 3 // 8
    flat = img.reshape(8, length)
    hist16x48 = pl.pallas_call(
        _hist_kernel,
        grid=(length // cb,),
        in_specs=[pl.BlockSpec((8, cb), lambda j: (0, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((16, 48), lambda j: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((16, 48), jnp.float32),
    )(flat)
    # hist16x48[h, 16c+l] -> hist[c, 16h+l]
    return hist16x48.reshape(16, 3, 16).transpose(1, 0, 2).reshape(3, 256)


def lut_apply3_pallas(img: jnp.ndarray, luts: jnp.ndarray) -> jnp.ndarray:
    """Apply per-channel LUTs: out[y, x, c] = luts[c, img[y, x, c]].

    img (H, W, 3) f32 exact ints; luts (3, 256) f32 integer entries.
    """
    h, w, _ = img.shape
    cb = _pick_block(h, w)
    assert cb is not None, f"unsupported shape {img.shape}"
    length = h * w * 3 // 8
    flat = img.reshape(8, length)
    # lutB[h, 16c+l] = luts[c, 16h+l]
    lut_b = luts.reshape(3, 16, 16).transpose(1, 0, 2).reshape(
        16, 48).astype(jnp.bfloat16)
    out = pl.pallas_call(
        _apply_kernel,
        grid=(length // cb,),
        in_specs=[
            pl.BlockSpec((8, cb), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, 48), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, cb), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, length), jnp.float32),
    )(flat, lut_b)
    return out.reshape(h, w, 3)


def supported(h: int, w: int) -> bool:
    return _pick_block(h, w) is not None


def use_pallas_default() -> bool:
    """False: the jnp one-hot-matmul path measured marginally faster on
    TPU (see module docstring); the kernels stay available via the
    explicit ``use_pallas=True`` flag."""
    return False
