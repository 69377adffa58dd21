"""On-device augmentation engine (the TPU replacement for PIL transforms).

The reference applies PIL ops per sample in DataLoader worker processes
(`/root/reference/data/basic.py:12-264`, dispatched by `data/policy.py:7-61`).
On TPU we instead apply augmentation *inside the jitted train step*: images
stay in HBM as float32 [0, 255] NHWC tensors, each op is a pure
``(img, mask, level, key) -> (img, mask)`` function, a sub-policy is a
``lax.switch`` chain over the op table, and the whole thing is ``vmap``-ed
over (batch x domains x M policies). Policies are *tensor inputs* (int
arrays), so changing the policy never retraces the step.

Op semantics are PIL-faithful (validated pixel-exact against PIL in
``tests/test_augment_golden.py``):

- LUT ops (autocontrast/equalize/solarize/posterize/invert/gamma) quantize
  with C-style truncation, matching PIL 12's point() tables.
- Enhance ops (contrast/color/brightness/sharpness) are Image.blend with
  truncation; grayscale uses PIL's exact fixed-point luma
  ``(19595 R + 38470 G + 7471 B + 0x8000) >> 16``.
- Geometric ops use PIL's output->input affine convention sampled at pixel
  centers (x+0.5, y+0.5) with NEAREST resampling and black fill; masks get
  the same transform (PIL applies transform/rotate to the mask too,
  `data/basic.py:16-67`).

The op table ordering below matches ``augment_list()``
(`data/basic.py:231-251`): indices 0..9 are the search space, 10..13 the
``for_autoaug`` extras, and 14+ the rest of the in-repo op library.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

# Truncation-boundary epsilon: LUT values are rationals like k*255/d whose
# f32 evaluation can undershoot an exact integer; legitimate fractional
# parts are ≤ 254/255 ≈ 0.99608, so 3e-4 can never flip a true boundary.
_TRUNC_EPS = 3e-4


def _quantize(x: jnp.ndarray) -> jnp.ndarray:
    """C-style (int) truncation + clip to uint8 range, kept in f32."""
    return jnp.clip(jnp.floor(x + _TRUNC_EPS), 0.0, 255.0)


def _luma(img: jnp.ndarray) -> jnp.ndarray:
    """PIL convert('L'): fixed-point ITU-R 601-2 luma."""
    r = img[..., 0].astype(jnp.int32)
    g = img[..., 1].astype(jnp.int32)
    b = img[..., 2].astype(jnp.int32)
    return ((r * 19595 + g * 38470 + b * 7471 + 0x8000) >> 16).astype(
        jnp.float32)


def _blend(degenerate: jnp.ndarray, img: jnp.ndarray,
           factor: jnp.ndarray) -> jnp.ndarray:
    """PIL Image.blend(degenerate, img, factor) with uint8 truncation."""
    return _quantize(degenerate + factor * (img - degenerate))


# ---------------------------------------------------------------------------
# Photometric ops (image only; mask untouched) — `data/basic.py:70-134`
# ---------------------------------------------------------------------------

def autocontrast(img, mask, v, key):
    del v, key
    lo = jnp.min(img, axis=(0, 1))
    hi = jnp.max(img, axis=(0, 1))
    scale = 255.0 / jnp.maximum(hi - lo, 1.0)
    out = _quantize((img - lo) * scale)
    return jnp.where(hi > lo, out, img), mask


def invert(img, mask, v, key):
    del v, key
    return 255.0 - img, mask


def _nibble_one_hots(vals: jnp.ndarray):
    """(P,) ints in [0,255] -> two (P, 16) bf16 one-hots of the high/low
    nibbles (v = 16*hi + lo).

    The TPU-native primitive behind histogram and LUT application. A flat
    (P, 256) one-hot works (sorts / element gathers are pathologically
    slow on TPU) but materializes 256 bf16 lanes per pixel in HBM; the
    rank-1 nibble factorization one_hot256 = outer(hi_oh, lo_oh) carries
    the same exact integer information in 2x16 lanes — 8x less traffic
    for the same MXU FLOPs. All values involved (0/1 indicators, LUT
    entries <= 255, f32-accumulated counts) are exact."""
    bins = jnp.arange(16, dtype=jnp.int32)
    hi = (vals >> 4)[:, None] == bins[None, :]
    lo = (vals & 0xF)[:, None] == bins[None, :]
    return hi.astype(jnp.bfloat16), lo.astype(jnp.bfloat16)


def _hist_and_apply_lut(ch: jnp.ndarray, make_lut) -> jnp.ndarray:
    """Compute the 256-bin histogram of a channel and apply the LUT
    ``make_lut(hist)`` to it, via nibble-factored one-hot matmuls:

    - histogram: hist[16h+l] = (hi_ohᵀ @ lo_oh)[h, l] — one (16,P)@(P,16)
      MXU matmul;
    - LUT apply: out[p] = Σ_h hi_oh[p,h] · (lo_oh[p] · LUT[h,:]) — one
      (P,16)@(16,16) matmul + a 16-lane masked row-sum.
    """
    shape = ch.shape
    vals = ch.reshape(-1).astype(jnp.int32)
    hi_oh, lo_oh = _nibble_one_hots(vals)
    hist2d = jax.lax.dot_general(
        hi_oh, lo_oh, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # (16, 16) counts
    hist = hist2d.reshape(256).astype(jnp.int32)
    lut = make_lut(hist).astype(jnp.bfloat16).reshape(16, 16)
    t = jnp.dot(lo_oh, lut.T, preferred_element_type=jnp.float32)  # (P,16)
    out = jnp.sum(t * hi_oh.astype(jnp.float32), axis=1)
    return out.reshape(shape)


def _equalize_lut(hist: jnp.ndarray, total: int) -> jnp.ndarray:
    """PIL ImageOps.equalize per-channel LUT from a 256-bin int histogram.
    The single source of truth for both the per-op path and the fused
    switcher (bit-identical parity depends on it)."""
    bins = jnp.arange(256, dtype=jnp.int32)
    # last *nonzero* bin's count (PIL subtracts histo[-1] of the
    # nonzero-filtered histogram, not h[255])
    nz = hist > 0
    idx_last = 255 - jnp.argmax(nz[::-1])
    step = (total - jnp.sum(jnp.where(bins == idx_last, hist, 0))) // 255
    n0 = step // 2
    csum_excl = jnp.cumsum(hist) - hist  # count < k
    lut = jnp.clip((n0 + csum_excl) // jnp.maximum(step, 1), 0, 255)
    return jnp.where(step > 0, lut, bins)


def equalize(img, mask, v, key):
    """PIL ImageOps.equalize: per-channel integer-LUT histogram
    equalization. Histogram and LUT application are one-hot matmuls (MXU);
    no sort, no gather."""
    del v, key
    h, w, _ = img.shape
    total = h * w
    out = jnp.stack(
        [_hist_and_apply_lut(img[..., c],
                             lambda hist: _equalize_lut(hist, total))
         for c in range(3)],
        axis=-1)
    return out, mask


def solarize(img, mask, v, key):
    del key
    thresh = v  # level * 256
    return jnp.where(img < thresh, img, 255.0 - img), mask


def _posterize_bits(img, bits):
    keep = jnp.left_shift(
        jnp.int32(0xFF), 8 - bits) & 0xFF
    return (img.astype(jnp.int32) & keep).astype(jnp.float32)


def posterize(img, mask, v, key):
    del key
    bits = jnp.floor(v).astype(jnp.int32)  # v in [4, 8]
    return _posterize_bits(img, bits), mask


def posterize2(img, mask, v, key):
    del key
    bits = jnp.floor(v).astype(jnp.int32)  # v in [0, 4]
    return _posterize_bits(img, bits), mask


def contrast(img, mask, v, key):
    del key
    mean = jnp.floor(jnp.mean(_luma(img)) + 0.5)
    return _blend(mean, img, v), mask


def color(img, mask, v, key):
    del key
    gray = _luma(img)[..., None]
    return _blend(gray, img, v), mask


def brightness(img, mask, v, key):
    del key
    return _blend(0.0, img, v), mask


def sharpness(img, mask, v, key):
    """PIL ImageEnhance.Sharpness: blend with SMOOTH-filtered image.

    SMOOTH = 3x3 kernel [[1,1,1],[1,5,1],[1,1,1]]/13; PIL's ImageFilter
    leaves the 1-pixel border unfiltered (copied from the source).
    """
    del key
    # 3x3 SMOOTH as 9 shifted adds (VALID region): XLA fuses these into a
    # single VPU pass — measured ~3x faster than a vmapped 1-channel
    # conv_general_dilated on TPU for the 144-image hot batch
    h, w, _ = img.shape
    weights = ((1., 1., 1.), (1., 5., 1.), (1., 1., 1.))
    sm = jnp.zeros((h - 2, w - 2, img.shape[-1]), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            sm = sm + weights[dy][dx] * img[dy:dy + h - 2, dx:dx + w - 2, :]
    sm = sm / 13.0
    # PIL's kernel filter quantizes the degenerate image with rounding
    # (+0.5), unlike the truncating LUT/blend ops
    sm = jnp.clip(jnp.floor(sm + 0.5), 0.0, 255.0)
    # border: PIL leaves the 1-pixel border unfiltered (copied from the
    # source), so only the interior is blended. A static border mask +
    # where lowers to one fused select pass; .at[].set() lowered to an XLA
    # scatter costing ~10 ms/step at 512² in the vmapped hot path.
    sm_full = jnp.pad(sm, ((1, 1), (1, 1), (0, 0)))
    interior = jnp.zeros((h, w, 1), jnp.bool_).at[1:-1, 1:-1, :].set(True)
    return jnp.where(interior, _blend(sm_full, img, v), img), mask


def gamma_correction(img, mask, v, key):
    """`data/basic.py:123-134`: ((i/255)**(1/gamma)*255).astype(uint8),
    evaluated directly per pixel (arithmetic beats a LUT gather on TPU)."""
    del key
    inv_gamma = 1.0 / v
    out = jnp.floor(((img / 255.0) ** inv_gamma) * 255.0 + _TRUNC_EPS)
    return out, mask


# ---------------------------------------------------------------------------
# Cutout — `data/basic.py:137-167` (affects BOTH image and mask)
# ---------------------------------------------------------------------------

def cutout(img, mask, v, key):
    """v is the *fractional* size; pixels inside the box get (127,127,127)
    on the image and 0 on the mask. PIL's rectangle fill is inclusive of
    both corners."""
    h, w, _ = img.shape
    size = v * w
    kx, ky = jax.random.split(key)
    x0u = jax.random.uniform(kx, (), minval=0.0, maxval=float(w))
    y0u = jax.random.uniform(ky, (), minval=0.0, maxval=float(h))
    x0 = jnp.floor(jnp.maximum(0.0, x0u - size / 2.0))
    y0 = jnp.floor(jnp.maximum(0.0, y0u - size / 2.0))
    x1 = jnp.minimum(float(w), x0 + size)
    y1 = jnp.minimum(float(h), y0 + size)
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    inside = ((xs >= x0) & (xs <= x1) & (ys >= y0) & (ys <= y1))
    inside = inside & (size > 0.0)
    img = jnp.where(inside[..., None], 127.0, img)
    mask = jnp.where(inside, 0.0, mask)
    return img, mask


def cutout_abs(img, mask, v, key):
    h, w, _ = img.shape
    return cutout(img, mask, v / w, key)


# ---------------------------------------------------------------------------
# Geometric ops — shared affine warp (PIL transform/rotate semantics)
# ---------------------------------------------------------------------------

def affine_warp(img: jnp.ndarray, mask: jnp.ndarray,
                mat: Tuple) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Apply PIL's output->input affine with NEAREST resampling, black fill.

    ``mat = (a, b, c, d, e, f)``: source = (a*(x+.5)+b*(y+.5)+c,
    d*(x+.5)+e*(y+.5)+f), truncated to the containing pixel.
    """
    a, b, c, d, e, f = mat
    h, w = img.shape[0], img.shape[1]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :] + 0.5
    ys = jnp.arange(h, dtype=jnp.float32)[:, None] + 0.5
    sx = a * xs + b * ys + c
    sy = d * xs + e * ys + f
    ix = jnp.floor(sx).astype(jnp.int32)
    iy = jnp.floor(sy).astype(jnp.int32)
    valid = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
    ixc = jnp.clip(ix, 0, w - 1)
    iyc = jnp.clip(iy, 0, h - 1)
    img_out = jnp.where(valid[..., None], img[iyc, ixc], 0.0)
    mask_out = jnp.where(valid, mask[iyc, ixc], 0.0)
    return img_out, mask_out


def _mirror_sign(v, key):
    """random_mirror: flip magnitude sign with probability 0.5
    (`data/basic.py:9,14-15`)."""
    flip = jax.random.bernoulli(key, 0.5)
    return jnp.where(flip, -v, v)


def shear_x(img, mask, v, key):
    v = _mirror_sign(v, key)
    return affine_warp(img, mask, (1.0, v, 0.0, 0.0, 1.0, 0.0))


def shear_y(img, mask, v, key):
    v = _mirror_sign(v, key)
    return affine_warp(img, mask, (1.0, 0.0, 0.0, v, 1.0, 0.0))


def translate_x(img, mask, v, key):
    v = _mirror_sign(v, key) * img.shape[1]
    return affine_warp(img, mask, (1.0, 0.0, v, 0.0, 1.0, 0.0))


def translate_y(img, mask, v, key):
    v = _mirror_sign(v, key) * img.shape[0]
    return affine_warp(img, mask, (1.0, 0.0, 0.0, 0.0, 1.0, v))


def translate_x_abs(img, mask, v, key):
    v = _mirror_sign(v, key)
    return affine_warp(img, mask, (1.0, 0.0, v, 0.0, 1.0, 0.0))


def translate_y_abs(img, mask, v, key):
    v = _mirror_sign(v, key)
    return affine_warp(img, mask, (1.0, 0.0, 0.0, 0.0, 1.0, v))


def rotate(img, mask, v, key):
    """PIL Image.rotate(v): counterclockwise degrees about the center,
    NEAREST, no expand."""
    v = _mirror_sign(v, key)
    h, w = img.shape[0], img.shape[1]
    angle = -(v % 360.0) * (math.pi / 180.0)
    cos, sin = jnp.cos(angle), jnp.sin(angle)
    cx, cy = w / 2.0, h / 2.0
    c = cx - cos * cx - sin * cy
    f = cy + sin * cx - cos * cy
    return affine_warp(img, mask, (cos, sin, c, -sin, cos, f))


def flip(img, mask, v, key):
    """Horizontal mirror. Divergence from reference documented: the
    reference flips only the image and not the mask (`data/basic.py:82-83`),
    which mis-pairs image and label; we flip both. Flip is not in the
    search space, so the active path is unaffected."""
    del v, key
    return img[:, ::-1], mask[:, ::-1]


# ---------------------------------------------------------------------------
# CutMix (batch-level op; the reference's Policy queue variant is
# unreachable on the active path, `data/policy.py:24-27`, SURVEY §5 bugs)
# ---------------------------------------------------------------------------

def cutmix(img, mask, img2, mask2, key):
    """Paste a random box from (img2, mask2) into (img, mask)
    (`data/basic.py:195-219`)."""
    h, w = img.shape[0], img.shape[1]
    k1, k2, k3 = jax.random.split(key, 3)
    lam = jax.random.beta(k1, 1.0, 1.0)
    cut_rat = jnp.sqrt(1.0 - lam)
    cut_w = jnp.floor(w * cut_rat)
    cut_h = jnp.floor(h * cut_rat)
    cx = jax.random.randint(k2, (), 0, w).astype(jnp.float32)
    cy = jax.random.randint(k3, (), 0, h).astype(jnp.float32)
    x1 = jnp.clip(cx - cut_w // 2, 0, w)
    y1 = jnp.clip(cy - cut_h // 2, 0, h)
    x2 = jnp.clip(cx + cut_w // 2, 0, w)
    y2 = jnp.clip(cy + cut_h // 2, 0, h)
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    inside = (xs >= x1) & (xs < x2) & (ys >= y1) & (ys < y2)
    img = jnp.where(inside[..., None], img2, img)
    mask = jnp.where(inside, mask2, mask)
    return img, mask


def sample_pairing(img, mask, img2, v):
    """Blend with another image at alpha v (`data/basic.py:222-228`,
    SamplePairing: PIL.Image.blend(img1, img2, v) = (1-v) img1 + v img2);
    the mask is untouched. Batch-level op like cutmix."""
    return _blend(img, img2, v), mask


# ---------------------------------------------------------------------------
# Op table
# ---------------------------------------------------------------------------

# (name, fn, low, high) — order of the first 10 matches augment_list()
# (`data/basic.py:231-243`); 10..13 are the for_autoaug extras (:244-250);
# the rest complete the in-repo library (:12-134).
OP_TABLE: List[Tuple[str, Callable, float, float]] = [
    ("AutoContrast", autocontrast, 0.0, 1.0),
    ("Invert", invert, 0.0, 1.0),
    ("Equalize", equalize, 0.0, 1.0),
    ("Solarize", solarize, 0.0, 256.0),
    ("Posterize", posterize, 4.0, 8.0),
    ("Contrast", contrast, 0.1, 1.9),
    ("Color", color, 0.1, 1.9),
    ("Brightness", brightness, 0.1, 1.9),
    ("Sharpness", sharpness, 0.1, 1.9),
    ("Cutout", cutout, 0.0, 0.2),
    ("CutoutAbs", cutout_abs, 0.0, 20.0),
    ("Posterize2", posterize2, 0.0, 4.0),
    ("TranslateXAbs", translate_x_abs, 0.0, 10.0),
    ("TranslateYAbs", translate_y_abs, 0.0, 10.0),
    ("ShearX", shear_x, -0.3, 0.3),
    ("ShearY", shear_y, -0.3, 0.3),
    ("TranslateX", translate_x, -0.45, 0.45),
    ("TranslateY", translate_y, -0.45, 0.45),
    ("Rotate", rotate, -30.0, 30.0),
    ("Flip", flip, 0.0, 1.0),
    ("GammaCorrection", gamma_correction, 0.5, 4.5),
]

OP_NAMES = [t[0] for t in OP_TABLE]
OP_INDEX: Dict[str, int] = {n: i for i, n in enumerate(OP_NAMES)}


def augment_list(for_autoaug: bool = False) -> List[str]:
    """Search-space op names, ordering identical to the reference
    ``augment_list`` (`data/basic.py:231-251`)."""
    names = OP_NAMES[:10]
    if for_autoaug:
        names = names + OP_NAMES[10:14]
    return names


def search_space_ops(exclude_ops=()) -> List[str]:
    return [n for n in augment_list() if n not in set(exclude_ops)]


def apply_augment(img, mask, name: str, level, key):
    """Single named op at ``level`` in [0,1] (`data/basic.py:258-260`)."""
    idx = OP_INDEX[name]
    _, fn, low, high = OP_TABLE[idx]
    return fn(img, mask, level * (high - low) + low, key)


# ---------------------------------------------------------------------------
# Fused search-space switcher
#
# Under vmap, lax.switch over ops executes EVERY branch for every sample
# and selects — so the per-slot cost is the *sum* of all op costs. The
# search space (`data/basic.py:231-243`) is photometric + Cutout, and all
# of its ops except Color/Sharpness/Cutout are per-channel 256-entry
# integer LUTs on uint8 pixels. The fused switcher therefore:
#   1. computes shared statistics once (per-channel histograms via nibble
#      one-hot MXU matmuls, PIL fixed-point luma, its mean),
#   2. builds each op's (3, 256) LUT (256-wide math — trivial) and selects
#      the active one by op index,
#   3. applies ONE LUT via the nibble-factored matmul path, and
#   4. selects among just 4 full-size candidates (LUT result, Color,
#      Sharpness, Cutout) instead of 10.
# Semantics are bit-identical to the per-op branches (same integer LUT
# contents, same truncation); tests/test_augment_fused.py checks
# fused == generic for every op x magnitude.
# ---------------------------------------------------------------------------

_LUT_OPS = ("AutoContrast", "Invert", "Equalize", "Solarize", "Posterize",
            "Contrast", "Brightness")
_FUSABLE_OPS = _LUT_OPS + ("Color", "Sharpness", "Cutout")


def _lut_autocontrast(hist3, total, mean_luma, v, bins):
    del total, mean_luma, v
    idx = jnp.arange(256, dtype=jnp.int32)
    nz = hist3 > 0
    lo = jnp.min(jnp.where(nz, idx[None, :], 256), axis=1).astype(
        jnp.float32)
    hi = jnp.max(jnp.where(nz, idx[None, :], -1), axis=1).astype(
        jnp.float32)
    scale = 255.0 / jnp.maximum(hi - lo, 1.0)
    lut = _quantize((bins[None, :] - lo[:, None]) * scale[:, None])
    return jnp.where((hi > lo)[:, None], lut, bins[None, :])


def _lut_invert(hist3, total, mean_luma, v, bins):
    del hist3, total, mean_luma, v
    return jnp.broadcast_to(255.0 - bins, (3, 256))


def _lut_equalize(hist3, total, mean_luma, v, bins):
    del mean_luma, v
    return jax.vmap(
        lambda hist: _equalize_lut(hist.astype(jnp.int32),
                                   total).astype(jnp.float32))(hist3)


def _lut_solarize(hist3, total, mean_luma, v, bins):
    del hist3, total, mean_luma
    return jnp.broadcast_to(jnp.where(bins < v, bins, 255.0 - bins),
                            (3, 256))


def _lut_posterize(hist3, total, mean_luma, v, bins):
    del hist3, total, mean_luma
    lut = _posterize_bits(bins, jnp.floor(v).astype(jnp.int32))
    return jnp.broadcast_to(lut, (3, 256))


def _lut_contrast(hist3, total, mean_luma, v, bins):
    del hist3, total
    return jnp.broadcast_to(_blend(mean_luma, bins, v), (3, 256))


def _lut_brightness(hist3, total, mean_luma, v, bins):
    del hist3, total, mean_luma
    return jnp.broadcast_to(_blend(0.0, bins, v), (3, 256))


_LUT_BUILDERS = {
    "AutoContrast": _lut_autocontrast, "Invert": _lut_invert,
    "Equalize": _lut_equalize, "Solarize": _lut_solarize,
    "Posterize": _lut_posterize, "Contrast": _lut_contrast,
    "Brightness": _lut_brightness,
}


def make_fused_op_switcher(op_names: List[str],
                           use_pallas: Optional[bool] = None):
    """LUT-fused switcher for search-space op sets; None if ``op_names``
    contains an op outside the fusable set (caller falls back to the
    generic lax.switch).

    ``use_pallas`` (default off) routes the histogram + LUT application
    through the VMEM-resident Pallas kernels (`ops/lut_pallas.py`)
    instead of the jnp one-hot matmuls — bit-identical results; measured
    at parity on TPU (see lut_pallas.py docstring), kept opt-in."""
    if not set(op_names) <= set(_FUSABLE_OPS):
        return None
    from . import lut_pallas as _lutp
    if use_pallas is None:
        use_pallas = _lutp.use_pallas_default()
    K = len(op_names)
    lut_names = [n for n in op_names if n in _LUT_OPS]
    lows = jnp.asarray([OP_TABLE[OP_INDEX[n]][2] for n in op_names],
                       jnp.float32)
    highs = jnp.asarray([OP_TABLE[OP_INDEX[n]][3] for n in op_names],
                        jnp.float32)
    # candidate index per op: 0 = LUT result, then Color/Sharpness/Cutout
    specials = [n for n in ("Color", "Sharpness", "Cutout")
                if n in op_names]
    case_of = {n: (1 + specials.index(n) if n in specials else 0)
               for n in op_names}
    case_map = jnp.asarray([case_of[n] for n in op_names], jnp.int32)
    lut_slot = jnp.asarray(
        [lut_names.index(n) if n in lut_names else 0 for n in op_names],
        jnp.int32)
    need_hist = any(n in ("AutoContrast", "Equalize") for n in lut_names)
    need_luma = any(n in ("Contrast", "Color") for n in op_names)
    need_mean = "Contrast" in lut_names
    bins = jnp.arange(256, dtype=jnp.float32)

    def switcher(op_idx, level, img, mask, key):
        h, w, _ = img.shape
        total = h * w
        v_all = level * (highs - lows) + lows  # (K,) per-op magnitudes

        luma = _luma(img) if need_luma else None
        mean_luma = (jnp.floor(jnp.mean(luma) + 0.5) if need_mean
                     else jnp.float32(0.0))

        out_img = img
        out_mask = mask
        if lut_names:
            pallas_ok = use_pallas and _lutp.supported(h, w)
            if pallas_ok:
                hist3 = (_lutp.hist3_pallas(img) if need_hist
                         else jnp.zeros((3, 256), jnp.float32))
                hi_oh = lo_oh = None
            else:
                vals = img.reshape(-1, 3).astype(jnp.int32)  # (P, 3)
                hi_oh, lo_oh = jax.vmap(_nibble_one_hots, in_axes=1,
                                        out_axes=0)(vals)  # (3, P, 16)
                if need_hist:
                    hist3 = jax.vmap(
                        lambda a, b: jax.lax.dot_general(
                            a, b, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32))(
                                hi_oh, lo_oh).reshape(3, 256)
                else:
                    hist3 = jnp.zeros((3, 256), jnp.float32)

            luts = jnp.stack([
                _LUT_BUILDERS[n](hist3, total, mean_luma,
                                 v_all[op_names.index(n)], bins)
                for n in lut_names])  # (Kl, 3, 256)
            sel = jax.nn.one_hot(lut_slot[op_idx], len(lut_names),
                                 dtype=jnp.float32)
            lut = jnp.einsum("k,kcb->cb", sel, luts)  # (3, 256)

            if pallas_ok:
                out_img = _lutp.lut_apply3_pallas(img, lut)
            else:
                # apply: out[p,c] = lut[c, img[p,c]] via nibble matmuls;
                # every value involved is an exact small integer, so bf16
                # is exact and halves the (P, 16) temp traffic
                lut16 = lut.reshape(3, 16, 16).astype(jnp.bfloat16)
                t = jax.vmap(lambda lo, lc: jnp.dot(
                    lo, lc.T, preferred_element_type=jnp.bfloat16))(
                        lo_oh, lut16)  # (3, P, 16)
                lut_out = jnp.sum(t * hi_oh, axis=2,
                                  dtype=jnp.float32)  # (3, P)
                out_img = lut_out.T.reshape(img.shape)

        candidates = [out_img]
        for name in specials:
            v = v_all[op_names.index(name)]
            if name == "Color":
                candidates.append(_blend(luma[..., None], img, v))
            elif name == "Sharpness":
                candidates.append(sharpness(img, mask, v, key)[0])
            else:  # Cutout
                cut_i, cut_m = cutout(img, mask, v, key)
                candidates.append(cut_i)
                out_mask = jnp.where(case_map[op_idx] == case_of["Cutout"],
                                     cut_m, mask)
        if len(candidates) > 1:
            out_img = _static_select(case_map[op_idx], candidates)
        return out_img, out_mask

    return switcher


def _static_select(idx, candidates):
    """select_n over a short static candidate list."""
    return jax.lax.select_n(idx, *candidates)


def make_op_switcher(op_names: List[str]) -> Callable:
    """Build ``(op_idx, level, img, mask, key) -> (img, mask)`` dispatching
    via lax.switch over ``op_names`` (the active search space)."""
    branches = []
    for name in op_names:
        _, fn, low, high = OP_TABLE[OP_INDEX[name]]

        def branch(level, img, mask, key, fn=fn, low=low, high=high):
            return fn(img, mask, level * (high - low) + low, key)

        branches.append(branch)

    def switcher(op_idx, level, img, mask, key):
        return jax.lax.switch(op_idx, branches, level, img, mask, key)

    return switcher


def make_policy_applier(op_names: List[str], n_subpolicies: int,
                        L: int, num_mags: int) -> Callable:
    """Build the per-sample policy applier.

    Returns ``apply(img, mask, policy, key) -> (img, mask)`` where
    ``policy`` is an int32 array of shape (Q, L, 2) holding (op_idx,
    mag_idx) pairs; a random sub-policy q is drawn per call (reference
    `data/policy.py:23`), then its L ops run sequentially."""
    switcher = make_fused_op_switcher(op_names) or make_op_switcher(op_names)

    def apply(img, mask, policy, key):
        kq, kops = jax.random.split(key)
        q = jax.random.randint(kq, (), 0, n_subpolicies)
        ops = policy[q, :, 0]
        mags = policy[q, :, 1].astype(jnp.float32) / (num_mags - 1)
        keys = jax.random.split(kops, L)
        for l in range(L):
            img, mask = switcher(ops[l], mags[l], img, mask, keys[l])
        return img, mask

    return apply


def make_multi_policy_applier(op_names: List[str], n_subpolicies: int,
                              L: int, num_mags: int) -> Callable:
    """Batched DGMultiPolicy (`data/policy.py:45-61`): apply M policies to
    every sample.

    Returns ``apply(imgs, masks, policies, key)`` with
    imgs (N, H, W, 3), masks (N, H, W), policies (M, Q, L, 2) ->
    (N, M, H, W, 3), (N, M, H, W).

    ``key`` may also be a per-sample key array of shape (N, key_dims)
    (pre-split by the caller — the DP path derives shard windows of a
    global split so multi-chip augmentation draws match single-chip)."""
    single = make_policy_applier(op_names, n_subpolicies, L, num_mags)

    def apply_one_sample(img, mask, policies, key):
        keys = jax.random.split(key, policies.shape[0])
        return jax.vmap(single, in_axes=(None, None, 0, 0))(
            img, mask, policies, keys)

    def apply(imgs, masks, policies, key):
        if key.ndim == 2:  # per-sample keys, already split
            keys = key
        else:
            keys = jax.random.split(key, imgs.shape[0])
        return jax.vmap(apply_one_sample, in_axes=(0, 0, None, 0))(
            imgs, masks, policies, keys)

    return apply
