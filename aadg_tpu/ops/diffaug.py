"""Differentiable batched augmentation (Faster-AutoAugment style).

Capability match for the reference's dormant differentiable op layer
(`/root/reference/data/operations.py:16-399` + `data/functional.py:21-285`
+ `data/kernels.py:9-35`, SURVEY §2.2): every op takes a *learnable*
magnitude and probability, applies with a relaxed-Bernoulli gate, and
straight-through-estimates the non-differentiable quantizations — so a
policy can be optimized by gradient descent instead of RL.

The full 19-class operation surface is covered (`operations.py`):
ShearX/Y, TranslateX/Y, HorizontalFlip, VerticalFlip, Rotate (bilinear
affine warps, zero fill, image-center pivot), Invert, Solarize,
Posterize, Gray, Contrast, AutoContrast, Saturate, Brightness, Hue,
SamplePairing, Equalize, Sharpness — with each op's reference
``magnitude_scale`` and ``flip_magnitude`` (random per-sample sign)
semantics from the `_Operation` base (`operations.py:58-86`), and the
functional forms from `data/functional.py` (blend-style color ops are
``_blend_image(img, target, 1 - mag)``; Solarize/AutoContrast/Equalize
use the reference's exact STE routing). ``gaussian_blur3x3`` ships as an
extra functional like the reference's (no registered op class).

TPU re-design: ops are pure batched functions on NHWC float images in
[0, 1]; the STE is ``jax.lax.stop_gradient`` algebra; the relaxed
Bernoulli gate is a sigmoid of logistic noise; everything vmaps/jits.
(The gathers inside the geometric warps and equalize are acceptable —
this layer is off the search hot path, exactly as in the reference.)

Intentional divergence (reference bug, not replicated): the reference's
``posterize`` computes ``(x << shift) >> shift`` on int64, which is the
identity for every shift — a no-op on pixels (`functional.py:172-180`;
the intended op masks LOW bits). Here posterize quantizes to
``1 + 7*mag`` bits with a straight-through round, which is the actual
PIL-posterize behavior the op class advertises.

API:
    params = init_policy_params(key)              # magnitudes + probs
    out = apply_diffaug(params, imgs, key)        # differentiable
    grads flow to params through jax.grad.
"""

from __future__ import annotations

from typing import Callable, Dict, List, NamedTuple, Optional

import jax
import jax.numpy as jnp


def ste_round(x: jnp.ndarray) -> jnp.ndarray:
    """Straight-through rounding (`data/functional.py:21-46`): forward
    rounds, backward is identity."""
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


def ste_clip(x: jnp.ndarray, lo: float = 0.0, hi: float = 1.0) -> jnp.ndarray:
    return x + jax.lax.stop_gradient(jnp.clip(x, lo, hi) - x)


def ste_to(forward: jnp.ndarray, backward: jnp.ndarray) -> jnp.ndarray:
    """The reference's ``_STE``: forward value is ``forward``; gradients
    flow ONLY to ``backward`` (sum-reduced to its shape), none to
    ``forward`` (`functional.py:21-46`)."""
    return jax.lax.stop_gradient(forward - backward) + backward


def relaxed_bernoulli(key: jax.Array, prob: jnp.ndarray, shape,
                      temperature: float = 0.1) -> jnp.ndarray:
    """Concrete/Gumbel relaxation of Bernoulli(prob) in (0, 1)."""
    u = jax.random.uniform(key, shape, minval=1e-6, maxval=1.0 - 1e-6)
    logistic = jnp.log(u) - jnp.log1p(-u)
    logit = jnp.log(jnp.clip(prob, 1e-6, 1 - 1e-6)) - jnp.log1p(
        -jnp.clip(prob, 1e-6, 1 - 1e-6))
    return jax.nn.sigmoid((logit + logistic) / temperature)


# ---------------------------------------------------------------------------
# helpers (`data/functional.py:76-107`)
# ---------------------------------------------------------------------------

def _gray01(imgs: jnp.ndarray) -> jnp.ndarray:
    """Reference ``_gray`` — note the 0.110 blue weight quirk
    (`functional.py:85-87`), kept for parity."""
    return (imgs[..., 0] * 0.299 + imgs[..., 1] * 0.587 +
            imgs[..., 2] * 0.110)[..., None]


def _blend(img1, img2, alpha):
    """``_blend_image``: alpha=1 returns img1 (`functional.py:76-82`)."""
    alpha = alpha.reshape(-1, 1, 1, 1)
    return jnp.clip(img2 + alpha * (img1 - img2), 0.0, 1.0)


def _blur(imgs: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """3x3 depthwise filter with REFLECT padding (`functional.py:98-107`)."""
    x = jnp.pad(imgs, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    c = imgs.shape[-1]
    return jax.lax.conv_general_dilated(
        x, jnp.broadcast_to(kernel[:, :, None, None], (3, 3, 1, c)),
        (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c)


_SHARPNESS_KERNEL = jnp.array([[1., 1., 1.], [1., 5., 1.], [1., 1., 1.]]) / 13.


def _bilinear_warp(imgs: jnp.ndarray, mats: jnp.ndarray) -> jnp.ndarray:
    """Differentiable affine warp: ``mats`` (B, 2, 3) maps OUTPUT pixel
    coords to INPUT coords about the image center; bilinear sampling,
    zeros outside (kornia ``warp_affine`` conventions). Gradients flow to
    ``mats`` through the sample coordinates."""
    b, h, w, c = imgs.shape
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0

    def warp_one(img, m):
        sx = m[0, 0] * (xs - cx) + m[0, 1] * (ys - cy) + m[0, 2] + cx
        sy = m[1, 0] * (xs - cx) + m[1, 1] * (ys - cy) + m[1, 2] + cy
        x0 = jnp.floor(sx)
        y0 = jnp.floor(sy)
        fx = (sx - x0)[..., None]
        fy = (sy - y0)[..., None]

        def tap(yy, xx):
            valid = ((xx >= 0) & (xx < w) & (yy >= 0) & (yy < h))[..., None]
            px = img[jnp.clip(yy, 0, h - 1).astype(jnp.int32),
                     jnp.clip(xx, 0, w - 1).astype(jnp.int32)]
            return jnp.where(valid, px, 0.0)

        top = tap(y0, x0) * (1 - fx) + tap(y0, x0 + 1) * fx
        bot = tap(y0 + 1, x0) * (1 - fx) + tap(y0 + 1, x0 + 1) * fx
        return top * (1 - fy) + bot * fy

    return jnp.clip(jax.vmap(warp_one)(imgs, mats), 0.0, 1.0)


def _affine(imgs, a, bb, c, d, e, f):
    """Batched (B,) coefficient arrays -> (B, 2, 3) matrices."""
    row0 = jnp.stack([a, bb, c], axis=-1)
    row1 = jnp.stack([d, e, f], axis=-1)
    return _bilinear_warp(imgs, jnp.stack([row0, row1], axis=-2))


# ---------------------------------------------------------------------------
# Differentiable ops on (B, H, W, C) images in [0, 1]. ``m`` arrives
# already magnitude_scale'd (and sign-flipped where the op flips); see
# ``apply_diffaug``.
# ---------------------------------------------------------------------------

def d_shear_x(imgs, m, key):
    del key
    one = jnp.ones_like(m)
    zero = jnp.zeros_like(m)
    return _affine(imgs, one, m, zero, zero, one, zero)


def d_shear_y(imgs, m, key):
    del key
    one = jnp.ones_like(m)
    zero = jnp.zeros_like(m)
    return _affine(imgs, one, zero, zero, m, one, zero)


def d_translate_x(imgs, m, key):
    del key
    one = jnp.ones_like(m)
    zero = jnp.zeros_like(m)
    return _affine(imgs, one, zero, m * imgs.shape[2], zero, one, zero)


def d_translate_y(imgs, m, key):
    del key
    one = jnp.ones_like(m)
    zero = jnp.zeros_like(m)
    return _affine(imgs, one, zero, zero, zero, one, m * imgs.shape[1])


def d_rotate(imgs, m, key):
    """``m`` in degrees (scale 30 applied by the op table)."""
    del key
    theta = m * (jnp.pi / 180.0)
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    zero = jnp.zeros_like(m)
    return _affine(imgs, cos, sin, zero, -sin, cos, zero)


def d_hflip(imgs, m, key):
    del m, key
    return imgs[:, :, ::-1]


def d_vflip(imgs, m, key):
    del m, key
    return imgs[:, ::-1]


def d_invert(imgs, m, key):
    del m, key
    return 1.0 - imgs


def d_solarize(imgs, m, key):
    """`functional.py:165-169`: hard threshold forward; gradients flow to
    the magnitude only (the reference's STE routes none to the image)."""
    del key
    thresh = m.reshape(-1, 1, 1, 1)
    hard = jnp.where(imgs < thresh, imgs, 1.0 - imgs)
    return ste_to(hard, jnp.broadcast_to(thresh, hard.shape))


def d_posterize(imgs, m, key):
    del key
    bits = 1.0 + m * 7.0  # 1..8 bits, continuous
    levels = 2.0 ** bits.reshape(-1, 1, 1, 1)
    return ste_clip(ste_round(imgs * (levels - 1.0)) / (levels - 1.0))


def d_gray(imgs, m, key):
    del m, key
    return jnp.repeat(_gray01(imgs), imgs.shape[-1], axis=-1)


def d_contrast(imgs, m, key):
    """`functional.py:189-193`: blend toward the rounded gray mean with
    alpha = 1 - mag (the floor'd mean carries no gradient, as in torch)."""
    del key
    mean = jnp.mean(_gray01(imgs * 255.0), axis=(1, 2, 3), keepdims=True)
    mean = jax.lax.stop_gradient(jnp.floor(mean + 0.5) / 255.0)
    return _blend(imgs, jnp.broadcast_to(mean, imgs.shape), 1.0 - m)


def d_autocontrast(imgs, m, key):
    """`functional.py:196-208`: per-channel LUT stretch with floors;
    forward hard, backward identity to the image (reference STE)."""
    del m, key
    v = jnp.clip(imgs, 0.0, 1.0) * 255.0
    lo = jnp.min(v, axis=(1, 2), keepdims=True)
    hi = jnp.max(v, axis=(1, 2), keepdims=True)
    scale = 255.0 / (hi - lo + 0.1)
    # the floor can land at -1/255 on the min pixel; the reference's
    # tensor_function clamps every op's output (`functional.py:49-73`)
    hard = jnp.clip(jnp.floor((jnp.floor(v) - lo) * scale) / 255.0, 0., 1.)
    return ste_to(hard, imgs)


def d_saturate(imgs, m, key):
    """a.k.a. Color (`functional.py:211-215`)."""
    del key
    gray = jnp.broadcast_to(_gray01(imgs), imgs.shape)
    return _blend(imgs, gray, 1.0 - m)


# the flagship search space calls this op "Color"
d_color = d_saturate


def d_brightness(imgs, m, key):
    del key
    return _blend(imgs, jnp.zeros_like(imgs), 1.0 - m)


def _rgb_to_hsv01(imgs):
    r, g, b = imgs[..., 0], imgs[..., 1], imgs[..., 2]
    mx = jnp.max(imgs, axis=-1)
    mn = jnp.min(imgs, axis=-1)
    df = mx - mn
    safe = jnp.where(df > 0, df, 1.0)
    h = jnp.where(mx == r, ((g - b) / safe) % 6.0,
                  jnp.where(mx == g, (b - r) / safe + 2.0,
                            (r - g) / safe + 4.0))
    h = jnp.where(df > 0, h / 6.0, 0.0)
    s = jnp.where(mx > 0, df / jnp.where(mx > 0, mx, 1.0), 0.0)
    return h, s, mx


def _hsv01_to_rgb(h, s, v):
    h6 = (h % 1.0) * 6.0
    i = jnp.floor(h6)
    f = h6 - i
    p = v * (1 - s)
    q = v * (1 - f * s)
    t = v * (1 - (1 - f) * s)
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == k for k in range(6)], [v, q, p, p, t, v])
    g = jnp.select([i == k for k in range(6)], [t, v, v, q, p, p])
    b = jnp.select([i == k for k in range(6)], [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def d_hue(imgs, m, key):
    """`functional.py:225-230`: shift H (normalized to [0, 1)) by mag,
    wrap mod 1 (Hue's magnitude_scale is 2, so the full wrap is
    reachable)."""
    del key
    h, s, v = _rgb_to_hsv01(imgs)
    h = (h + m.reshape(-1, 1, 1)) % 1.0
    return jnp.clip(_hsv01_to_rgb(h, s, v), 0.0, 1.0)


def d_sample_pairing(imgs, m, key):
    """`functional.py:234-238`: blend with a random permutation of the
    batch."""
    idx = jax.random.permutation(key, imgs.shape[0])
    m = m.reshape(-1, 1, 1, 1)
    return jnp.clip((1.0 - m) * imgs + m * imgs[idx], 0.0, 1.0)


def d_equalize(imgs, m, key):
    """`functional.py:242-262`: the PIL-equalize CDF LUT (step, +step/2
    offset, 0.1 zero-div guard), forward hard, backward identity to the
    image."""
    del m, key

    def eq_channel(ch):  # (H, W) in [0, 1]
        v = jnp.floor(jnp.clip(ch, 0.0, 1.0) * 255.0).astype(jnp.int32)
        hist = jnp.bincount(v.reshape(-1), length=256).astype(jnp.float32)
        cdf = jnp.cumsum(hist)
        step = jnp.floor((cdf[-1] - hist[-1]) / 255.0)
        shifted = jnp.concatenate([jnp.zeros((1,)), cdf])[:256] \
            + jnp.floor(step / 2.0)
        lut = jnp.floor(shifted / (step + 0.1))
        return lut[v] / 255.0

    hard = jax.vmap(jax.vmap(eq_channel, in_axes=-1, out_axes=-1))(imgs)
    return ste_to(hard, imgs)


def d_sharpness(imgs, m, key):
    del key
    return _blend(imgs, _blur(imgs, _SHARPNESS_KERNEL), 1.0 - m)


def d_gaussian_blur3x3(imgs, m, key):
    """Extra functional like the reference's (`functional.py:275-281`,
    `kernels.py:16-31`): 3x3 gaussian whose sigma^2 is the mean
    magnitude squared; no registered op class."""
    del key
    sigma2 = jnp.mean(m) ** 2
    r = jnp.arange(-1, 2, dtype=jnp.float32) ** 2
    k = jnp.exp(-(r[:, None] + r[None, :]) / (2 * sigma2))
    return jnp.clip(_blur(imgs, k / jnp.sum(k)), 0.0, 1.0)


def d_cutout(imgs, m, key):
    """Not in the reference op table (its functional raises
    NotImplementedError); kept as a working extra for the flagship
    search space's Cutout."""
    b, h, w, _ = imgs.shape
    size = m * 0.2 * w
    kx, ky = jax.random.split(key)
    cx = jax.random.uniform(kx, (b,)) * w
    cy = jax.random.uniform(ky, (b,)) * h
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    half = (size / 2.0)[:, None, None]
    inside = ((jnp.abs(xs - cx[:, None, None]) <= half) &
              (jnp.abs(ys - cy[:, None, None]) <= half))
    return jnp.where(inside[..., None], 0.5, imgs)


class OpSpec(NamedTuple):
    """One `_Operation` class (`operations.py:142-399`): the functional,
    its magnitude scale, whether the magnitude randomly flips sign, and
    whether it has a magnitude at all (prob-only ops: None)."""
    name: str
    fn: Callable
    magnitude_scale: float
    flip_magnitude: bool
    has_magnitude: bool


# the reference's full 19-class op surface, same defaults
DIFF_OPS: List[OpSpec] = [
    OpSpec("ShearX", d_shear_x, 0.3, True, True),
    OpSpec("ShearY", d_shear_y, 0.3, True, True),
    OpSpec("TranslateX", d_translate_x, 0.45, True, True),
    OpSpec("TranslateY", d_translate_y, 0.45, True, True),
    OpSpec("HorizontalFlip", d_hflip, 1.0, False, False),
    OpSpec("VerticalFlip", d_vflip, 1.0, False, False),
    OpSpec("Rotate", d_rotate, 30.0, True, True),
    OpSpec("Invert", d_invert, 1.0, False, False),
    OpSpec("Solarize", d_solarize, 1.0, False, True),
    OpSpec("Posterize", d_posterize, 1.0, False, True),
    OpSpec("Gray", d_gray, 1.0, False, False),
    OpSpec("Contrast", d_contrast, 1.0, True, True),
    OpSpec("AutoContrast", d_autocontrast, 1.0, False, False),
    OpSpec("Saturate", d_saturate, 1.0, True, True),
    OpSpec("Brightness", d_brightness, 1.0, True, True),
    OpSpec("Hue", d_hue, 2.0, False, True),
    OpSpec("SamplePairing", d_sample_pairing, 1.0, False, True),
    OpSpec("Equalize", d_equalize, 1.0, False, False),
    OpSpec("Sharpness", d_sharpness, 1.0, True, True),
]


def init_policy_params(key: jax.Array, n_ops: Optional[int] = None) -> Dict:
    """Learnable per-op magnitude and application probability (logits),
    matching `_Operation`'s learnable Parameters
    (`data/operations.py:16-80`)."""
    n = n_ops or len(DIFF_OPS)
    k1, k2 = jax.random.split(key)
    return {
        "magnitude": jax.random.uniform(k1, (n,), minval=0.2, maxval=0.8),
        "prob_logit": jnp.zeros((n,)) + jax.random.normal(k2, (n,)) * 0.01,
    }


def apply_diffaug(params: Dict, imgs: jnp.ndarray, key: jax.Array,
                  temperature: float = 0.1) -> jnp.ndarray:
    """Apply every op gated by its relaxed-Bernoulli probability
    (`operations.py:58-73`: ``mask * op(x, mag) + (1 - mask) * x``, with
    ``mag = clamp(magnitude) * magnitude_scale`` and a random per-sample
    sign where ``flip_magnitude``); output is differentiable w.r.t.
    ``params``. imgs: (B, H, W, C) in [0, 1]."""
    b = imgs.shape[0]
    out = imgs
    keys = jax.random.split(key, 3 * len(DIFF_OPS))
    probs = jax.nn.sigmoid(params["prob_logit"])
    mags = jnp.clip(params["magnitude"], 0.0, 1.0)
    for i, spec in enumerate(DIFF_OPS):
        gate = relaxed_bernoulli(keys[3 * i], probs[i], (b,), temperature)
        m = jnp.broadcast_to(mags[i] * spec.magnitude_scale, (b,))
        if spec.flip_magnitude:  # `operations.py:68-70`
            sign = jnp.where(
                jax.random.bernoulli(keys[3 * i + 1], 0.5, (b,)), 1.0, -1.0)
            m = m * sign
        transformed = spec.fn(out, m, keys[3 * i + 2])
        out = jnp.clip(
            gate[:, None, None, None] * transformed +
            (1.0 - gate[:, None, None, None]) * out, 0.0, 1.0)
    return out
