"""Differentiable batched augmentation (Faster-AutoAugment style).

Capability match for the reference's dormant differentiable op layer
(`/root/reference/data/operations.py:16-399` + `data/functional.py:21-285`
+ `data/kernels.py:9-35`, SURVEY §2.2): every op takes a *learnable*
magnitude and probability, applies with a relaxed-Bernoulli gate, and
straight-through-estimates the non-differentiable quantizations — so a
policy can be optimized by gradient descent instead of RL.

TPU re-design: ops are pure batched functions on NHWC float images in
[0, 1] (the reference's convention for this layer); the STE is
``jax.lax.stop_gradient`` algebra; the relaxed Bernoulli gate is a
sigmoid of logistic noise; everything vmaps/jits.

API:
    params = init_policy_params(key, n_ops)       # magnitudes + probs
    out = apply_diffaug(params, imgs, key)        # differentiable
    grads flow to params through jax.grad.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Tuple

import jax
import jax.numpy as jnp


def ste_round(x: jnp.ndarray) -> jnp.ndarray:
    """Straight-through rounding (`data/functional.py:21-46`): forward
    rounds, backward is identity."""
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


def ste_clip(x: jnp.ndarray, lo: float = 0.0, hi: float = 1.0) -> jnp.ndarray:
    return x + jax.lax.stop_gradient(jnp.clip(x, lo, hi) - x)


def relaxed_bernoulli(key: jax.Array, prob: jnp.ndarray, shape,
                      temperature: float = 0.1) -> jnp.ndarray:
    """Concrete/Gumbel relaxation of Bernoulli(prob) in (0, 1)."""
    u = jax.random.uniform(key, shape, minval=1e-6, maxval=1.0 - 1e-6)
    logistic = jnp.log(u) - jnp.log1p(-u)
    logit = jnp.log(jnp.clip(prob, 1e-6, 1 - 1e-6)) - jnp.log1p(
        -jnp.clip(prob, 1e-6, 1 - 1e-6))
    return jax.nn.sigmoid((logit + logistic) / temperature)


# ---------------------------------------------------------------------------
# Differentiable ops on (B, H, W, C) images in [0, 1]; magnitude m in [0, 1]
# ---------------------------------------------------------------------------

def d_invert(imgs, m, key):
    del m, key
    return 1.0 - imgs


def d_solarize(imgs, m, key):
    del key
    thresh = m[..., None, None, None]
    # smooth gate around the threshold keeps gradients to m
    gate = jax.nn.sigmoid((imgs - thresh) * 50.0)
    return imgs * (1 - gate) + (1.0 - imgs) * gate


def d_posterize(imgs, m, key):
    del key
    bits = 1.0 + m * 7.0  # 1..8 bits, continuous
    levels = 2.0 ** bits[..., None, None, None]
    return ste_clip(ste_round(imgs * (levels - 1.0)) / (levels - 1.0))


def d_contrast(imgs, m, key):
    del key
    factor = (0.1 + 1.8 * m)[..., None, None, None]
    luma = (imgs[..., 0] * 0.299 + imgs[..., 1] * 0.587 +
            imgs[..., 2] * 0.114)
    mean = jnp.mean(luma, axis=(1, 2), keepdims=True)[..., None]
    return ste_clip(mean + factor * (imgs - mean))


def d_color(imgs, m, key):
    del key
    factor = (0.1 + 1.8 * m)[..., None, None, None]
    luma = (imgs[..., 0] * 0.299 + imgs[..., 1] * 0.587 +
            imgs[..., 2] * 0.114)[..., None]
    return ste_clip(luma + factor * (imgs - luma))


def d_brightness(imgs, m, key):
    del key
    factor = (0.1 + 1.8 * m)[..., None, None, None]
    return ste_clip(imgs * factor)


def d_sharpness(imgs, m, key):
    del key
    factor = (0.1 + 1.8 * m)[..., None, None, None]
    kernel = jnp.array([[1., 1., 1.], [1., 5., 1.], [1., 1., 1.]]) / 13.0
    x = jnp.moveaxis(imgs, -1, 1).reshape(-1, 1, *imgs.shape[1:3])
    sm = jax.lax.conv_general_dilated(x, kernel[None, None], (1, 1), "SAME")
    sm = jnp.moveaxis(sm.reshape(imgs.shape[0], imgs.shape[3],
                                 *imgs.shape[1:3]), 1, -1)
    return ste_clip(sm + factor * (imgs - sm))


def d_autocontrast(imgs, m, key):
    del m, key
    lo = jnp.min(imgs, axis=(1, 2), keepdims=True)
    hi = jnp.max(imgs, axis=(1, 2), keepdims=True)
    return jnp.where(hi > lo, (imgs - lo) / jnp.maximum(hi - lo, 1e-6),
                     imgs)


def d_equalize(imgs, m, key):
    """Differentiable histogram equalization via a smooth CDF (soft counts
    with a triangular kernel over 256 bins; the reference uses a fixed
    uint8 CDF with an STE, `data/functional.py` equalize)."""
    del m, key
    bins = jnp.linspace(0.0, 1.0, 256)
    width = 1.0 / 255.0

    def eq_image(img):  # (H, W, C)
        def eq_channel(ch):
            w = jnp.maximum(0.0, 1.0 - jnp.abs(
                ch.reshape(-1, 1) - bins[None, :]) / width)
            hist = jnp.sum(w, axis=0)
            cdf = jnp.cumsum(hist)
            cdf = cdf / cdf[-1]
            # interpolate the per-pixel cdf value
            return jnp.interp(ch, bins, cdf)
        return jnp.stack([eq_channel(img[..., c])
                          for c in range(img.shape[-1])], axis=-1)

    return jax.vmap(eq_image)(imgs)


def d_cutout(imgs, m, key):
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


DIFF_OPS: List[Tuple[str, Callable]] = [
    ("AutoContrast", d_autocontrast),
    ("Invert", d_invert),
    ("Equalize", d_equalize),
    ("Solarize", d_solarize),
    ("Posterize", d_posterize),
    ("Contrast", d_contrast),
    ("Color", d_color),
    ("Brightness", d_brightness),
    ("Sharpness", d_sharpness),
    ("Cutout", d_cutout),
]


def init_policy_params(key: jax.Array, n_ops: int | None = None) -> Dict:
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
    """Apply every op gated by its relaxed-Bernoulli probability; output is
    differentiable w.r.t. ``params``. imgs: (B, H, W, C) in [0, 1]."""
    b = imgs.shape[0]
    out = imgs
    keys = jax.random.split(key, 2 * len(DIFF_OPS))
    probs = jax.nn.sigmoid(params["prob_logit"])
    mags = jnp.clip(params["magnitude"], 0.0, 1.0)
    for i, (_, fn) in enumerate(DIFF_OPS):
        gate = relaxed_bernoulli(keys[2 * i], probs[i], (b,), temperature)
        m = jnp.broadcast_to(mags[i], (b,))
        transformed = fn(out, m, keys[2 * i + 1])
        out = gate[:, None, None, None] * transformed + \
            (1.0 - gate[:, None, None, None]) * out
    return out
