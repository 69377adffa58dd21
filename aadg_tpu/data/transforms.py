"""On-device transform semantics (the jnp re-design of
`/root/reference/data/transform.py`).

Everything here runs inside the jitted step: random scale+crop is a single
fused ``jax.image.scale_and_translate`` resample (bilinear+antialias for
images = PIL resize semantics, nearest for masks), normalization is
``x / 127.5 - 1``, optic masks become the 2-channel (cup, disc) multilabel
(cup ⊂ disc), vessel masks become binary, and domain codes become the
reference's stochastic soft one-hot (``SoftLable``, `transform.py:260-274`).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def normalize_image(img: jnp.ndarray) -> jnp.ndarray:
    """`transform.py:149-151`: /127.5 - 1 (input f32 in [0, 255])."""
    return img / 127.5 - 1.0


def optic_mask_to_multilabel(mask: jnp.ndarray) -> jnp.ndarray:
    """Raw gray mask (..., H, W) -> (..., H, W, 2) [cup, disc].

    Reference thresholds (`transform.py:155-165` + ``to_multilabel``):
    value > 200 -> background [0,0]; 50 < value < 201 -> disc ring [0,1];
    value <= 50 -> cup [1,1].
    """
    m = mask
    background = m > 200.0
    ring = (m > 50.0) & (m < 201.0)
    cup = ~(background | ring)
    disc = cup | ring
    return jnp.stack([cup, disc], axis=-1).astype(jnp.float32)


def vessel_mask_to_binary(mask: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W) -> (..., H, W, 1): nonzero -> 1 (`transform.py:168-170`)."""
    return (mask != 0.0).astype(jnp.float32)[..., None]


def roi_to_binary(roi: jnp.ndarray) -> jnp.ndarray:
    """GenerateMask (`transform.py:189-205`)."""
    return (roi != 0.0).astype(jnp.float32)[..., None]


def soft_domain_label(domain_idx: jnp.ndarray, n: int,
                      key: jax.Array) -> jnp.ndarray:
    """Stochastic soft one-hot (``SoftLable``, `transform.py:260-274`).

    True class gets 0.8 + 0.2*u; remaining mass is split sequentially:
    each non-true class i < n-1 gets u_i * (remaining), the last index
    (when not the true class) closes the simplex exactly.
    """
    ks = jax.random.split(key, n + 1)
    a = 0.8 + 0.2 * jax.random.uniform(ks[0])
    out = jnp.zeros((n,))
    out = out.at[domain_idx].set(a)
    acc = a
    for i in range(n):
        is_true = i == domain_idx
        if i == n - 1:
            val = 1.0 - acc
        else:
            val = jax.random.uniform(ks[i + 1]) * (1.0 - acc)
        out = jnp.where(is_true, out, out.at[i].set(val))
        acc = jnp.where(is_true, acc, acc + val)
    return out


def random_scale_crop(img: jnp.ndarray, mask: jnp.ndarray, key: jax.Array,
                      crop: int, scale_range: Tuple[float, float],
                      p_noscale: float = 0.2
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """DGRandomScaleCrop (`transform.py:97-135`) as one fused resample.

    With prob 1 - p_noscale, width/height are scaled by *independent*
    uniforms in ``scale_range`` (PIL truncates the new size to int); then a
    uniform random crop of ``crop``² is taken. Bilinear (antialiased, PIL
    resize semantics) for the image, nearest for the mask.

    Requires min(scale_range) * size >= crop (true of both reference
    pipelines: optic [1,1.5]x256 -> >=256; rvs [0.5,2]x512 -> >=256), so
    the reference's pad-then-crop fallback (`transform.py:36-41`) is
    statically unreachable and not replicated.
    """
    h, w = img.shape[0], img.shape[1]
    lo, hi = scale_range
    assert lo * min(h, w) >= crop, (
        f"scale_range {scale_range} x size {h} < crop {crop}")
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    do_scale = jax.random.uniform(k1) > p_noscale
    sw = jnp.where(do_scale, jax.random.uniform(k2, minval=lo, maxval=hi),
                   1.0)
    sh = jnp.where(do_scale, jax.random.uniform(k3, minval=lo, maxval=hi),
                   1.0)
    new_w = jnp.floor(sw * w)  # PIL int() size
    new_h = jnp.floor(sh * h)
    eff_w = new_w / w
    eff_h = new_h / h
    # random.randint(0, W - crop) is inclusive on both ends
    x1 = jnp.floor(jax.random.uniform(k4) * (new_w - crop + 1.0))
    y1 = jnp.floor(jax.random.uniform(k5) * (new_h - crop + 1.0))

    img_out = jax.image.scale_and_translate(
        img, (crop, crop, img.shape[2]), (0, 1),
        scale=jnp.stack([eff_h, eff_w]),
        translation=jnp.stack([-y1, -x1]),
        method="linear", antialias=True)

    # nearest for the mask: in = floor((out + offset + 0.5) / scale).
    # The axis-aligned resample is separable: one row take + one column
    # take (pointwise 2-D gathers are pathologically slow on TPU).
    xs = jnp.arange(crop, dtype=jnp.float32)
    ys = jnp.arange(crop, dtype=jnp.float32)
    ix = jnp.clip(jnp.floor((xs + x1 + 0.5) / eff_w), 0, w - 1).astype(
        jnp.int32)
    iy = jnp.clip(jnp.floor((ys + y1 + 0.5) / eff_h), 0, h - 1).astype(
        jnp.int32)
    mask_out = jnp.take(jnp.take(mask, iy, axis=0), ix, axis=1)
    return img_out, mask_out


def make_train_transform(dataset_name: str, crop: int):
    """Per-sample fused (scale-crop -> normalize -> mask encode), matching
    ``get_dg_segtransform`` (`transform.py:281-309`): optic scales [1,1.5],
    rvs [0.5,2]."""
    scale_range = (1.0, 1.5) if dataset_name == "optic" else (0.5, 2.0)
    to_label = (optic_mask_to_multilabel if dataset_name == "optic"
                else vessel_mask_to_binary)

    def transform(img, mask, key):
        img, mask = random_scale_crop(img, mask, key, crop, scale_range)
        return normalize_image(img), to_label(mask)

    return transform, to_label
