"""PointRend point head (`/root/reference/models/mmseg/models/decode_heads/
point_head.py`, after Kirilov et al. "PointRend: Image Segmentation as
Rendering").

TPU-first redesign: the torch version boolean-indexes a *variable* number
of uncertain points and scatters them back; here every stage is
static-shape —

- uncertainty-guided training sampling (`point_head.py` get_points_train:
  oversample k*N random points, keep the beta*N most uncertain by top_k,
  fill with uniform random points);
- bilinear `point_sample` as a pure gather-free weighted sum of the 4
  neighbours (per-point gathers of O(#points) are fine on TPU; the
  catastrophic per-PIXEL gathers stay banned);
- iterative subdivision inference with a fixed number of refined points
  per step, scattered with `.at[].set`.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def point_sample(feat: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample NHWC ``feat`` at normalized (x, y) ``coords``
    (B, P, 2) in [0, 1] — grid_sample align_corners=False semantics."""
    b, h, w, c = feat.shape
    x = coords[..., 0] * w - 0.5
    y = coords[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    def gather(yy, xx):
        # grid_sample padding_mode='zeros': out-of-range neighbours
        # contribute zero, not the clamped border pixel
        valid = ((yy >= 0) & (yy <= h - 1) & (xx >= 0) & (xx <= w - 1))
        yy = jnp.clip(yy, 0, h - 1).astype(jnp.int32)
        xx = jnp.clip(xx, 0, w - 1).astype(jnp.int32)
        flat = feat.reshape(b, h * w, c)
        idx = yy * w + xx  # (B, P)
        v = jnp.take_along_axis(flat, idx[..., None], axis=1)
        return v * valid[..., None].astype(v.dtype)

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    wx = wx[..., None]
    wy = wy[..., None]
    return ((1 - wy) * ((1 - wx) * v00 + wx * v01)
            + wy * ((1 - wx) * v10 + wx * v11))


def calculate_uncertainty(logits: jnp.ndarray) -> jnp.ndarray:
    """`point_head.py` calculate_uncertainty: negative margin between the
    two most confident classes. logits (..., C)."""
    if logits.shape[-1] == 1:
        return -jnp.abs(logits[..., 0])
    top2 = jax.lax.top_k(logits, 2)[0]
    return -(top2[..., 0] - top2[..., 1])


def get_points_train(seg_logits: jnp.ndarray, num_points: int,
                     oversample_ratio: float,
                     importance_sample_ratio: float,
                     rng: jax.Array) -> jnp.ndarray:
    """Importance sampling of training points (PointRend §3.1): oversample
    random candidates, keep the most uncertain fraction, fill the rest
    uniformly. Returns (B, num_points, 2) coords."""
    b = seg_logits.shape[0]
    n_sampled = int(num_points * oversample_ratio)
    k1, k2 = jax.random.split(rng)
    cand = jax.random.uniform(k1, (b, n_sampled, 2))
    unc = calculate_uncertainty(point_sample(seg_logits, cand))  # (B, S)
    n_unc = int(importance_sample_ratio * num_points)
    n_rand = num_points - n_unc
    idx = jax.lax.top_k(unc, n_unc)[1]
    picked = jnp.take_along_axis(cand, idx[..., None], axis=1)
    rand = jax.random.uniform(k2, (b, n_rand, 2))
    return jnp.concatenate([picked, rand], axis=1)


def point_sample_labels(labels: jnp.ndarray,
                        coords: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbour label sampling at normalized (x, y) ``coords``
    (B, P, 2) — grid_sample mode='nearest', align_corners=False, the way
    mmseg samples gt at training points (`point_head.py` losses:
    ``point_sample(gt.float(), points, mode='nearest')``). ``labels``
    (B, H, W) int."""
    b, h, w = labels.shape
    xs = jnp.clip(jnp.floor(coords[..., 0] * w), 0, w - 1).astype(jnp.int32)
    ys = jnp.clip(jnp.floor(coords[..., 1] * h), 0, h - 1).astype(jnp.int32)
    flat = labels.reshape(b, h * w)
    return jnp.take_along_axis(flat, ys * w + xs, axis=1)


def get_points_test(seg_logits: jnp.ndarray,
                    num_points: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """The ``num_points`` most uncertain pixel centers. Returns (flat
    indices (B, P), coords (B, P, 2))."""
    b, h, w, _ = seg_logits.shape
    unc = calculate_uncertainty(seg_logits).reshape(b, h * w)
    idx = jax.lax.top_k(unc, num_points)[1]
    ys = (idx // w).astype(jnp.float32)
    xs = (idx % w).astype(jnp.float32)
    coords = jnp.stack([(xs + 0.5) / w, (ys + 0.5) / h], axis=-1)
    return idx, coords


class PointHead(nn.Module):
    """MLP over per-point [fine-grained features ++ coarse logits]
    (`point_head.py` PointHead: num_fcs Conv1d ConvModules (norm-free,
    ReLU), coarse logits re-concat after every fc when
    ``coarse_pred_each_layer``, BaseDecodeHead dropout before the final
    ``fc_seg`` — `point_head.py:100-121`)."""
    num_classes: int
    channels: int = 256
    num_fcs: int = 3
    coarse_pred_each_layer: bool = True
    dropout_ratio: float = 0.1
    in_index: Sequence[int] = (0,)

    @nn.compact
    def __call__(self, feats, coarse_logits, coords, train: bool = True):
        fine = jnp.concatenate(
            [point_sample(feats[i], coords) for i in self.in_index], -1)
        coarse = point_sample(coarse_logits, coords)
        x = jnp.concatenate([fine, coarse], axis=-1)
        for i in range(self.num_fcs):
            x = nn.relu(nn.Dense(self.channels, name=f"fc{i}")(x))
            if self.coarse_pred_each_layer:
                x = jnp.concatenate([x, coarse], axis=-1)
        if self.dropout_ratio > 0:
            x = nn.Dropout(self.dropout_ratio)(x, deterministic=not train)
        return nn.Dense(self.num_classes, name="fc_seg")(x)


def point_rend_refine(head_apply, feats, seg_logits: jnp.ndarray,
                      subdivision_steps: int = 2,
                      subdivision_num_points: int = 512) -> jnp.ndarray:
    """Test-time iterative subdivision (`point_head.py` forward_test): at
    each step upsample 2x, re-score the most uncertain points with the
    point head, and scatter the refined logits back."""
    b = seg_logits.shape[0]
    for _ in range(subdivision_steps):
        h, w = seg_logits.shape[1] * 2, seg_logits.shape[2] * 2
        seg_logits = jax.image.resize(
            seg_logits, (b, h, w, seg_logits.shape[-1]), "bilinear")
        n = min(subdivision_num_points, h * w)
        idx, coords = get_points_test(seg_logits, n)
        refined = head_apply(feats, seg_logits, coords)  # (B, P, C)
        flat = seg_logits.reshape(b, h * w, -1)
        flat = jax.vmap(lambda f, i, r: f.at[i].set(r))(flat, idx, refined)
        seg_logits = flat.reshape(b, h, w, -1)
    return seg_logits
