"""Pixel samplers: Online Hard Example Mining (OHEM) for segmentation.

TPU-native equivalent of mmseg's ``OHEMPixelSampler``
(`/root/reference/models/mmseg/core/seg/sampler/ohem_pixel_sampler.py:9-77`,
wired into heads through ``BaseDecodeHead.losses`` at
`decode_heads/decode_head.py:225-226`). The reference masks a dynamic
number of valid pixels and sorts only those; here everything is
static-shape so it compiles once under jit:

- invalid pixels are pushed to the tail of the sort with +/-inf sentinels
  instead of boolean masking;
- the true-class probability is read with a one-hot reduction (per-element
  gathers are ~1000x slower than MXU work on TPU — CLAUDE.md #4);
- the ``thresh=None`` branch keeps exactly ``min_kept * N`` hardest pixels
  via one permutation scatter over the argsort order (mmseg:
  ``sort_indices[:batch_kept]``), so tie-breaking matches torch's
  stable-ordering behavior up to sort stability.

Returned weights are 1.0 on the mined pixels and 0.0 elsewhere — pass them
as ``weight=`` to ``zoo.losses.cross_entropy`` (the head-loss plumbing the
reference uses). Gradients do not flow through the mining decision
(mmseg computes it under ``torch.no_grad``): ``lax.stop_gradient`` on the
inputs.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def ohem_weights(seg_logits: jnp.ndarray, seg_label: jnp.ndarray,
                 ignore_index: int = 255,
                 thresh: Optional[float] = None,
                 min_kept: int = 100000,
                 loss_fn: Optional[Callable] = None) -> jnp.ndarray:
    """Per-pixel OHEM weights, shape = ``seg_label``'s, dtype f32.

    Args:
      seg_logits: (N, H, W, C) class logits (NHWC).
      seg_label:  (N, H, W) integer labels.
      ignore_index: label value excluded from mining and loss.
      thresh: confidence threshold. When set, keep every valid pixel whose
        true-class probability is below ``max(thresh, k-th lowest valid
        probability)`` with ``k = min(min_kept*N, num_valid-1)`` —
        reference :50-63. When None, keep exactly the ``min_kept*N``
        highest-loss valid pixels — reference :64-72.
      min_kept: minimum pixels kept per image (must be > 1, mmseg :26).
      loss_fn: optional ``(logits, label) -> per-pixel loss`` used by the
        ``thresh=None`` branch (mmseg calls the head's own ``loss_decode``
        with ``reduction_override='none'``). Defaults to plain CE.
    """
    assert min_kept > 1, "min_kept must be > 1 (mmseg OHEMPixelSampler)"
    seg_logits = jax.lax.stop_gradient(seg_logits)
    seg_label = jax.lax.stop_gradient(seg_label)
    n = seg_label.shape[0]
    num_classes = seg_logits.shape[-1]
    batch_kept = int(min_kept) * int(n)
    valid = (seg_label != ignore_index) & (seg_label >= 0) \
        & (seg_label < num_classes)
    flat_valid = valid.reshape(-1)
    num_valid = jnp.sum(flat_valid)
    total = flat_valid.shape[0]

    if thresh is not None:
        prob = jax.nn.softmax(seg_logits.astype(jnp.float32), axis=-1)
        safe = jnp.where(valid, seg_label, 0)
        # true-class prob via one-hot contraction (no per-pixel gather)
        true_prob = jnp.sum(
            prob * jax.nn.one_hot(safe, num_classes, dtype=prob.dtype),
            axis=-1)
        flat = jnp.where(flat_valid, true_prob.reshape(-1), jnp.inf)
        ordered = jnp.sort(flat)  # ascending; invalid (+inf) at the tail
        k = jnp.clip(jnp.minimum(batch_kept, num_valid - 1), 0, total - 1)
        min_threshold = jnp.where(num_valid > 0, jnp.take(ordered, k), 0.0)
        threshold = jnp.maximum(min_threshold, jnp.float32(thresh))
        keep = valid & (true_prob < threshold)
        return keep.astype(jnp.float32)

    if loss_fn is None:
        def loss_fn(logits, label):
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            safe = jnp.where((label >= 0) & (label < num_classes), label, 0)
            oh = jax.nn.one_hot(safe, num_classes, dtype=logp.dtype)
            return -jnp.sum(logp * oh, axis=-1)
    losses = loss_fn(seg_logits, seg_label)
    flat = jnp.where(flat_valid, losses.reshape(-1), -jnp.inf)
    order = jnp.argsort(-flat)  # descending; invalid (-inf) at the tail
    # ranked values = flat[order] — but as a sort, not an N-element gather
    # (CLAUDE.md #4: per-element gathers are ~1000x slower than sorts)
    ranked_keep = (jnp.arange(total) < batch_kept) \
        & jnp.isfinite(-jnp.sort(-flat))
    keep_flat = jnp.zeros((total,), jnp.float32).at[order].set(
        ranked_keep.astype(jnp.float32))
    return keep_flat.reshape(seg_label.shape)
