"""Sliding-window inference.

Capability match for the vendored mmseg ``EncoderDecoder`` slide mode
(`/root/reference/models/mmseg/models/segmentors/encoder_decoder.py:169-276`):
tile a large image into overlapping crops, run the model on every crop, and
average the logits in the overlap regions. TPU re-design: all windows are
gathered into ONE batched forward (static window grid via
``jax.lax.dynamic_slice``), and the overlap-count normalization is a
precomputed static weight map — no data-dependent control flow.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _grid_starts(size: int, crop: int, stride: int) -> np.ndarray:
    """mmseg's window placement: strided starts, last window flush with
    the image edge."""
    if size <= crop:
        return np.asarray([0])
    n = int(math.ceil((size - crop) / stride)) + 1
    starts = np.minimum(np.arange(n) * stride, size - crop)
    return np.unique(starts)


def slide_inference(forward_fn: Callable, images: jnp.ndarray,
                    crop: Tuple[int, int], stride: Tuple[int, int],
                    num_classes: int) -> jnp.ndarray:
    """Run ``forward_fn(windows) -> logits`` over a sliding grid.

    images: (B, H, W, C); forward_fn takes (N, ch, cw, C) and returns
    (N, ch, cw, num_classes) logits. Returns (B, H, W, num_classes)
    overlap-averaged logits.
    """
    b, h, w, c = images.shape
    ch, cw = crop
    sh, sw = stride
    # reference edge case (`encoder_decoder.py:171-173`): a crop larger
    # than the image decodes the small patch unpadded — i.e. the single
    # window IS the whole image on that axis
    ch, cw = min(ch, h), min(cw, w)
    ys = _grid_starts(h, ch, sh)
    xs = _grid_starts(w, cw, sw)

    # static overlap-count map (same for every image)
    count = np.zeros((h, w, 1), np.float32)
    for y in ys:
        for x in xs:
            count[y:y + ch, x:x + cw] += 1.0
    count = jnp.asarray(count)

    # gather all windows for all images into one batch
    windows = []
    for y in ys:
        for x in xs:
            windows.append(jax.lax.dynamic_slice(
                images, (0, int(y), int(x), 0), (b, ch, cw, c)))
    batch = jnp.concatenate(windows, axis=0)       # (B * nW, ch, cw, C)

    logits = forward_fn(batch)                     # (B * nW, ch, cw, K)

    out = jnp.zeros((b, h, w, num_classes), jnp.float32)
    idx = 0
    for y in ys:
        for x in xs:
            win = logits[idx * b:(idx + 1) * b]
            out = jax.lax.dynamic_update_slice(
                out,
                jax.lax.dynamic_slice(
                    out, (0, int(y), int(x), 0),
                    (b, ch, cw, num_classes)) + win,
                (0, int(y), int(x), 0))
            idx += 1
    return out / count


def make_slide_eval_forward(ent, crop: int, stride: int):
    """Sliding-window variant of ``make_eval_forward`` for test images
    larger than the train crop."""
    from ..data.transforms import normalize_image

    @jax.jit
    def fwd(seg_params, seg_stats, imgs):
        x = normalize_image(imgs.astype(jnp.float32))

        def model_fn(windows):
            variables = {"params": seg_params}
            if seg_stats:
                variables["batch_stats"] = seg_stats
            logits, _ = ent.model.apply(variables, windows, train=False)
            return logits

        logits = slide_inference(model_fn, x, (crop, crop),
                                 (stride, stride), ent.num_classes)
        return jax.nn.sigmoid(logits)

    return fwd
