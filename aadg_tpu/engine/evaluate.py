"""Validation / inference metric loops.

Optic (`/root/reference/search_dg.py:217-286`): threshold 0.75, samplewise
cup/disc dice + per-image hd95 (penalty 100 on empty predictions, computed
host-side exactly as the reference does with medpy on CPU).

RVS (`search_dg_2d.py:215-283`): dice at 0.5 on the full image, plus
ROI-masked accuracy / AUROC / specificity / sensitivity. Metrics aggregate
per batch weighted by batch size, replicating the reference's AverageMeter
over per-batch torchmetrics values.
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from .. import metrics as M
from ..data.transforms import (normalize_image, optic_mask_to_multilabel,
                               vessel_mask_to_binary)
from .state import Entities, SegDisState


_EVAL_FWD_CACHE = {}
_EVAL_FWD_CACHE_MAX = 4  # bounded: each entry pins an Entities + program


def make_eval_forward(ent: Entities):
    """Jitted inference forward: uint8 images -> sigmoid probabilities.
    Cached (bounded FIFO) per entity set so repeated validation within a
    run never retraces."""
    cached = _EVAL_FWD_CACHE.get(id(ent))
    if cached is not None:
        return cached
    if len(_EVAL_FWD_CACHE) >= _EVAL_FWD_CACHE_MAX:
        _EVAL_FWD_CACHE.pop(next(iter(_EVAL_FWD_CACHE)))

    @jax.jit
    def fwd(seg_params, seg_stats, imgs):
        x = normalize_image(imgs.astype(jnp.float32))
        variables = {"params": seg_params}
        if seg_stats:
            variables["batch_stats"] = seg_stats
        logits, _ = ent.model.apply(variables, x, train=False)
        return jax.nn.sigmoid(logits)

    _EVAL_FWD_CACHE[id(ent)] = fwd
    return fwd


def _batched(n, batch):
    for i in range(0, n, batch):
        yield i, min(i + batch, n)


def validate_optic(ent: Entities, ts: SegDisState, store,
                   batch_size: int = 8, threshold: float = 0.75
                   ) -> Dict[str, float]:
    fwd = make_eval_forward(ent)
    n_pad = store.images.shape[0]
    cup_dsc = disc_dsc = cup_hd = disc_hd = 0.0
    n_total = 0
    for lo, hi in _batched(n_pad, batch_size):
        imgs = store.images[lo:hi]
        w = np.asarray(store.weights[lo:hi])
        n_real = int(w.sum())
        if n_real == 0:
            break
        soft = fwd(ts.seg_params, ts.seg_stats, imgs)
        hard = (soft > threshold).astype(jnp.float32)
        y = optic_mask_to_multilabel(store.labels[lo:hi].astype(jnp.float32))
        wj = jnp.asarray(w)
        c = float(M.samplewise_f1(hard[..., 0], y[..., 0], weight=wj)[1])
        dd = float(M.samplewise_f1(hard[..., 1], y[..., 1], weight=wj)[1])
        cup_dsc += c * n_real
        disc_dsc += dd * n_real
        hard_np = np.asarray(hard)
        y_np = np.asarray(y)
        for j in range(hi - lo):
            if w[j] == 0:
                continue
            cup_hd += M.hd95_with_penalty(hard_np[j, ..., 0] > 0,
                                          y_np[j, ..., 0] > 0)
            disc_hd += M.hd95_with_penalty(hard_np[j, ..., 1] > 0,
                                           y_np[j, ..., 1] > 0)
        n_total += n_real
    return {"cup_dsc": cup_dsc / n_total, "disc_dsc": disc_dsc / n_total,
            "cup_hd": cup_hd / n_total, "disc_hd": disc_hd / n_total}


def validate_rvs(ent: Entities, ts: SegDisState, store,
                 batch_size: int = 8) -> Dict[str, float]:
    fwd = make_eval_forward(ent)
    n_pad = store.images.shape[0]
    sums = {k: 0.0 for k in ("dsc", "acc", "aucroc", "sp", "se")}
    n_total = 0
    for lo, hi in _batched(n_pad, batch_size):
        w = np.asarray(store.weights[lo:hi])
        n_real = int(w.sum())
        if n_real == 0:
            break
        soft = fwd(ts.seg_params, ts.seg_stats, store.images[lo:hi])
        y = vessel_mask_to_binary(store.labels[lo:hi].astype(jnp.float32))
        hard = (soft > 0.5).astype(jnp.float32)
        dsc = float(M.samplewise_f1(hard[..., 0], y[..., 0],
                                    weight=jnp.asarray(w))[1])
        # ROI-masked pixel metrics, per batch over real samples
        roi = np.asarray(store.rois[lo:hi]) != 0
        roi = roi & (w[:, None, None] > 0)
        soft_np = np.asarray(soft)[..., 0]
        y_np = np.asarray(y)[..., 0]
        sums["dsc"] += dsc * n_real
        sums["acc"] += M.accuracy_score(soft_np, y_np, roi) * n_real
        sums["aucroc"] += M.auroc(soft_np, y_np, roi) * n_real
        sums["sp"] += M.specificity(soft_np, y_np, roi) * n_real
        # reference computes sensitivity as specificity of the inverted
        # problem (`search_dg_2d.py:254`)
        sums["se"] += M.sensitivity(soft_np, y_np, roi) * n_real
        n_total += n_real
    return {k: v / n_total for k, v in sums.items()}


def validate(ent: Entities, ts: SegDisState, store,
             batch_size: int = 8) -> Dict[str, float]:
    if ent.dataset_name == "optic":
        return validate_optic(ent, ts, store, batch_size)
    return validate_rvs(ent, ts, store, batch_size)
