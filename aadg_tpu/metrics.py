"""Metric library.

Reproduces the metric semantics the reference gets from torchmetrics 0.4.1 /
medpy (`/root/reference/search_dg.py:33,225-262`, `search_dg_2d.py:226-261`):

- ``samplewise_f1``: torchmetrics ``F1(num_classes=2, average=None,
  mdmc_average='samplewise')`` — per-sample per-class F1, averaged over the
  batch, with 0 where a sample's denominator is 0.
- ``hd95``: medpy ``binary.hd95`` — 95th percentile of the pooled symmetric
  surface distances.
- ``auroc`` / ``accuracy_score`` / ``specificity`` / ``sensitivity``: binary
  metrics at threshold 0.5, ROI-maskable.

Train-loop metrics are jnp (they run inside the jitted step on TPU);
``hd95`` is host-side numpy/scipy, eval-only, exactly as in the reference
where it was the one metric computed on CPU (`search_dg.py:250-262`).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Samplewise F1 / Dice (jnp, used inside jitted train/eval steps)
# ---------------------------------------------------------------------------

def samplewise_f1(pred: jnp.ndarray, target: jnp.ndarray,
                  weight: jnp.ndarray | None = None) -> jnp.ndarray:
    """Per-class F1 computed per sample, then averaged over samples.

    pred, target: (N, ...) binary arrays (0/1). ``weight`` optionally masks
    whole samples, shape (N,), for padded eval batches.
    Returns (2,) array: [f1_class0, f1_class1] — index [1] is the Dice of
    the foreground, matching the reference's ``f1_score(...)[1]`` usage.
    """
    pred = pred.reshape(pred.shape[0], -1).astype(jnp.float32)
    target = target.reshape(target.shape[0], -1).astype(jnp.float32)

    def per_class(p, t):
        tp = jnp.sum(p * t, axis=1)
        fp = jnp.sum(p * (1.0 - t), axis=1)
        fn = jnp.sum((1.0 - p) * t, axis=1)
        denom = 2.0 * tp + fp + fn
        f1 = jnp.where(denom > 0, 2.0 * tp / jnp.maximum(denom, 1e-12), 0.0)
        if weight is not None:
            w = weight.astype(jnp.float32)
            return jnp.sum(f1 * w) / jnp.maximum(jnp.sum(w), 1e-12)
        return jnp.mean(f1)

    return jnp.stack([per_class(1.0 - pred, 1.0 - target),
                      per_class(pred, target)])


def dice_coef(pred: jnp.ndarray, target: jnp.ndarray,
              eps: float = 1e-8) -> jnp.ndarray:
    """Plain Dice over the whole batch per channel. pred/target: (N, H, W, C)
    binary. Returns (C,). (Reference analogue: `metrics.py:40-56`.)"""
    axes = tuple(range(pred.ndim - 1))
    inter = jnp.sum(pred * target, axis=axes)
    card = jnp.sum(pred, axis=axes) + jnp.sum(target, axis=axes)
    return 2.0 * inter / (card + eps)


# ---------------------------------------------------------------------------
# Binary classification metrics (threshold 0.5, ROI-masked), numpy eval-side
# ---------------------------------------------------------------------------

def _masked(arr: np.ndarray, mask: np.ndarray | None) -> np.ndarray:
    arr = np.asarray(arr).reshape(-1)
    if mask is None:
        return arr
    return arr[np.asarray(mask).reshape(-1).astype(bool)]


def auroc(scores, labels, mask=None) -> float:
    """Exact binary AUROC (Mann-Whitney with tie correction)."""
    s = _masked(scores, mask).astype(np.float64)
    y = _masked(labels, mask).astype(np.int64)
    n_pos = int(y.sum())
    n_neg = int(y.size - n_pos)
    if n_pos == 0 or n_neg == 0:
        return float("nan")
    order = np.argsort(s, kind="mergesort")
    s_sorted = s[order]
    ranks = np.empty(y.size, dtype=np.float64)
    # average ranks for ties
    i = 0
    while i < y.size:
        j = i
        while j + 1 < y.size and s_sorted[j + 1] == s_sorted[i]:
            j += 1
        ranks[order[i:j + 1]] = 0.5 * (i + j) + 1.0
        i = j + 1
    r_pos = ranks[y == 1].sum()
    return float((r_pos - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg))


def accuracy_score(scores, labels, mask=None, threshold=0.5) -> float:
    s = _masked(scores, mask)
    y = _masked(labels, mask)
    return float(np.mean((s > threshold).astype(np.int64) == y.astype(np.int64)))


def specificity(scores, labels, mask=None, threshold=0.5) -> float:
    """TN / (TN + FP)."""
    p = _masked(scores, mask) > threshold
    y = _masked(labels, mask).astype(bool)
    tn = np.sum(~p & ~y)
    fp = np.sum(p & ~y)
    return float(tn / max(tn + fp, 1))


def sensitivity(scores, labels, mask=None, threshold=0.5) -> float:
    """TP / (TP + FN)."""
    p = _masked(scores, mask) > threshold
    y = _masked(labels, mask).astype(bool)
    tp = np.sum(p & y)
    fn = np.sum(~p & y)
    return float(tp / max(tp + fn, 1))


# ---------------------------------------------------------------------------
# Hausdorff distance 95 (host-side, eval-only; medpy.binary.hd95 semantics)
# ---------------------------------------------------------------------------

def _surface(arr: np.ndarray) -> np.ndarray:
    """Border voxels of a binary mask (medpy __surface_distances erosion)."""
    from scipy import ndimage
    arr = np.atleast_2d(np.asarray(arr).astype(bool))
    conn = ndimage.generate_binary_structure(arr.ndim, 1)
    eroded = ndimage.binary_erosion(arr, structure=conn, iterations=1)
    return arr ^ eroded


def _surface_distances(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Distances from each surface voxel of ``a`` to the surface of ``b``."""
    from scipy import ndimage
    sa = _surface(a)
    sb = _surface(b)
    dt = ndimage.distance_transform_edt(~sb)
    return dt[sa]


def hd95(pred: np.ndarray, target: np.ndarray) -> float:
    """95th percentile of the pooled bidirectional surface distances
    (medpy ``binary.hd95``). Both inputs must be non-empty binary masks."""
    d1 = _surface_distances(pred, target)
    d2 = _surface_distances(target, pred)
    return float(np.percentile(np.hstack((d1, d2)), 95))


def hd95_with_penalty(pred: np.ndarray, target: np.ndarray,
                      penalty: float = 100.0) -> float:
    """hd95 with the reference's empty-prediction penalty
    (`search_dg.py:253-254`): 100 when the predicted mask is empty."""
    pred = np.asarray(pred).astype(bool)
    target = np.asarray(target).astype(bool)
    if pred.sum() < 1 or target.sum() < 1:
        return penalty
    return hd95(pred, target)


# ---------------------------------------------------------------------------
# Semantic-segmentation evaluation (mIoU / mDice / aAcc)
#
# Host-side numpy, eval-only — the reference computes these on CPU too
# (vendored mmseg `/root/reference/models/mmseg/core/evaluation/metrics.py`:
# intersect_and_union :5-60, total_intersect_and_union :62-103,
# mean_iou :105, mean_dice :142, eval_metrics :179-229).
# ---------------------------------------------------------------------------

def intersect_and_union(pred_label, label, num_classes: int,
                        ignore_index: int, label_map=None,
                        reduce_zero_label: bool = False):
    """Per-image class histograms of intersection/union/pred/gt areas.

    ``pred_label``/``label`` may be FILE PATHS (`metrics.py:31-36`: a
    .npy prediction from the efficient-test path, and an image file for
    the label) — loaded lazily so huge result sets never sit in RAM."""
    if isinstance(pred_label, str):
        pred_label = np.load(pred_label)
    if isinstance(label, str):
        from PIL import Image
        label = np.asarray(Image.open(label))
    pred_label = np.asarray(pred_label)
    label = np.asarray(label).copy()
    if label_map:
        src = label.copy()
        for old_id, new_id in label_map.items():
            label[src == old_id] = new_id
    if reduce_zero_label:
        # zero means 'unlabeled': shift classes down, map 0 -> ignore(255)
        label[label == 0] = 255
        label = label - 1
        label[label == 254] = 255
    mask = label != ignore_index
    pred_label = pred_label[mask]
    label = label[mask]
    bins = np.arange(num_classes + 1)
    area_intersect, _ = np.histogram(pred_label[pred_label == label],
                                     bins=bins)
    area_pred, _ = np.histogram(pred_label, bins=bins)
    area_label, _ = np.histogram(label, bins=bins)
    area_union = area_pred + area_label - area_intersect
    return area_intersect, area_union, area_pred, area_label


def total_intersect_and_union(results, gt_seg_maps, num_classes: int,
                              ignore_index: int, label_map=None,
                              reduce_zero_label: bool = False):
    """Histogram sums over a result set (`metrics.py:62-103`)."""
    totals = [np.zeros(num_classes, dtype=np.float64) for _ in range(4)]
    assert len(results) == len(gt_seg_maps)
    for pred, gt in zip(results, gt_seg_maps):
        for tot, area in zip(totals, intersect_and_union(
                pred, gt, num_classes, ignore_index, label_map,
                reduce_zero_label)):
            tot += area
    return tuple(totals)


def eval_metrics(results, gt_seg_maps, num_classes: int, ignore_index: int,
                 metrics="mIoU", nan_to_num=None, label_map=None,
                 reduce_zero_label: bool = False):
    """Returns [aAcc, per-class acc, per-class metric...] exactly like the
    reference (`metrics.py:179-229`): mIoU = I/U, mDice = 2I/(P+G)."""
    if isinstance(metrics, str):
        metrics = [metrics]
    if not set(metrics).issubset({"mIoU", "mDice"}):
        raise KeyError(f"metrics {metrics} is not supported")
    ti, tu, tp, tg = total_intersect_and_union(
        results, gt_seg_maps, num_classes, ignore_index, label_map,
        reduce_zero_label)
    with np.errstate(divide="ignore", invalid="ignore"):
        ret = [ti.sum() / tg.sum(), ti / tg]
        for metric in metrics:
            ret.append(ti / tu if metric == "mIoU" else 2 * ti / (tp + tg))
    if nan_to_num is not None:
        ret = [np.nan_to_num(m, nan=nan_to_num) for m in ret]
    return ret


def mean_iou(results, gt_seg_maps, num_classes: int, ignore_index: int,
             nan_to_num=None, label_map=None, reduce_zero_label=False):
    """`metrics.py:105-140`: (aAcc, acc, IoU)."""
    return eval_metrics(results, gt_seg_maps, num_classes, ignore_index,
                        "mIoU", nan_to_num, label_map, reduce_zero_label)


def mean_dice(results, gt_seg_maps, num_classes: int, ignore_index: int,
              nan_to_num=None, label_map=None, reduce_zero_label=False):
    """`metrics.py:142-177`: (aAcc, acc, Dice)."""
    return eval_metrics(results, gt_seg_maps, num_classes, ignore_index,
                        "mDice", nan_to_num, label_map, reduce_zero_label)
