"""Zoo losses / eval metrics vs torch + dynamic-shape numpy oracles."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from aadg_tpu.models.zoo import (accuracy, binary_cross_entropy,
                                 cross_entropy, lovasz_hinge, lovasz_softmax)
from aadg_tpu.metrics import eval_metrics, intersect_and_union


def test_cross_entropy_matches_torch(rng):
    logits = rng.normal(size=(2, 5, 5, 4)).astype(np.float32)
    label = rng.integers(0, 4, size=(2, 5, 5))
    label[0, 0, :] = 255  # ignored
    cw = [1.0, 2.0, 0.5, 1.5]
    ours = cross_entropy(jnp.asarray(logits), jnp.asarray(label),
                         class_weight=cw, ignore_index=255)
    t = F.cross_entropy(torch.tensor(logits).permute(0, 3, 1, 2),
                        torch.tensor(label, dtype=torch.long),
                        weight=torch.tensor(cw), reduction="none",
                        ignore_index=255).mean()
    np.testing.assert_allclose(float(ours), float(t), rtol=1e-5)


def test_binary_cross_entropy_onehot_expansion(rng):
    logits = rng.normal(size=(2, 4, 4, 3)).astype(np.float32)
    label = rng.integers(0, 3, size=(2, 4, 4))
    label[1, 3, :] = 255
    ours = binary_cross_entropy(jnp.asarray(logits), jnp.asarray(label))
    # torch oracle: expand onehot w/ valid mask weights then BCEwithlogits
    lt = torch.tensor(label, dtype=torch.long)
    valid = (lt >= 0) & (lt != 255)
    onehot = torch.zeros(2, 4, 4, 3)
    idx = torch.nonzero(valid, as_tuple=True)
    onehot[idx[0], idx[1], idx[2], lt[valid]] = 1
    w = valid.unsqueeze(-1).expand(-1, -1, -1, 3).float()
    t = F.binary_cross_entropy_with_logits(
        torch.tensor(logits), onehot, reduction="none")
    t = (t * w).mean()
    np.testing.assert_allclose(float(ours), float(t), rtol=1e-5)


def _lovasz_grad_np(gt_sorted):
    gts = gt_sorted.sum()
    intersection = gts - np.cumsum(gt_sorted)
    union = gts + np.cumsum(1.0 - gt_sorted)
    jaccard = 1.0 - intersection / union
    out = jaccard.copy()
    out[1:] = jaccard[1:] - jaccard[:-1]
    return out


def _lovasz_softmax_np(probs, labels, ignore=None, classes="present"):
    """Dynamic-shape oracle following lovasz_loss.py:185-222 exactly."""
    probs = probs.reshape(-1, probs.shape[-1])
    labels = labels.reshape(-1)
    if ignore is not None:
        keep = labels != ignore
        probs, labels = probs[keep], labels[keep]
    C = probs.shape[1]
    losses = []
    for c in range(C):
        fg = (labels == c).astype(np.float64)
        if classes == "present" and fg.sum() == 0:
            continue
        errors = np.abs(fg - probs[:, c])
        order = np.argsort(-errors, kind="stable")
        losses.append(np.dot(errors[order], _lovasz_grad_np(fg[order])))
    return np.mean(losses)


def _lovasz_hinge_np(logits, labels, ignore=None):
    logits = logits.reshape(-1)
    labels = labels.reshape(-1)
    if ignore is not None:
        keep = labels != ignore
        logits, labels = logits[keep], labels[keep]
    signs = 2.0 * labels - 1.0
    errors = 1.0 - logits * signs
    order = np.argsort(-errors, kind="stable")
    return np.dot(np.maximum(errors[order], 0),
                  _lovasz_grad_np(labels[order].astype(np.float64)))


@pytest.mark.parametrize("with_ignore", [False, True])
def test_lovasz_softmax_matches_oracle(rng, with_ignore):
    logits = rng.normal(size=(2, 6, 6, 4)).astype(np.float32)
    probs = np.asarray(torch.softmax(torch.tensor(logits), -1))
    labels = rng.integers(0, 4, size=(2, 6, 6))
    labels[:, :2, :] = 3  # make class 3 heavy; keep 'present' interesting
    ignore = None
    if with_ignore:
        labels[0, :, 0] = 255
        ignore = 255
    ours = lovasz_softmax(jnp.asarray(probs), jnp.asarray(labels),
                          ignore_index=255 if with_ignore else -12345)
    oracle = _lovasz_softmax_np(probs.astype(np.float64), labels, ignore)
    np.testing.assert_allclose(float(ours), oracle, rtol=1e-4)


@pytest.mark.parametrize("with_ignore", [False, True])
def test_lovasz_hinge_matches_oracle(rng, with_ignore):
    logits = rng.normal(size=(2, 6, 6)).astype(np.float32)
    labels = rng.integers(0, 2, size=(2, 6, 6))
    ignore = None
    if with_ignore:
        labels[1, 0, :] = 255
        ignore = 255
    ours = lovasz_hinge(jnp.asarray(logits), jnp.asarray(labels),
                        ignore_index=255 if with_ignore else -12345)
    oracle = _lovasz_hinge_np(logits.astype(np.float64), labels, ignore)
    np.testing.assert_allclose(float(ours), oracle, rtol=1e-4)


def test_lovasz_per_image_mean(rng):
    probs = np.asarray(torch.softmax(torch.tensor(
        rng.normal(size=(3, 5, 5, 2)).astype(np.float32)), -1))
    labels = rng.integers(0, 2, size=(3, 5, 5))
    ours = lovasz_softmax(jnp.asarray(probs), jnp.asarray(labels),
                          per_image=True)
    oracle = np.mean([_lovasz_softmax_np(probs[i].astype(np.float64),
                                         labels[i]) for i in range(3)])
    np.testing.assert_allclose(float(ours), oracle, rtol=1e-4)


def test_accuracy_topk_thresh(rng):
    logits = rng.normal(size=(2, 4, 4, 5)).astype(np.float32)
    target = rng.integers(0, 5, size=(2, 4, 4))
    a1 = accuracy(jnp.asarray(logits), jnp.asarray(target))
    exp = 100.0 * np.mean(np.argmax(logits, -1) == target)
    np.testing.assert_allclose(float(a1), exp, rtol=1e-5)
    a1t, a3 = accuracy(jnp.asarray(logits), jnp.asarray(target),
                       topk=(1, 3), thresh=0.0)
    srt = np.sort(logits, -1)[..., ::-1]
    arg = np.argsort(-logits, -1)
    in3 = ((arg[..., :3] == target[..., None])
           & (srt[..., :3] > 0.0)).any(-1)
    np.testing.assert_allclose(float(a3), 100.0 * np.mean(in3), rtol=1e-5)
    assert float(a1t) <= float(a1) + 1e-6


def test_eval_metrics_miou_mdice(rng):
    preds = [rng.integers(0, 3, size=(16, 16)) for _ in range(4)]
    gts = [rng.integers(0, 3, size=(16, 16)) for _ in range(4)]
    gts[0][:4] = 255
    aacc, acc, iou, dice = eval_metrics(preds, gts, 3, 255,
                                        ["mIoU", "mDice"])
    # manual check of class 1
    inter = sum(((p == 1) & (g == 1) & (g != 255)).sum()
                for p, g in zip(preds, gts))
    parea = sum(((p == 1) & (g != 255)).sum() for p, g in zip(preds, gts))
    garea = sum((g == 1).sum() for g in gts)
    np.testing.assert_allclose(iou[1], inter / (parea + garea - inter))
    np.testing.assert_allclose(dice[1], 2 * inter / (parea + garea))
    np.testing.assert_allclose(acc[1], inter / garea)
    total_i = sum(((p == g) & (g != 255)).sum() for p, g in zip(preds, gts))
    total_g = sum((g != 255).sum() for g in gts)
    np.testing.assert_allclose(aacc, total_i / total_g)


def test_reduce_zero_label():
    pred = np.zeros((4, 4), dtype=np.int64)
    gt = np.ones((4, 4), dtype=np.int64)  # class 1 -> 0 after reduction
    gt[0, 0] = 0  # unlabeled -> ignored
    ai, au, ap, ag = intersect_and_union(pred, gt, 2, 255,
                                         reduce_zero_label=True)
    assert ag[0] == 15 and ai[0] == 15 and ag[1] == 0
