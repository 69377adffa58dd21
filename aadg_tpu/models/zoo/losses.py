"""mmseg-semantics segmentation losses, as pure jittable jnp functions.

Behavioral parity targets (reference, vendored mmseg v0.11.0):

- ``cross_entropy`` / ``binary_cross_entropy``:
  `/root/reference/models/mmseg/models/losses/cross_entropy_loss.py:10-100`
  — per-pixel CE with optional per-class weight, per-pixel weight,
  ignore_index (zero loss, still counted by the plain-mean reduction) and
  ``avg_factor``.
- ``lovasz_softmax`` / ``lovasz_hinge``:
  `/root/reference/models/mmseg/models/losses/lovasz_loss.py:14-289` —
  Lovasz extension of the Jaccard index (Berman 2018, Alg. 1).
- ``accuracy``:
  `/root/reference/models/mmseg/models/losses/accuracy.py:4-50` — top-k
  pixel accuracy with optional score threshold (in percent).

TPU-first design notes: the torch versions drop ignored pixels by boolean
indexing (dynamic shapes). Under jit we instead keep static shapes and
*neutralise* invalid pixels: for the sort-based Lovasz losses, invalid
pixels are forced to the tail of the descending error sort with a zero
(softmax; errors are >=0 so 0 contributes nothing to the dot product) or
-1e9 (hinge; relu kills it) error and zero ground truth, which leaves the
valid prefix of the sorted sequence — and therefore the loss — identical
to physically removing them.

All functions take channel-LAST logits ``(..., C)`` (framework-wide NHWC
convention) where mmseg uses NCHW.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp


def _reduce(loss: jnp.ndarray, weight: Optional[jnp.ndarray],
            reduction: str, avg_factor: Optional[float]) -> jnp.ndarray:
    """mmseg ``weight_reduce_loss`` (`losses/utils.py`): elementwise weight,
    then mean/sum/none; ``avg_factor`` replaces the mean denominator."""
    if weight is not None:
        loss = loss * weight.astype(loss.dtype)
    if reduction == "none":
        return loss
    if avg_factor is None:
        return jnp.mean(loss) if reduction == "mean" else jnp.sum(loss)
    if reduction != "mean":
        raise ValueError("avg_factor can only be used with reduction='mean'")
    return jnp.sum(loss) / avg_factor


def cross_entropy(logits: jnp.ndarray, label: jnp.ndarray,
                  weight: Optional[jnp.ndarray] = None,
                  class_weight: Optional[Sequence[float]] = None,
                  reduction: str = "mean",
                  avg_factor: Optional[float] = None,
                  ignore_index: int = -100) -> jnp.ndarray:
    """Multiclass CE (`cross_entropy_loss.py:10-32`). ``logits`` (..., C),
    integer ``label`` (...). Ignored pixels contribute 0 but remain in the
    plain-mean denominator (torch ``reduction='none'`` then ``.mean()``)."""
    num_classes = logits.shape[-1]
    valid = (label != ignore_index) & (label >= 0) & (label < num_classes)
    safe_label = jnp.where(valid, label, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe_label[..., None], axis=-1)[..., 0]
    if class_weight is not None:
        cw = jnp.asarray(class_weight, jnp.float32)
        nll = nll * cw[safe_label]
    nll = jnp.where(valid, nll, 0.0)
    return _reduce(nll, weight, reduction, avg_factor)


def binary_cross_entropy(logits: jnp.ndarray, label: jnp.ndarray,
                         weight: Optional[jnp.ndarray] = None,
                         reduction: str = "mean",
                         avg_factor: Optional[float] = None,
                         class_weight: Optional[Sequence[float]] = None,
                         ignore_index: int = 255) -> jnp.ndarray:
    """BCE-with-logits (`cross_entropy_loss.py:57-100`). When ``label`` has
    one fewer dim than ``logits`` it is expanded to one-hot with invalid
    (ignore_index / out-of-range) pixels weighted 0 across all channels
    (`_expand_onehot_labels`, :35-54). ``class_weight`` acts as
    ``pos_weight``."""
    if label.ndim == logits.ndim - 1:
        num_classes = logits.shape[-1]
        valid = ((label >= 0) & (label != ignore_index)
                 & (label < num_classes))
        onehot = jax.nn.one_hot(jnp.where(valid, label, 0), num_classes)
        onehot = onehot * valid[..., None]
        vmask = jnp.broadcast_to(valid[..., None],
                                 logits.shape).astype(jnp.float32)
        weight = vmask if weight is None else weight[..., None] * vmask
        label = onehot
    x = logits.astype(jnp.float32)
    t = label.astype(jnp.float32)
    # log-sum-exp stable BCE-with-logits, torch pos_weight semantics
    log_p = jax.nn.log_sigmoid(x)
    log_1mp = jax.nn.log_sigmoid(-x)
    pos = -t * log_p
    if class_weight is not None:
        pos = pos * jnp.asarray(class_weight, jnp.float32)
    loss = pos - (1.0 - t) * log_1mp
    return _reduce(loss, weight, reduction, avg_factor)


# ---------------------------------------------------------------------------
# Lovasz losses
# ---------------------------------------------------------------------------

def _lovasz_grad(gt_sorted: jnp.ndarray) -> jnp.ndarray:
    """Gradient of the Lovasz extension w.r.t. sorted errors
    (`lovasz_loss.py:14-26`)."""
    gts = jnp.sum(gt_sorted)
    intersection = gts - jnp.cumsum(gt_sorted)
    union = gts + jnp.cumsum(1.0 - gt_sorted)
    jaccard = 1.0 - intersection / jnp.maximum(union, 1e-12)
    return jnp.concatenate([jaccard[:1], jaccard[1:] - jaccard[:-1]])


def _hinge_flat(logits: jnp.ndarray, labels: jnp.ndarray,
                valid: jnp.ndarray) -> jnp.ndarray:
    """`lovasz_hinge_flat` (:60-81) with static-shape ignore handling."""
    labels = labels.astype(jnp.float32) * valid
    signs = 2.0 * labels - 1.0
    errors = 1.0 - logits.astype(jnp.float32) * signs
    errors = jnp.where(valid > 0, errors, -1e9)
    order = jnp.argsort(-errors)
    errors_sorted = errors[order]
    gt_sorted = labels[order]
    return jnp.dot(jax.nn.relu(errors_sorted), _lovasz_grad(gt_sorted))


def _softmax_flat(probs: jnp.ndarray, labels: jnp.ndarray,
                  valid: jnp.ndarray, classes, class_weight) -> jnp.ndarray:
    """`lovasz_softmax_flat` (:185-222): per-class |fg - prob| errors sorted
    descending, dotted with the Lovasz gradient; 'present' averages only
    over classes that appear in the (valid) labels."""
    num_classes = probs.shape[-1]
    class_ids = (range(num_classes) if classes in ("all", "present")
                 else classes)
    losses = []
    present_w = []
    for c in class_ids:
        # C==1 is the sigmoid-binary case: foreground is label 1
        # (`lovasz_loss.py:196-201`)
        fg_label = 1 if num_classes == 1 else c
        fg = ((labels == fg_label) & (valid > 0)).astype(jnp.float32)
        pc = probs[:, 0] if num_classes == 1 else probs[:, c]
        errors = jnp.abs(fg - pc.astype(jnp.float32))
        errors = jnp.where(valid > 0, errors, 0.0)
        order = jnp.argsort(-errors)
        loss_c = jnp.dot(errors[order], _lovasz_grad(fg[order]))
        if class_weight is not None:
            loss_c = loss_c * class_weight[c]
        losses.append(loss_c)
        present_w.append(jnp.sum(fg) > 0 if classes == "present"
                         else jnp.asarray(True))
    losses = jnp.stack(losses)
    pw = jnp.stack(present_w).astype(jnp.float32)
    return jnp.sum(losses * pw) / jnp.maximum(jnp.sum(pw), 1.0)


def lovasz_hinge(logits: jnp.ndarray, labels: jnp.ndarray,
                 per_image: bool = False,
                 reduction: str = "mean",
                 avg_factor: Optional[float] = None,
                 ignore_index: int = 255) -> jnp.ndarray:
    """Binary Lovasz hinge (`lovasz_loss.py:84-123`). ``logits`` (N, H, W)
    raw scores, ``labels`` (N, H, W) in {0,1}."""
    valid = (labels != ignore_index).astype(jnp.float32)
    if per_image:
        flat = lambda a: a.reshape(a.shape[0], -1)
        per = jax.vmap(_hinge_flat)(flat(logits), flat(labels), flat(valid))
        return _reduce(per, None, reduction, avg_factor)
    return _hinge_flat(logits.reshape(-1), labels.reshape(-1),
                       valid.reshape(-1))


def lovasz_softmax(probs: jnp.ndarray, labels: jnp.ndarray,
                   classes="present", per_image: bool = False,
                   class_weight: Optional[Sequence[float]] = None,
                   reduction: str = "mean",
                   avg_factor: Optional[float] = None,
                   ignore_index: int = 255) -> jnp.ndarray:
    """Multiclass Lovasz-Softmax (`lovasz_loss.py:225-270`). ``probs``
    (N, H, W, C) softmax probabilities (channel-last), ``labels``
    (N, H, W) ints."""
    valid = (labels != ignore_index).astype(jnp.float32)
    cw = None if class_weight is None else jnp.asarray(class_weight,
                                                       jnp.float32)
    if per_image:
        def one(p, l, v):
            return _softmax_flat(p.reshape(-1, p.shape[-1]), l.reshape(-1),
                                 v.reshape(-1), classes, cw)
        per = jax.vmap(one)(probs, labels, valid)
        return _reduce(per, None, reduction, avg_factor)
    return _softmax_flat(probs.reshape(-1, probs.shape[-1]),
                         labels.reshape(-1), valid.reshape(-1), classes, cw)


def accuracy(logits: jnp.ndarray, target: jnp.ndarray, topk=1,
             thresh: Optional[float] = None):
    """Top-k pixel accuracy in percent (`accuracy.py:4-50`). ``logits``
    (..., C) channel-last, integer ``target`` (...)."""
    if isinstance(topk, int):
        topk_t, single = (topk,), True
    else:
        topk_t, single = tuple(topk), False
    maxk = max(topk_t)
    vals, idx = jax.lax.top_k(logits, maxk)
    correct = (idx == target[..., None])
    if thresh is not None:
        correct = correct & (vals > thresh)
    res = []
    for k in topk_t:
        res.append(100.0 * jnp.sum(
            jnp.any(correct[..., :k], axis=-1).astype(jnp.float32))
            / target.size)
    return res[0] if single else res
