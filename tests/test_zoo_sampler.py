"""OHEM pixel sampler vs an independent torch oracle.

The oracle re-derives mmseg's OHEMPixelSampler semantics
(`core/seg/sampler/ohem_pixel_sampler.py:30-77`) from its documented
behavior: mine valid pixels either by true-class confidence below
``max(thresh, k-th lowest)`` or by keeping the ``min_kept*N`` largest
per-pixel CE losses.
"""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from aadg_tpu.models.zoo.sampler import ohem_weights


def _oracle(logits_nhwc, label, ignore_index, thresh, min_kept):
    lg = torch.tensor(logits_nhwc).permute(0, 3, 1, 2)  # NCHW
    lb = torch.tensor(label, dtype=torch.long)
    n, c = lg.shape[0], lg.shape[1]
    batch_kept = min_kept * n
    valid = (lb != ignore_index) & (lb >= 0) & (lb < c)
    w = torch.zeros_like(lb, dtype=torch.float32)
    if thresh is not None:
        prob = F.softmax(lg, dim=1)
        safe = lb.clone()
        safe[~valid] = 0
        true_prob = prob.gather(1, safe.unsqueeze(1)).squeeze(1)
        vp = true_prob[valid]
        sort_prob, _ = vp.sort()
        if sort_prob.numel() > 0:
            min_thr = sort_prob[min(batch_kept, sort_prob.numel() - 1)]
        else:
            min_thr = 0.0
        threshold = max(float(min_thr), thresh)
        w[valid & (true_prob < threshold)] = 1.0
    else:
        losses = F.cross_entropy(lg, lb.clamp(0, c - 1), reduction="none")
        losses[~valid] = 0
        vl = losses[valid]
        _, sort_idx = vl.sort(descending=True)
        vw = torch.zeros_like(vl)
        vw[sort_idx[:batch_kept]] = 1.0
        w[valid] = vw
    return w.numpy()


def _case(rng, thresh, min_kept, shape=(2, 8, 8), c=4):
    logits = rng.normal(size=shape + (c,)).astype(np.float32)
    label = rng.integers(0, c, size=shape)
    label[0, :2, :] = 255  # ignored region
    ours = np.asarray(ohem_weights(
        jnp.asarray(logits), jnp.asarray(label), ignore_index=255,
        thresh=thresh, min_kept=min_kept))
    ref = _oracle(logits, label, 255, thresh, min_kept)
    return ours, ref, label


def test_thresh_branch_matches_torch(rng):
    ours, ref, _ = _case(rng, thresh=0.7, min_kept=20)
    np.testing.assert_array_equal(ours, ref)


def test_thresh_branch_min_kept_floor(rng):
    # thresh so tight that fewer than min_kept pixels pass -> the k-th
    # lowest valid probability takes over as the threshold
    ours, ref, _ = _case(rng, thresh=1e-9, min_kept=10)
    np.testing.assert_array_equal(ours, ref)
    assert ours.sum() >= 10 * 2  # at least batch_kept mined


def test_topk_loss_branch_matches_torch(rng):
    ours, ref, label = _case(rng, thresh=None, min_kept=15)
    # keeps exactly min_kept*N hardest valid pixels
    assert ours.sum() == ref.sum() == 15 * 2
    # the kept SET must coincide wherever losses are untied (random floats:
    # ties have measure zero) — compare masks directly
    np.testing.assert_array_equal(ours, ref)
    assert (ours[label == 255] == 0).all()


def test_topk_loss_branch_fewer_valid_than_kept(rng):
    logits = rng.normal(size=(1, 4, 4, 3)).astype(np.float32)
    label = rng.integers(0, 3, size=(1, 4, 4))
    label[0, :3, :] = 255  # only 4 valid pixels, min_kept*N = 8
    ours = np.asarray(ohem_weights(
        jnp.asarray(logits), jnp.asarray(label), thresh=None, min_kept=8))
    assert ours.sum() == 4  # never mines ignored pixels
    assert (ours[label == 255] == 0).all()


def test_weights_feed_cross_entropy(rng):
    """End-to-end: OHEM weights plug into zoo cross_entropy as `weight`
    (the decode_head.py:225-226 wiring) and zero out easy pixels."""
    from aadg_tpu.models.zoo.losses import cross_entropy
    logits = rng.normal(size=(2, 8, 8, 4)).astype(np.float32)
    label = rng.integers(0, 4, size=(2, 8, 8))
    w = ohem_weights(jnp.asarray(logits), jnp.asarray(label),
                     thresh=None, min_kept=5)
    loss = cross_entropy(jnp.asarray(logits), jnp.asarray(label),
                         weight=w, avg_factor=float(jnp.sum(w)))
    assert np.isfinite(float(loss))
