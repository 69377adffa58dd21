"""Segmentors: EncoderDecoder and CascadeEncoderDecoder.

Re-designs of the reference's vendored mmseg segmentors
(`/root/reference/models/mmseg/models/segmentors/encoder_decoder.py:13-287`
and `cascade_encoder_decoder.py`): backbone (+ optional neck) -> decode
head (+ optional auxiliary heads), whole- or slide-mode inference.

TPU-first shape: the segmentor is a flax module whose ``__call__`` obeys
the framework-wide ``(x, train) -> (seg_logits, pooled_feature)`` contract
(logits bilinearly upsampled to input resolution, `encoder_decoder.py:84-95`
``encode_decode``); auxiliary-head logits for deep supervision come from
``forward_train`` (`:96-168`). Slide inference reuses the batched
static-grid kernel in `aadg_tpu/engine/slide.py` instead of the
reference's Python double loop (`:169-213`).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

import jax

from ...engine.slide import slide_inference
from .layers import resize
from .point_head import get_points_train, point_rend_refine


class EncoderDecoder(nn.Module):
    """backbone -> [neck] -> decode_head, upsampled to input size.

    NOTE: when ``auxiliary_heads`` are configured, initialize variables
    through ``method=EncoderDecoder.forward_train`` so the aux-head
    parameters are created (``__call__`` skips them by design — they are
    train-time deep supervision only)."""
    backbone: nn.Module
    decode_head: nn.Module
    neck: Optional[nn.Module] = None
    auxiliary_heads: Sequence[nn.Module] = ()
    # pooled-feature width (what the domain discriminator consumes); set
    # by the builder so the engine need not guess from the backbone name
    feat_ch: int = 0

    @property
    def feature_dim(self):
        return self.feat_ch or None

    def extract_feat(self, x, train: bool = True):
        """`encoder_decoder.py:77-83`."""
        feats = self.backbone(x, train)
        if self.neck is not None:
            feats = self.neck(feats, train)
        return feats

    def __call__(self, x, train: bool = True):
        feats = self.extract_feat(x, train)
        logits = self.decode_head(feats, train)
        logits = resize(logits, (x.shape[1], x.shape[2]))
        pooled = jnp.mean(feats[-1], axis=(1, 2))
        return logits, pooled

    def forward_train(self, x, train: bool = True):
        """Returns (logits, pooled, aux_logits): auxiliary heads add
        deep-supervision terms during training
        (`encoder_decoder.py:113-128`, loss weights live in the loss)."""
        feats = self.extract_feat(x, train)
        logits = resize(self.decode_head(feats, train),
                        (x.shape[1], x.shape[2]))
        aux = tuple(
            resize(h(feats, train), (x.shape[1], x.shape[2]))
            for h in self.auxiliary_heads)
        pooled = jnp.mean(feats[-1], axis=(1, 2))
        return logits, pooled, aux


class CascadeEncoderDecoder(EncoderDecoder):
    """`cascade_encoder_decoder.py`: decode_head is a *sequence*; head k
    refines using the features plus head k-1's output. ``decode_head``
    here is the first head; ``cascade_heads`` take ``(feats, prev_output,
    train)``."""
    cascade_heads: Sequence[nn.Module] = ()

    def __call__(self, x, train: bool = True):
        feats = self.extract_feat(x, train)
        out = self.decode_head(feats, train)
        for h in self.cascade_heads:
            out = h(feats, out, train)
        logits = resize(out, (x.shape[1], x.shape[2]))
        pooled = jnp.mean(feats[-1], axis=(1, 2))
        return logits, pooled

    def forward_train(self, x, train: bool = True):
        """Cascade deep supervision (`cascade_encoder_decoder.py:63-79`:
        every stage's loss is computed, stage k consuming stage k-1's
        output): returns ``(final_logits, pooled, aux)`` where ``aux``
        holds the INTERMEDIATE stage outputs (upsampled) followed by any
        auxiliary heads — the ocrnet recipe weighs the FCN stage 0.4 and
        the OCR refiner 1.0, exactly the trainer's ``aux_weight``
        convention."""
        feats = self.extract_feat(x, train)
        out = self.decode_head(feats, train)
        stages = [out]
        for h in self.cascade_heads:
            out = h(feats, out, train)
            stages.append(out)
        size = (x.shape[1], x.shape[2])
        logits = resize(stages[-1], size)
        aux = tuple(resize(s, size) for s in stages[:-1]) + tuple(
            resize(h(feats, train), size) for h in self.auxiliary_heads)
        pooled = jnp.mean(feats[-1], axis=(1, 2))
        return logits, pooled, aux


class PointRendSegmentor(EncoderDecoder):
    """PointRend (`cascade_encoder_decoder.py` driving `point_head.py` —
    the mmseg ``pointrend_r50/r101`` family): FPN base, coarse FPNHead,
    PointHead refinement.

    Eval (``train=False``) runs the iterative-subdivision refinement
    (`point_head.py` forward_test, test_cfg subdivision_steps=2).
    Train-time ``__call__`` returns the coarse logits (the decode-head
    loss path); the point loss trains through ``forward_train_points``,
    which `zoo.train_api.train_segmentor` consumes exactly like mmseg's
    cascade ``loss_point`` (importance-sampled points, nearest-sampled
    gt labels)."""
    point_head: Optional[nn.Module] = None
    train_num_points: int = 2048
    oversample_ratio: float = 3.0
    importance_sample_ratio: float = 0.75
    subdivision_steps: int = 2
    subdivision_num_points: int = 8196

    def __call__(self, x, train: bool = True):
        feats = self.extract_feat(x, train)
        coarse = self.decode_head(feats, train)
        if not train:
            def head_apply(fs, logits, coords):
                return self.point_head(fs, logits, coords, train)
            coarse = point_rend_refine(
                head_apply, feats, coarse,
                subdivision_steps=self.subdivision_steps,
                subdivision_num_points=self.subdivision_num_points)
        logits = resize(coarse, (x.shape[1], x.shape[2]))
        pooled = jnp.mean(feats[-1], axis=(1, 2))
        return logits, pooled

    def forward_train_points(self, x, rng, train: bool = True):
        """Returns (coarse_logits_upsampled, pooled, point_logits,
        point_coords). Point selection follows `point_head.py`
        get_points_train on the stop-gradient coarse map (mmseg samples
        under torch.no_grad)."""
        feats = self.extract_feat(x, train)
        coarse = self.decode_head(feats, train)
        pts = get_points_train(
            jax.lax.stop_gradient(coarse), self.train_num_points,
            self.oversample_ratio, self.importance_sample_ratio, rng)
        point_logits = self.point_head(feats, coarse, pts, train)
        logits = resize(coarse, (x.shape[1], x.shape[2]))
        pooled = jnp.mean(feats[-1], axis=(1, 2))
        return logits, pooled, point_logits, pts


def whole_inference(apply_fn, images: jnp.ndarray) -> jnp.ndarray:
    """`encoder_decoder.py:214-226`: one full-image forward; logits are
    already rescaled to input size by the segmentor."""
    logits, _ = apply_fn(images)
    return logits


def segmentor_slide_inference(apply_fn, images: jnp.ndarray,
                              crop: Tuple[int, int],
                              stride: Tuple[int, int],
                              num_classes: int) -> jnp.ndarray:
    """`encoder_decoder.py:169-213` semantics on the batched static-grid
    TPU kernel."""
    def fwd(windows):
        logits, _ = apply_fn(windows)
        return logits
    return slide_inference(fwd, images, crop, stride, num_classes)
