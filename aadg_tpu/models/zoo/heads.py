"""Decode heads, batch 1: conv/pyramid-pooling family.

Flax/NHWC re-designs of the reference's vendored mmseg decode heads
(`/root/reference/models/mmseg/models/decode_heads/`): FCN (`fcn_head.py`),
separable FCN (`sep_fcn_head.py`), PSP (`psp_head.py`), ASPP
(`aspp_head.py`), separable ASPP (`sep_aspp_head.py`), UPer
(`uper_head.py`), FPN (`fpn_head.py`) and Lite-R-ASPP (`lraspp_head.py`).

Shared contract (BaseDecodeHead, `decode_head.py:46-215`): heads take the
backbone's multi-scale feature list, select/merge stages via
``in_index``/``input_transform``, and end with dropout(`dropout_ratio`) +
a 1x1 ``conv_seg`` classifier. Heads return raw logits at feature
resolution; the segmentor upsamples.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import (ConvModule, DepthwiseSeparableConvModule,
                     adaptive_avg_pool, resize, transform_inputs)


class ClsSeg(nn.Module):
    """dropout + 1x1 classifier (`decode_head.py:209-215`)."""
    num_classes: int
    dropout_ratio: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.dropout_ratio > 0:
            x = nn.Dropout(self.dropout_ratio)(x, deterministic=not train)
        return nn.Conv(self.num_classes, (1, 1), name="conv_seg")(x)


class FCNHead(nn.Module):
    """`fcn_head.py`: num_convs 3x3 convs (+ optional concat-input conv)."""
    num_classes: int
    channels: int = 256
    num_convs: int = 2
    concat_input: bool = True
    kernel: int = 3
    in_index: Any = -1
    input_transform: Optional[str] = None
    dropout_ratio: float = 0.1
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, inputs, train: bool = True):
        x = transform_inputs(inputs, self.in_index, self.input_transform)
        feats = x
        for i in range(self.num_convs):
            feats = ConvModule(self.channels, self.kernel,
                               axis_name=self.axis_name,
                               name=f"convs_{i}")(feats, train)
        if self.num_convs == 0:
            feats = x
        elif self.concat_input:
            feats = ConvModule(self.channels, self.kernel,
                               axis_name=self.axis_name, name="conv_cat")(
                jnp.concatenate([x, feats], axis=-1), train)
        return ClsSeg(self.num_classes, self.dropout_ratio,
                      name="cls")(feats, train)


class DepthwiseSeparableFCNHead(nn.Module):
    """`sep_fcn_head.py` (Fast-SCNN decode head): FCN with depthwise
    separable convs."""
    num_classes: int
    channels: int = 128
    num_convs: int = 1
    concat_input: bool = False
    in_index: Any = -1
    input_transform: Optional[str] = None
    dropout_ratio: float = 0.1
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, inputs, train: bool = True):
        x = transform_inputs(inputs, self.in_index, self.input_transform)
        feats = x
        for i in range(self.num_convs):
            feats = DepthwiseSeparableConvModule(
                self.channels, 3, axis_name=self.axis_name,
                name=f"convs_{i}")(feats, train)
        if self.concat_input:
            feats = DepthwiseSeparableConvModule(
                self.channels, 3, axis_name=self.axis_name, name="conv_cat")(
                jnp.concatenate([x, feats], axis=-1), train)
        return ClsSeg(self.num_classes, self.dropout_ratio,
                      name="cls")(feats, train)


class PPM(nn.Module):
    """Pyramid pooling module (`psp_head.py:11-54`)."""
    pool_scales: Tuple[int, ...]
    channels: int
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        size = (x.shape[1], x.shape[2])
        outs = []
        for i, scale in enumerate(self.pool_scales):
            p = adaptive_avg_pool(x, scale)
            p = ConvModule(self.channels, 1, axis_name=self.axis_name,
                           name=f"pool_{i}")(p, train)
            outs.append(resize(p, size))
        return outs


class PSPHead(nn.Module):
    """`psp_head.py:57-101`: PPM(1,2,3,6) + concat + 3x3 bottleneck."""
    num_classes: int
    channels: int = 512
    pool_scales: Tuple[int, ...] = (1, 2, 3, 6)
    in_index: Any = -1
    input_transform: Optional[str] = None
    dropout_ratio: float = 0.1
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, inputs, train: bool = True):
        x = transform_inputs(inputs, self.in_index, self.input_transform)
        outs = [x] + PPM(self.pool_scales, self.channels,
                         axis_name=self.axis_name, name="ppm")(x, train)
        feats = ConvModule(self.channels, 3, axis_name=self.axis_name,
                           name="bottleneck")(
            jnp.concatenate(outs, axis=-1), train)
        return ClsSeg(self.num_classes, self.dropout_ratio,
                      name="cls")(feats, train)


class ASPPModule(nn.Module):
    """`aspp_head.py:11-48`: parallel dilated conv branches."""
    dilations: Tuple[int, ...]
    channels: int
    separable: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        outs = []
        for i, d in enumerate(self.dilations):
            if d == 1 or not self.separable:
                outs.append(ConvModule(
                    self.channels, 1 if d == 1 else 3, dilation=d,
                    axis_name=self.axis_name, name=f"branch_{i}")(x, train))
            else:
                outs.append(DepthwiseSeparableConvModule(
                    self.channels, 3, dilation=d, axis_name=self.axis_name,
                    name=f"branch_{i}")(x, train))
        return outs


class ASPPHead(nn.Module):
    """`aspp_head.py:51-106`: image pool + dilated branches (1,12,24,36)
    + bottleneck."""
    num_classes: int
    channels: int = 512
    dilations: Tuple[int, ...] = (1, 12, 24, 36)
    in_index: Any = -1
    input_transform: Optional[str] = None
    dropout_ratio: float = 0.1
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, inputs, train: bool = True):
        x = transform_inputs(inputs, self.in_index, self.input_transform)
        size = (x.shape[1], x.shape[2])
        pool = adaptive_avg_pool(x, 1)
        pool = ConvModule(self.channels, 1, axis_name=self.axis_name,
                          name="image_pool")(pool, train)
        outs = [resize(pool, size)] + ASPPModule(
            self.dilations, self.channels, axis_name=self.axis_name,
            name="aspp")(x, train)
        feats = ConvModule(self.channels, 3, axis_name=self.axis_name,
                           name="bottleneck")(
            jnp.concatenate(outs, axis=-1), train)
        return ClsSeg(self.num_classes, self.dropout_ratio,
                      name="cls")(feats, train)


class DepthwiseSeparableASPPHead(nn.Module):
    """`sep_aspp_head.py:30-101` (DeepLabV3+ head): separable ASPP on the
    high-level feature, fused with a projected low-level (c1) feature
    through two separable 3x3 convs."""
    num_classes: int
    channels: int = 512
    dilations: Tuple[int, ...] = (1, 12, 24, 36)
    c1_in_index: int = 0
    c1_channels: int = 48
    in_index: Any = -1
    input_transform: Optional[str] = None
    dropout_ratio: float = 0.1
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, inputs, train: bool = True):
        x = transform_inputs(inputs, self.in_index, self.input_transform)
        size = (x.shape[1], x.shape[2])
        pool = adaptive_avg_pool(x, 1)
        pool = ConvModule(self.channels, 1, axis_name=self.axis_name,
                          name="image_pool")(pool, train)
        outs = [resize(pool, size)] + ASPPModule(
            self.dilations, self.channels, separable=True,
            axis_name=self.axis_name, name="aspp")(x, train)
        feats = ConvModule(self.channels, 3, axis_name=self.axis_name,
                           name="bottleneck")(
            jnp.concatenate(outs, axis=-1), train)
        if self.c1_channels > 0:
            c1 = ConvModule(self.c1_channels, 1, axis_name=self.axis_name,
                            name="c1_bottleneck")(
                inputs[self.c1_in_index], train)
            feats = resize(feats, (c1.shape[1], c1.shape[2]))
            feats = jnp.concatenate([feats, c1], axis=-1)
        feats = DepthwiseSeparableConvModule(
            self.channels, 3, axis_name=self.axis_name,
            name="sep_bottleneck_0")(feats, train)
        feats = DepthwiseSeparableConvModule(
            self.channels, 3, axis_name=self.axis_name,
            name="sep_bottleneck_1")(feats, train)
        return ClsSeg(self.num_classes, self.dropout_ratio,
                      name="cls")(feats, train)


class UPerHead(nn.Module):
    """`uper_head.py`: PSP on the top stage + FPN top-down fusion over all
    stages, concat + 3x3 fuse."""
    num_classes: int
    channels: int = 512
    pool_scales: Tuple[int, ...] = (1, 2, 3, 6)
    in_index: Tuple[int, ...] = (0, 1, 2, 3)
    dropout_ratio: float = 0.1
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, inputs, train: bool = True):
        xs = [inputs[i] for i in self.in_index]
        top = xs[-1]
        psp = [top] + PPM(self.pool_scales, self.channels,
                          axis_name=self.axis_name, name="ppm")(top, train)
        psp = ConvModule(self.channels, 3, axis_name=self.axis_name,
                         name="psp_bottleneck")(
            jnp.concatenate(psp, axis=-1), train)
        laterals = [ConvModule(self.channels, 1, axis_name=self.axis_name,
                               name=f"lateral_{i}")(x, train)
                    for i, x in enumerate(xs[:-1])] + [psp]
        for i in range(len(laterals) - 1, 0, -1):
            size = (laterals[i - 1].shape[1], laterals[i - 1].shape[2])
            laterals[i - 1] = laterals[i - 1] + resize(laterals[i], size)
        outs = [ConvModule(self.channels, 3, axis_name=self.axis_name,
                           name=f"fpn_conv_{i}")(laterals[i], train)
                for i in range(len(laterals) - 1)] + [laterals[-1]]
        size = (outs[0].shape[1], outs[0].shape[2])
        outs = [resize(o, size) for o in outs]
        feats = ConvModule(self.channels, 3, axis_name=self.axis_name,
                           name="fpn_bottleneck")(
            jnp.concatenate(outs, axis=-1), train)
        return ClsSeg(self.num_classes, self.dropout_ratio,
                      name="cls")(feats, train)


class FPNHead(nn.Module):
    """`fpn_head.py` (Panoptic-FPN style): per-stage conv(+x2 upsample)
    chains down to the finest stride, then summed.

    ``feature_strides`` is STATIC configuration exactly like mmseg's
    (`fpn_head.py:19-37`): stage i runs ``max(1, log2(s_i) - log2(s_0))``
    conv(+x2-upsample) rounds. It must align with ``in_index`` and be set
    per backbone (the builder probes real strides with ``eval_shape``, so
    dilated backbones like the OS8 ResNetV1c get (4, 8, 8, 8)). Deriving
    the depth from runtime shapes instead would make the PARAMETER
    STRUCTURE input-size-dependent — init at one size could not run
    inference at another."""
    num_classes: int
    channels: int = 128
    in_index: Tuple[int, ...] = (0, 1, 2, 3)
    feature_strides: Tuple[int, ...] = (4, 8, 16, 32)
    dropout_ratio: float = 0.1
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, inputs, train: bool = True):
        xs = [inputs[i] for i in self.in_index]
        assert len(xs) == len(self.feature_strides)
        h0, w0 = xs[0].shape[1], xs[0].shape[2]
        s0 = int(math.log2(self.feature_strides[0]))
        out = None
        for i, x in enumerate(xs):
            si = int(math.log2(self.feature_strides[i]))
            for k in range(max(1, si - s0)):
                x = ConvModule(self.channels, 3, axis_name=self.axis_name,
                               name=f"scale_head_{i}_{k}")(x, train)
                if self.feature_strides[i] != self.feature_strides[0]:
                    # x2 like the reference; clamped so ceil-ed odd
                    # intermediate sizes still land exactly on stage 0
                    x = resize(x, (min(h0, x.shape[1] * 2),
                                   min(w0, x.shape[2] * 2)))
            out = x if out is None else out + x
        return ClsSeg(self.num_classes, self.dropout_ratio,
                      name="cls")(out, train)


class LRASPPHead(nn.Module):
    """`lraspp_head.py:12-90` (Searching for MobileNetV3): sigmoid-gated
    image-pool attention on the top stage, upsample-and-fuse with skip
    branches via 1x1 convs."""
    num_classes: int
    channels: int = 128
    branch_channels: Tuple[int, ...] = (32, 64)
    in_index: Tuple[int, ...] = (0, 1, 2)
    dropout_ratio: float = 0.1
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, inputs, train: bool = True):
        xs = [inputs[i] for i in self.in_index]
        x = xs[-1]
        size = (x.shape[1], x.shape[2])
        # reference gate branch (`lraspp_head.py:59-66`): AvgPool2d(49,
        # stride=(16, 20)) — a SLIDING pooled gate, not a global one — then
        # a norm-free sigmoid 1x1 conv, bilinear-resized back. torch
        # AvgPool2d errors when the grid is smaller than the kernel (the
        # mmseg config pairs this head with Cityscapes-scale inputs);
        # there we fall back to global pooling, the k>=grid limit.
        if x.shape[1] >= 49 and x.shape[2] >= 49:
            gate = jax.lax.reduce_window(
                x, 0.0, jax.lax.add, (1, 49, 49, 1), (1, 16, 20, 1),
                "valid") / float(49 * 49)
        else:
            gate = adaptive_avg_pool(x, 1)
        gate = ConvModule(self.channels, 1, act="sigmoid", norm=False,
                          use_bias=False, axis_name=self.axis_name,
                          name="image_pool")(gate, train)
        x = ConvModule(self.channels, 1, axis_name=self.axis_name,
                       name="aspp_conv")(x, train) * resize(gate, size)
        x = nn.Conv(self.channels, (1, 1), name="conv_up_input")(x)
        for i in range(len(self.branch_channels) - 1, -1, -1):
            x = resize(x, (xs[i].shape[1], xs[i].shape[2]))
            branch = nn.Conv(self.branch_channels[i], (1, 1),
                             use_bias=False, name=f"convs_{i}")(xs[i])
            x = ConvModule(self.channels, 1, axis_name=self.axis_name,
                           name=f"conv_ups_{i}")(
                jnp.concatenate([x, branch], axis=-1), train)
        return ClsSeg(self.num_classes, self.dropout_ratio,
                      name="cls")(x, train)
