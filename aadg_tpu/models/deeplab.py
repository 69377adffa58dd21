"""DeepLabV3+ with MobileNetV2 encoder (flax linen, NHWC).

The flagship segmentation model, matching the capability of
``smp.DeepLabV3Plus(encoder_name='mobilenet_v2', classes=K,
aux_params=dict(pooling='avg'))`` as patched by the reference
(`/root/reference/models/__init__.py:15-23` + `models/heads.py:5-25`):
``model(x) -> (seg_logits, pooled_1280d_feature)`` where the pooled encoder
feature feeds the domain discriminator.

Architecture (smp DeepLabV3Plus defaults): encoder at output-stride 16,
ASPP with atrous rates (12, 24, 36) + global-pooling branch -> 256ch,
separable 3x3; decoder: low-level C2 -> 1x1 conv 48ch, ASPP out upsampled
x4, concat, two separable 3x3 convs -> 256; segmentation head: 3x3 conv to
classes + x4 bilinear upsample to input resolution.

BatchNorm takes ``axis_name`` for cross-replica statistics under shard_map
(TPU-native SyncBN).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .mobilenetv2 import MobileNetV2Encoder


def _bn(axis_name, train, dtype=jnp.float32):
    # flax computes BN statistics in f32 even for half dtypes; running the
    # normalize/scale math in bf16 avoids f32<->bf16 round-trips between
    # convs (measured 19% faster fwd+bwd)
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, axis_name=axis_name, dtype=dtype)


class SeparableConvBNReLU(nn.Module):
    features: int
    dilation: int = 1
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        # XLA's native grouped conv is the fast path here even when
        # dilated: shifted-add alternatives (ops/convs.py) measured
        # faster in isolated microbenches but slower inside the fused
        # full-step program (1438 -> 1296 img/s) — see ops/convs.py.
        in_ch = x.shape[-1]
        x = nn.Conv(in_ch, (3, 3), padding=self.dilation,
                    feature_group_count=in_ch,
                    kernel_dilation=(self.dilation, self.dilation),
                    use_bias=False, dtype=self.dtype, name="Conv_0")(x)
        x = nn.Conv(self.features, (1, 1), use_bias=False,
                    dtype=self.dtype, name="Conv_1")(x)
        x = _bn(self.axis_name, train, self.dtype)(x)
        return nn.relu(x)


class ASPP(nn.Module):
    features: int = 256
    atrous_rates: Sequence[int] = (12, 24, 36)
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        an = self.axis_name
        branches = []
        # 1x1 branch
        y = nn.Conv(self.features, (1, 1), use_bias=False,
                    dtype=self.dtype)(x)
        y = _bn(an, train, self.dtype)(y)
        branches.append(nn.relu(y))
        # atrous separable branches
        for rate in self.atrous_rates:
            branches.append(SeparableConvBNReLU(
                self.features, dilation=rate, axis_name=an,
                dtype=self.dtype)(x, train))
        # image pooling branch
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        pooled = nn.Conv(self.features, (1, 1), use_bias=False,
                         dtype=self.dtype)(pooled)
        pooled = _bn(an, train, self.dtype)(pooled)
        pooled = nn.relu(pooled)
        pooled = jnp.broadcast_to(
            pooled, (x.shape[0], x.shape[1], x.shape[2], self.features))
        branches.append(pooled)

        y = jnp.concatenate(branches, axis=-1).astype(self.dtype)
        y = nn.Conv(self.features, (1, 1), use_bias=False,
                    dtype=self.dtype)(y)
        y = _bn(an, train, self.dtype)(y)
        y = nn.relu(y)
        # smp applies a separable 3x3 after ASPP
        return SeparableConvBNReLU(self.features, axis_name=an,
                                   dtype=self.dtype)(y, train)


class DeepLabV3Plus(nn.Module):
    num_classes: int
    decoder_channels: int = 256
    axis_name: Optional[str] = None
    compute_dtype: jnp.dtype = jnp.float32
    # per-block activation checkpointing in the encoder (see
    # MobileNetV2Encoder.remat); numerics + param tree unchanged
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        an = self.axis_name
        low, high = MobileNetV2Encoder(
            axis_name=an, dtype=self.compute_dtype, remat=self.remat,
            name="encoder")(x, train)

        y = ASPP(self.decoder_channels, axis_name=an,
                 dtype=self.compute_dtype, name="aspp")(high, train)
        y = jax.image.resize(
            y, (y.shape[0], low.shape[1], low.shape[2], y.shape[3]),
            method="bilinear")

        skip = nn.Conv(48, (1, 1), use_bias=False, name="low_conv",
                       dtype=self.compute_dtype)(low)
        skip = _bn(an, train, self.compute_dtype)(skip)
        skip = nn.relu(skip)

        y = jnp.concatenate([y.astype(self.compute_dtype),
                             skip.astype(self.compute_dtype)], axis=-1)
        y = SeparableConvBNReLU(self.decoder_channels, axis_name=an,
                                dtype=self.compute_dtype)(y, train)
        y = SeparableConvBNReLU(self.decoder_channels, axis_name=an,
                                dtype=self.compute_dtype)(y, train)

        logits = nn.Conv(self.num_classes, (3, 3), padding=1,
                         name="seg_head")(y.astype(jnp.float32))
        logits = jax.image.resize(
            logits, (logits.shape[0], x.shape[1], x.shape[2],
                     self.num_classes), method="bilinear")

        # aux head: the patched smp ClassificationHead is pool+flatten only
        # (`models/heads.py:14-25`) — the raw pooled 1280-d encoder feature
        feature = jnp.mean(high, axis=(1, 2))
        return logits.astype(jnp.float32), feature.astype(jnp.float32)

    @property
    def feature_dim(self) -> int:
        return 1280
