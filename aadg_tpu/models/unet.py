"""U-Net (flax linen, NHWC).

Capability match for the reference's classic 6-down/5-up U-Net
(`/root/reference/models/unet.py:39-72`), which returns
``(logits, bottleneck_feature)`` — the same (seg, feature) contract as the
patched smp model (`models/heads.py:14-25`). Here the bottleneck is
global-average-pooled to a feature vector so any feature discriminator can
consume it directly.

BatchNorm statistics are cross-replica when an ``axis_name`` is supplied —
the TPU-native replacement for the reference's vendored SyncBatchNorm
(`models/sync_batchnorm/batchnorm.py:38-278`).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn


class ConvBlock(nn.Module):
    features: int
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        for _ in range(2):
            x = nn.Conv(self.features, (3, 3), padding=1, use_bias=False)(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, axis_name=self.axis_name)(x)
            x = nn.relu(x)
        return x


def _max_pool(x):
    return nn.max_pool(x, (2, 2), strides=(2, 2))


def _bilinear_resize(x, h, w):
    import jax
    return jax.image.resize(x, (x.shape[0], h, w, x.shape[3]),
                            method="bilinear")


class UNet(nn.Module):
    in_channels: int = 3
    out_channels: int = 1
    base: int = 32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        an = self.axis_name
        c = self.base
        x1 = ConvBlock(c, an)(x, train)
        x2 = ConvBlock(c * 2, an)(_max_pool(x1), train)
        x3 = ConvBlock(c * 4, an)(_max_pool(x2), train)
        x4 = ConvBlock(c * 8, an)(_max_pool(x3), train)
        x5 = ConvBlock(c * 16, an)(_max_pool(x4), train)
        x6 = ConvBlock(c * 16, an)(_max_pool(x5), train)

        def up(a, skip, features):
            a = _bilinear_resize(a, skip.shape[1], skip.shape[2])
            a = jnp.concatenate([a, skip], axis=-1)
            return ConvBlock(features, an)(a, train)

        y = up(x6, x5, c * 16)
        y = up(y, x4, c * 8)
        y = up(y, x3, c * 4)
        y = up(y, x2, c * 2)
        y = up(y, x1, c)
        logits = nn.Conv(self.out_channels, (1, 1))(y)
        feature = jnp.mean(x6, axis=(1, 2))  # pooled bottleneck (B, 512)
        return logits, feature

    @property
    def feature_dim(self) -> int:
        return self.base * 16
