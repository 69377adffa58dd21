"""Image classifiers (flax linen, NHWC).

Capability match for the reference's classification leftovers from the
original Adversarial-AutoAugment codebase (SURVEY §2.2):
ResNet-CIFAR (`/root/reference/models/resnet.py:82-176`) and WideResNet
(`models/wideresnet.py:44-84`). Not on the segmentation path; kept so the
classification-policy-search capability surface is complete.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        def bn():
            return nn.BatchNorm(use_running_average=not train,
                                momentum=0.9, epsilon=1e-5,
                                axis_name=self.axis_name)
        y = nn.Conv(self.features, (3, 3), strides=(self.stride,) * 2,
                    padding=1, use_bias=False)(x)
        y = nn.relu(bn()(y))
        y = nn.Conv(self.features, (3, 3), padding=1, use_bias=False)(y)
        y = bn()(y)
        if x.shape[-1] != self.features or self.stride != 1:
            x = nn.Conv(self.features, (1, 1),
                        strides=(self.stride,) * 2, use_bias=False)(x)
            x = bn()(x)
        return nn.relu(x + y)


class ResNetCIFAR(nn.Module):
    """Pre-pool CIFAR ResNet (depth = 6n + 2: 20/32/44/56/110)."""
    depth: int = 20
    num_classes: int = 10
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        assert (self.depth - 2) % 6 == 0, "depth must be 6n+2"
        n = (self.depth - 2) // 6
        x = nn.Conv(16, (3, 3), padding=1, use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, axis_name=self.axis_name)(x)
        x = nn.relu(x)
        for stage, ch in enumerate((16, 32, 64)):
            for i in range(n):
                stride = 2 if (stage > 0 and i == 0) else 1
                x = BasicBlock(ch, stride, self.axis_name)(x, train)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_classes)(x)


class WideBlock(nn.Module):
    features: int
    stride: int = 1
    dropout: float = 0.0
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        def bn():
            return nn.BatchNorm(use_running_average=not train,
                                momentum=0.9, epsilon=1e-5,
                                axis_name=self.axis_name)
        y = nn.relu(bn()(x))
        shortcut = x
        if x.shape[-1] != self.features or self.stride != 1:
            shortcut = nn.Conv(self.features, (1, 1),
                               strides=(self.stride,) * 2,
                               use_bias=False)(y)
        y = nn.Conv(self.features, (3, 3), strides=(self.stride,) * 2,
                    padding=1, use_bias=False)(y)
        y = nn.relu(bn()(y))
        if self.dropout > 0:
            y = nn.Dropout(self.dropout, deterministic=not train)(y)
        y = nn.Conv(self.features, (3, 3), padding=1, use_bias=False)(y)
        return shortcut + y


class WideResNet(nn.Module):
    """WRN-d-k (`models/wideresnet.py:44-84`): depth = 6n + 4."""
    depth: int = 28
    widen_factor: int = 10
    num_classes: int = 10
    dropout: float = 0.0
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        assert (self.depth - 4) % 6 == 0, "depth must be 6n+4"
        n = (self.depth - 4) // 6
        k = self.widen_factor
        x = nn.Conv(16, (3, 3), padding=1, use_bias=False)(x)
        for stage, ch in enumerate((16 * k, 32 * k, 64 * k)):
            for i in range(n):
                stride = 2 if (stage > 0 and i == 0) else 1
                x = WideBlock(ch, stride, self.dropout,
                              self.axis_name)(x, train)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, axis_name=self.axis_name)(x)
        x = nn.relu(x)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_classes)(x)
