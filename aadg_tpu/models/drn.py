"""Dilated Residual Network (DRN-D-54) encoder (flax linen, NHWC).

Capability match for the reference's dead custom-DeepLab backbone
(`/root/reference/models/backbone/drn.py:102-402`, drn_d_54): a ResNet-ish
stack that replaces the last two stride-2 stages with dilation 2 and 4,
keeping the output at stride 8, followed by two dilation-smoothing conv
levels. Returns (low_level 256ch, high_level 512ch @ 1/8).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn


class _ConvBNReLU(nn.Module):
    features: int
    stride: int = 1
    dilation: int = 1
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.Conv(self.features, (3, 3), strides=(self.stride,) * 2,
                    padding=self.dilation,
                    kernel_dilation=(self.dilation,) * 2, use_bias=False,
                    dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, axis_name=self.axis_name)(x)
        return nn.relu(x)


class _Bottleneck(nn.Module):
    features: int
    stride: int = 1
    dilation: int = 1
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        def bn():
            return nn.BatchNorm(use_running_average=not train,
                                momentum=0.9, epsilon=1e-5,
                                axis_name=self.axis_name)
        out_ch = self.features * 4
        y = nn.Conv(self.features, (1, 1), use_bias=False,
                    dtype=self.dtype)(x)
        y = nn.relu(bn()(y))
        y = nn.Conv(self.features, (3, 3), strides=(self.stride,) * 2,
                    padding=self.dilation,
                    kernel_dilation=(self.dilation,) * 2, use_bias=False,
                    dtype=self.dtype)(y)
        y = nn.relu(bn()(y))
        y = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype)(y)
        y = bn()(y)
        if x.shape[-1] != out_ch or self.stride != 1:
            x = nn.Conv(out_ch, (1, 1), strides=(self.stride,) * 2,
                        use_bias=False, dtype=self.dtype)(x)
            x = bn()(x)
        return nn.relu(x + y)


class DRN_D_54(nn.Module):
    """Levels (D variant): conv layers at 16/32ch, bottleneck stages
    (3,4,6,3) at strides (1,2,2->dil2,2->dil4), then 512ch smoothing
    levels at dilation 2 and 1."""
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        an, dt = self.axis_name, self.dtype
        x = x.astype(dt)
        # level 1-2: plain convs
        x = _ConvBNReLU(16, axis_name=an, dtype=dt)(x, train)
        x = _ConvBNReLU(32, stride=2, axis_name=an, dtype=dt)(x, train)
        # level 3-6: bottleneck stages
        for i in range(3):
            x = _Bottleneck(64, stride=2 if i == 0 else 1,
                            axis_name=an, dtype=dt)(x, train)
        low_level = x  # 256ch @ 1/4 (`deeplab.py:163-164`: drn -> 256)
        for i in range(4):
            x = _Bottleneck(128, stride=2 if i == 0 else 1,
                            axis_name=an, dtype=dt)(x, train)
        for i in range(6):
            x = _Bottleneck(256, dilation=2, axis_name=an,
                            dtype=dt)(x, train)
        for i in range(3):
            x = _Bottleneck(512, dilation=4, axis_name=an,
                            dtype=dt)(x, train)
        # level 7-8: dilation-smoothing plain convs (D variant)
        x = _ConvBNReLU(512, dilation=2, axis_name=an, dtype=dt)(x, train)
        x = _ConvBNReLU(512, dilation=1, axis_name=an, dtype=dt)(x, train)
        return low_level, x

    @property
    def high_level_channels(self) -> int:
        return 512

    @property
    def low_level_channels(self) -> int:
        return 256
