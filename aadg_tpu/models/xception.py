"""Aligned Xception encoder (flax linen, NHWC) for DeepLabV3+.

Capability match for the reference's dead custom-DeepLab backbone
(`/root/reference/models/backbone/xception.py:94-288`): the
DeepLab-modified ("aligned") Xception — entry flow (strided separable
blocks), 16-block middle flow, exit flow — with later strides replaced by
dilation for output-stride 16/8. Returns (low_level 128ch @1/4,
high_level 2048ch) like the other encoders.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn


class SepConvBN(nn.Module):
    features: int
    stride: int = 1
    dilation: int = 1
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        in_ch = x.shape[-1]
        x = nn.Conv(in_ch, (3, 3), strides=(self.stride,) * 2,
                    padding=self.dilation,
                    kernel_dilation=(self.dilation,) * 2,
                    feature_group_count=in_ch, use_bias=False,
                    dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, axis_name=self.axis_name)(x)
        x = nn.Conv(self.features, (1, 1), use_bias=False,
                    dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, axis_name=self.axis_name)(x)
        return x


class XceptionBlock(nn.Module):
    features: Sequence[int]          # 3 separable-conv widths
    stride: int = 1                  # applied on the last sep conv
    dilation: int = 1
    skip_type: str = "conv"          # conv | sum | none
    relu_first: bool = True
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        y = x
        for i, ch in enumerate(self.features):
            if self.relu_first or i > 0:
                y = nn.relu(y)
            y = SepConvBN(ch, stride=self.stride if i == 2 else 1,
                          dilation=self.dilation,
                          axis_name=self.axis_name,
                          dtype=self.dtype)(y, train)
        if self.skip_type == "conv":
            skip = nn.Conv(self.features[-1], (1, 1),
                           strides=(self.stride,) * 2, use_bias=False,
                           dtype=self.dtype)(x)
            skip = nn.BatchNorm(use_running_average=not train,
                                momentum=0.9, epsilon=1e-5,
                                axis_name=self.axis_name)(skip)
            return y + skip
        if self.skip_type == "sum":
            return y + x
        return y


class AlignedXception(nn.Module):
    output_stride: int = 16
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        an, dt = self.axis_name, self.dtype
        if self.output_stride == 16:
            entry3_stride, middle_dil, exit_dil = 2, 1, (1, 2)
        else:  # os 8
            entry3_stride, middle_dil, exit_dil = 1, 2, (2, 4)

        def bn():
            return nn.BatchNorm(use_running_average=not train,
                                momentum=0.9, epsilon=1e-5, axis_name=an)

        x = x.astype(dt)
        x = nn.Conv(32, (3, 3), strides=(2, 2), padding=1,
                    use_bias=False, dtype=dt)(x)
        x = nn.relu(bn()(x))
        x = nn.Conv(64, (3, 3), padding=1, use_bias=False, dtype=dt)(x)
        x = nn.relu(bn()(x))

        # entry flow
        x = XceptionBlock((128, 128, 128), stride=2, relu_first=False,
                          axis_name=an, dtype=dt)(x, train)
        low_level = x  # 128ch @ 1/4 (`deeplab.py:165`)
        x = XceptionBlock((256, 256, 256), stride=2,
                          axis_name=an, dtype=dt)(x, train)
        x = XceptionBlock((728, 728, 728), stride=entry3_stride,
                          axis_name=an, dtype=dt)(x, train)

        # middle flow: 16 sum-skip blocks
        for _ in range(16):
            x = XceptionBlock((728, 728, 728), dilation=middle_dil,
                              skip_type="sum", axis_name=an,
                              dtype=dt)(x, train)

        # exit flow
        x = XceptionBlock((728, 1024, 1024), dilation=exit_dil[0],
                          axis_name=an, dtype=dt)(x, train)
        x = nn.relu(SepConvBN(1536, dilation=exit_dil[1], axis_name=an,
                              dtype=dt)(x, train))
        x = nn.relu(SepConvBN(1536, dilation=exit_dil[1], axis_name=an,
                              dtype=dt)(x, train))
        x = nn.relu(SepConvBN(2048, dilation=exit_dil[1], axis_name=an,
                              dtype=dt)(x, train))
        return low_level, x

    @property
    def high_level_channels(self) -> int:
        return 2048

    @property
    def low_level_channels(self) -> int:
        return 128
