"""ResNet backbone (flax linen, NHWC) for the custom DeepLab variant.

Capability match for the reference's dead custom-DeepLab backbones
(`/root/reference/models/backbone/resnet.py:45-162`): bottleneck ResNet-50/
101 with output-stride 16/8 via dilation in the later stages (the DeepLab
convention), returning (low_level C2, high_level C5) like the MobileNetV2
encoder. Xception/DRN remain unimplemented round-1 (PARITY.md).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn


class Bottleneck(nn.Module):
    features: int  # bottleneck width; output = 4x
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
                    kernel_dilation=(self.dilation,) * 2,
                    use_bias=False, dtype=self.dtype)(y)
        y = nn.relu(bn()(y))
        y = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype)(y)
        y = bn()(y)
        if x.shape[-1] != out_ch or self.stride != 1:
            x = nn.Conv(out_ch, (1, 1), strides=(self.stride,) * 2,
                        use_bias=False, dtype=self.dtype)(x)
            x = bn()(x)
        return nn.relu(x + y)


class ResNetEncoder(nn.Module):
    """ResNet-50/101 DeepLab encoder: returns (C2 256ch @1/4, C5 2048ch
    @1/output_stride)."""
    depth: int = 101
    output_stride: int = 16
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        blocks = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}[self.depth]
        if self.output_stride == 16:
            strides, dilations = (1, 2, 2, 1), (1, 1, 1, 2)
        else:  # output_stride 8
            strides, dilations = (1, 2, 1, 1), (1, 1, 2, 4)

        x = x.astype(self.dtype)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3,
                    use_bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, axis_name=self.axis_name)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        low_level = None
        widths = (64, 128, 256, 512)
        for stage in range(4):
            for i in range(blocks[stage]):
                x = Bottleneck(widths[stage],
                               stride=strides[stage] if i == 0 else 1,
                               dilation=dilations[stage],
                               axis_name=self.axis_name,
                               dtype=self.dtype)(x, train)
            if stage == 0:
                low_level = x  # C2: 256ch @ 1/4
        return low_level, x

    @property
    def high_level_channels(self) -> int:
        return 2048

    @property
    def low_level_channels(self) -> int:
        return 256
