"""MobileNetV2 encoder (flax linen, NHWC).

The reference gets this from segmentation_models_pytorch / torchvision
(`/root/reference/models/__init__.py:15-23`). Standard inverted-residual
stack (t,c,n,s table from the MobileNetV2 paper) with the last stride-2
stage optionally dilated so the encoder runs at output-stride 16 for
DeepLabV3+ (smp's ``make_dilated`` behavior).

Feature taps follow smp's encoder stages: C2 (24ch @ 1/4) feeds the decoder
low-level path, C5 (1280ch @ 1/16) feeds ASPP and the pooled aux feature
(the discriminator input, `models/heads.py:14-25` + `channel_parser` 1280,
`models/__init__.py:219-222`).

ImageNet-pretrained initialization: no torchvision weights ship in this
image (zero egress); ``tools/convert_torch_weights.py`` converts a
torchvision ``mobilenet_v2`` state_dict into this module's param tree when
one is available on disk. Documented divergence: without it, training
starts from random init.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn


def _make_divisible(v: float, divisor: int = 8) -> int:
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class ConvBNReLU6(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    dilation: int = 1
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        # NOTE: XLA's native grouped conv is the fast path for the
        # encoder's stride-1/2 high-resolution depthwise convs; the
        # shifted-add kernel (ops/convs.py) only wins for the *dilated*
        # depthwise convs in ASPP (measured: swapping it in here regressed
        # the step 2.4x, swapping it into ASPP gained 1.5x).
        pad = (self.kernel - 1) // 2 * self.dilation
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), padding=pad,
                    feature_group_count=self.groups, use_bias=False,
                    kernel_dilation=(self.dilation, self.dilation),
                    dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, axis_name=self.axis_name,
                         dtype=self.dtype)(x)
        return jnp.minimum(nn.relu(x), 6.0)


class InvertedResidual(nn.Module):
    features: int
    stride: int
    expand_ratio: int
    dilation: int = 1
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        in_ch = x.shape[-1]
        hidden = int(round(in_ch * self.expand_ratio))
        use_res = self.stride == 1 and in_ch == self.features
        y = x
        if self.expand_ratio != 1:
            y = ConvBNReLU6(hidden, kernel=1, axis_name=self.axis_name,
                            dtype=self.dtype)(y, train)
        y = ConvBNReLU6(hidden, kernel=3, stride=self.stride,
                        groups=hidden, dilation=self.dilation,
                        axis_name=self.axis_name, dtype=self.dtype)(y, train)
        y = nn.Conv(self.features, (1, 1), use_bias=False,
                    dtype=self.dtype)(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, axis_name=self.axis_name,
                         dtype=self.dtype)(y)
        return x + y if use_res else y


# (expand t, channels c, repeats n, stride s) — MobileNetV2 table 2
_SETTINGS = [
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
]


class MobileNetV2Encoder(nn.Module):
    """Returns (low_level C2 @1/4 24ch, high_level C5 1280ch).

    ``remat=True`` wraps every inverted-residual block in ``nn.remat``
    (per-block activation checkpointing): only block-boundary activations
    stay alive across the fwd/bwd boundary, and each block's expansion
    activations are recomputed during its own backward — cutting peak HBM
    at the cost of ~⅓ extra forward FLOPs. Numerics are identical (same
    ops, tested); param tree is unchanged, so checkpoints interoperate.
    Off by default: at the reference batch (B=8) the step is at its HBM
    roofline and remat only adds traffic; it is a lever for large-batch
    envelopes where peak memory approaches the 16 GB chip."""
    width_mult: float = 1.0
    output_stride: int = 16
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        an = self.axis_name
        # static_argnums: 0 is the module instance in linen's lifted
        # remat; 2 is the `train` bool
        block_cls = (nn.remat(InvertedResidual, static_argnums=(2,))
                     if self.remat else InvertedResidual)
        x = x.astype(self.dtype)
        x = ConvBNReLU6(_make_divisible(32 * self.width_mult), kernel=3,
                        stride=2, axis_name=an, dtype=self.dtype)(x, train)
        low_level = None
        current_stride = 2
        dilation = 1
        blk = 0  # explicit sequential names = the auto-names the
        # unlifted class would get, so remat on/off (and existing
        # checkpoints) share one param tree
        for block_idx, (t, c, n, s) in enumerate(_SETTINGS):
            out_ch = _make_divisible(c * self.width_mult)
            for i in range(n):
                stride = s if i == 0 else 1
                if stride == 2 and current_stride >= self.output_stride:
                    # dilate instead of striding past the output stride
                    dilation *= 2
                    stride = 1
                x = block_cls(out_ch, stride, t,
                              dilation=dilation if stride == 1 else 1,
                              axis_name=an, dtype=self.dtype,
                              name=f"InvertedResidual_{blk}")(x, train)
                blk += 1
                if stride == 2:
                    current_stride *= 2
            if block_idx == 1:  # after the 24-channel stage: C2 @ 1/4
                low_level = x
        x = ConvBNReLU6(_make_divisible(1280 * max(1.0, self.width_mult)),
                        kernel=1, axis_name=an, dtype=self.dtype)(x, train)
        return low_level, x

    @property
    def high_level_channels(self) -> int:
        return 1280

    @property
    def low_level_channels(self) -> int:
        return 24
