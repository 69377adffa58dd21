"""Shared building blocks for the zoo (flax, NHWC).

The mmcv ``ConvModule`` (conv -> BN -> ReLU) and
``DepthwiseSeparableConvModule`` become small flax modules; ``resize``
matches mmseg's ``align_corners=False`` bilinear (half-pixel centers —
the jax.image.resize convention).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn


def _interp_matrix(n_in: int, n_out: int, align_corners: bool):
    """(n_out, n_in) bilinear interpolation matrix with torch
    F.interpolate semantics — NO antialiasing on downscale (torch default),
    half-pixel centers (align_corners=False) or endpoint-pinned
    (align_corners=True) source coordinates."""
    import numpy as np
    if n_out == n_in:
        return np.eye(n_out, dtype=np.float32)
    if align_corners and n_out > 1:
        src = np.linspace(0.0, n_in - 1.0, n_out)
    else:
        src = np.clip((np.arange(n_out) + 0.5) * (n_in / n_out) - 0.5,
                      0.0, n_in - 1.0)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, n_in - 1)
    frac = (src - lo).astype(np.float32)
    m = np.zeros((n_out, n_in), np.float32)
    m[np.arange(n_out), lo] += 1.0 - frac
    m[np.arange(n_out), hi] += frac
    return m


def bilinear_resize(x: jnp.ndarray, size: Tuple[int, int],
                    align_corners: bool = False) -> jnp.ndarray:
    """torch ``F.interpolate(mode='bilinear')`` for NHWC, as two separable
    interpolation matmuls (MXU work, no gathers). Unlike
    ``jax.image.resize`` this does NOT antialias on downscale — matching
    mmseg's ``resize`` (`/root/reference/models/mmseg/ops/wrappers.py`)
    exactly in both directions, and supports ``align_corners=True``."""
    if x.shape[1] == size[0] and x.shape[2] == size[1]:
        return x
    wh = jnp.asarray(_interp_matrix(x.shape[1], size[0], align_corners),
                     dtype=x.dtype)
    ww = jnp.asarray(_interp_matrix(x.shape[2], size[1], align_corners),
                     dtype=x.dtype)
    x = jnp.einsum("oh,bhwc->bowc", wh, x)
    return jnp.einsum("pw,bowc->bopc", ww, x)


def resize(x: jnp.ndarray, size: Tuple[int, int],
           method: str = "bilinear") -> jnp.ndarray:
    """Bilinear resize to (H, W), align_corners=False semantics.

    Upscaling uses ``jax.image.resize`` (identical to torch
    align_corners=False there); downscaling routes through
    :func:`bilinear_resize` because ``jax.image.resize`` antialiases on
    downscale and torch/mmseg do not."""
    if x.shape[1] == size[0] and x.shape[2] == size[1]:
        return x
    if method == "bilinear" and (size[0] < x.shape[1]
                                 or size[1] < x.shape[2]):
        return bilinear_resize(x, size, align_corners=False)
    return jax.image.resize(
        x, (x.shape[0], size[0], size[1], x.shape[-1]), method=method
    ).astype(x.dtype)


class ConvModule(nn.Module):
    """mmcv ConvModule: conv2d -> BatchNorm -> activation."""
    features: int
    kernel: int = 3
    strides: int = 1
    dilation: int = 1
    norm: bool = True
    act: Optional[str] = "relu"
    use_bias: Optional[bool] = None
    # None = 'same' (dilation*(k-1)//2), what every mmseg head config
    # passes explicitly; mmcv's own default is 0 (Fast-SCNN's first
    # downsample conv relies on that)
    padding: Optional[int] = None
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        pad = self.dilation * (self.kernel - 1) // 2 \
            if self.padding is None else self.padding
        bias = (not self.norm) if self.use_bias is None else self.use_bias
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.strides, self.strides),
                    kernel_dilation=(self.dilation, self.dilation),
                    padding=pad, use_bias=bias, name="conv")(x)
        if self.norm:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, axis_name=self.axis_name,
                             dtype=x.dtype, name="bn")(x)
        if self.act == "relu":
            x = nn.relu(x)
        elif self.act == "sigmoid":
            x = nn.sigmoid(x)
        elif self.act is not None:
            raise ValueError(self.act)
        return x


class DepthwiseSeparableConvModule(nn.Module):
    """mmcv DepthwiseSeparableConvModule: depthwise ConvModule followed by
    pointwise ConvModule (each with its own BN+ReLU)."""
    features: int
    kernel: int = 3
    strides: int = 1
    dilation: int = 1
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        in_ch = x.shape[-1]
        pad = self.dilation * (self.kernel - 1) // 2
        x = nn.Conv(in_ch, (self.kernel, self.kernel),
                    strides=(self.strides, self.strides),
                    kernel_dilation=(self.dilation, self.dilation),
                    padding=pad, feature_group_count=in_ch, use_bias=False,
                    name="depthwise")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, axis_name=self.axis_name,
                         dtype=x.dtype, name="dw_bn")(x)
        x = nn.relu(x)
        x = nn.Conv(self.features, (1, 1), use_bias=False,
                    name="pointwise")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, axis_name=self.axis_name,
                         dtype=x.dtype, name="pw_bn")(x)
        return nn.relu(x)


def adaptive_avg_pool(x: jnp.ndarray, out: Union[int, Tuple[int, int]]
                      ) -> jnp.ndarray:
    """torch AdaptiveAvgPool2d for NHWC. Static output size; start/end
    indices follow torch's floor/ceil rule."""
    if isinstance(out, int):
        out = (out, out)
    b, h, w, c = x.shape
    oh, ow = out
    if oh == 1 and ow == 1:
        return jnp.mean(x, axis=(1, 2), keepdims=True)
    # torch: start = floor(i*H/oh), end = ceil((i+1)*H/oh)
    def pool_axis(arr, size, o, axis):
        segs = []
        for i in range(o):
            s = (i * size) // o
            e = -(-((i + 1) * size) // o)
            segs.append(jnp.mean(
                jax.lax.slice_in_dim(arr, s, e, axis=axis), axis=axis,
                keepdims=True))
        return jnp.concatenate(segs, axis=axis)
    x = pool_axis(x, h, oh, 1)
    return pool_axis(x, w, ow, 2)


def transform_inputs(inputs: Sequence[jnp.ndarray], in_index: Any,
                     input_transform: Optional[str]):
    """BaseDecodeHead._transform_inputs
    (`decode_heads/decode_head.py:139-166`): select one stage, select
    several, or resize-to-first-and-concat."""
    if input_transform == "resize_concat":
        xs = [inputs[i] for i in in_index]
        size = (xs[0].shape[1], xs[0].shape[2])
        return jnp.concatenate([resize(x, size) for x in xs], axis=-1)
    if input_transform == "multiple_select":
        return [inputs[i] for i in in_index]
    if isinstance(inputs, (list, tuple)):
        return inputs[in_index]
    return inputs
