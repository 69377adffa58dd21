"""Necks. FPN re-design of `/root/reference/models/mmseg/models/necks/fpn.py`
(lateral 1x1 convs, top-down pathway, 3x3 output convs; extra outputs via
stride-2 pooling on the last level)."""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn


def _nearest_resize(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """torch ``F.interpolate(mode='nearest')``: ``src = floor(dst *
    in/out)`` — the reference FPN's top-down upsample
    (`fpn.py:76,181-183`, mmdet's ``upsample_cfg=dict(mode='nearest')``
    default)."""
    h, w = size
    ys = jnp.floor(jnp.arange(h) * (x.shape[1] / h)).astype(jnp.int32)
    xs = jnp.floor(jnp.arange(w) * (x.shape[2] / w)).astype(jnp.int32)
    return x[:, ys][:, :, xs]


class FPN(nn.Module):
    out_channels: int = 256
    num_outs: int = 4
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, inputs, train: bool = True):
        # mmseg FPN defaults: no norm/act on lateral or fpn convs
        laterals = [nn.Conv(self.out_channels, (1, 1),
                            name=f"lateral_{i}")(x)
                    for i, x in enumerate(inputs)]
        for i in range(len(laterals) - 1, 0, -1):
            size = (laterals[i - 1].shape[1], laterals[i - 1].shape[2])
            laterals[i - 1] = laterals[i - 1] + _nearest_resize(
                laterals[i], size)
        outs = [nn.Conv(self.out_channels, (3, 3), padding=1,
                        name=f"fpn_conv_{i}")(laterals[i])
                for i in range(len(laterals))]
        while len(outs) < self.num_outs:
            outs.append(nn.max_pool(outs[-1], (1, 1), strides=(2, 2)))
        return outs
