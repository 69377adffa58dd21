"""Domain discriminators (flax linen).

Three variants matching `/root/reference/models/discriminator.py`:

- ``FeatureDiscriminator`` (:5-17): MLP in_ch -> 128 -> num_domains on the
  pooled encoder feature.
- ``MomentumFeatureDiscriminator`` (:20-59): an online MLP plus an EMA
  ("momentum") copy; the momentum branch embeds features for the Sinkhorn
  reward (stop-gradient), the online branch trains with CE. The EMA update
  and the warmup-end synchronization are *pure pytree functions* here
  (``momentum_update`` / ``synchronize_parameters``) instead of in-place
  .data mutation.
- ``ImageDiscriminator`` (:62-101): 5 stride-2 conv blocks on raw images.

Linear/Conv init follows torch defaults (kaiming-uniform kernels, fan-in
uniform bias) so warmup dynamics track the reference.
"""

from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn


def torch_kernel_init(key, shape, dtype=jnp.float32):
    """torch nn.Linear / nn.Conv2d default: kaiming_uniform(a=sqrt(5)),
    i.e. U(-1/sqrt(fan_in), 1/sqrt(fan_in)) on the kernel."""
    if len(shape) == 2:  # dense: (in, out)
        fan_in = shape[0]
    else:  # conv HWIO: (kh, kw, in, out)
        fan_in = shape[0] * shape[1] * shape[2]
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_bias_init_for(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


class _MLPHead(nn.Module):
    """dis (in->128 + LeakyReLU 0.2) and fc (128 -> num_classes)."""
    in_channels: int
    num_classes: int

    @nn.compact
    def __call__(self, x, return_feature: bool = False):
        fe = nn.Dense(128, kernel_init=torch_kernel_init,
                      bias_init=torch_bias_init_for(self.in_channels),
                      name="dis")(x)
        fe = nn.leaky_relu(fe, negative_slope=0.2)
        out = nn.Dense(self.num_classes, kernel_init=torch_kernel_init,
                       bias_init=torch_bias_init_for(128), name="fc")(fe)
        if return_feature:
            return out, fe
        return out


class FeatureDiscriminator(nn.Module):
    num_classes: int
    in_channels: int = 1280

    @nn.compact
    def __call__(self, x, return_feature: bool = False):
        return _MLPHead(self.in_channels, self.num_classes,
                        name="head")(x, return_feature)


class MomentumFeatureDiscriminator(nn.Module):
    """Holds BOTH branches as submodules; ``momentum`` selects which one
    runs (the momentum branch under stop_gradient, `discriminator.py:48-51`).
    """
    num_classes: int
    in_channels: int
    m: float = 0.999

    @nn.compact
    def __call__(self, x, momentum: bool = False,
                 return_feature: bool = False):
        online = _MLPHead(self.in_channels, self.num_classes, name="online")
        mom = _MLPHead(self.in_channels, self.num_classes, name="momentum")
        # run both branches so flax materializes both parameter trees at
        # init (the branches are tiny MLPs); `momentum` is a static bool
        out_online = online(x, return_feature)
        out_mom = jax.tree_util.tree_map(
            jax.lax.stop_gradient,
            mom(jax.lax.stop_gradient(x), return_feature))
        return out_mom if momentum else out_online


def momentum_update(params: Dict[str, Any], m: float = 0.999
                    ) -> Dict[str, Any]:
    """EMA update of the momentum branch (`discriminator.py:32-37`):
    k <- m * k + (1 - m) * q. Pure: returns new params."""
    new = dict(params)
    new["momentum"] = jax.tree_util.tree_map(
        lambda k, q: m * k + (1.0 - m) * q,
        params["momentum"], params["online"])
    return new


def synchronize_parameters(params: Dict[str, Any]) -> Dict[str, Any]:
    """Copy online -> momentum at warmup end (`discriminator.py:39-44`)."""
    new = dict(params)
    new["momentum"] = jax.tree_util.tree_map(lambda q: q,
                                             params["online"])
    return new


class _ConvBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.Conv(self.features, (3, 3), strides=(2, 2), padding=1,
                    kernel_init=torch_kernel_init)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5)(x)
        return nn.leaky_relu(x, negative_slope=0.2)


class ImageDiscriminator(nn.Module):
    """5-layer strided conv net on raw images (NHWC), pooled, MLP head."""
    num_classes: int

    @nn.compact
    def __call__(self, x, train: bool = True, return_feature: bool = False):
        for ch in (32, 64, 128, 256, 512):
            x = _ConvBlock(ch)(x, train)
        x = jnp.mean(x, axis=(1, 2))  # global average pool
        return _MLPHead(512, self.num_classes, name="head")(
            x, return_feature)


def build_discriminator(name: str, num_domains: int, in_channels: int):
    """Factory matching `models/__init__.py:138-151`."""
    if name == "feature":
        return FeatureDiscriminator(num_domains, in_channels)
    if name == "image":
        return ImageDiscriminator(num_domains)
    if name == "momentum_feature":
        return MomentumFeatureDiscriminator(num_domains, in_channels)
    raise NotImplementedError(f"{name} has not been implemented!")
