"""Custom DeepLabV3+ with domain-code encoder and EMA centroid memory.

Capability match for the reference's in-repo DeepLab
(`/root/reference/models/deeplab.py:9-295`, dead on the active path but part
of the capability surface, SURVEY §2.2): backbone (ResNet-50/101 here;
Xception/DRN deferred) -> ASPP with rates (1, 6, 12, 18) @ os16 -> decoder
that concatenates a 48ch low-level projection into a 304ch feature ->
classifier; plus
- ``EncoderDC`` (`deeplab.py:34-70`): global-max-pool + BN + ReLU + 1x1
  conv on the ASPP output -> domain-code logits;
- per-domain EMA centroid memory (`deeplab.py:226,240-245`): non-trainable
  centroids updated with the spatially-pooled decoder features of each
  domain's samples. The reference stores (D, 304, 64, 64) tensors updated
  with spatially constant values; here centroids are (D, 304) — same
  information, 4096x less memory (documented divergence).

Functional design: the module returns (seg_logits, domain_logits,
pooled_304_feature); the EMA update is the pure ``update_centroids``.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .mobilenetv2 import MobileNetV2Encoder
from .resnet_backbone import ResNetEncoder


class _ASPPBranch(nn.Module):
    features: int
    kernel: int
    dilation: int
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        pad = 0 if self.kernel == 1 else self.dilation
        x = nn.Conv(self.features, (self.kernel,) * 2, padding=pad,
                    kernel_dilation=(self.dilation,) * 2, use_bias=False,
                    dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, axis_name=self.axis_name)(x)
        return nn.relu(x)


class FullASPP(nn.Module):
    """Reference ASPP (`deeplab.py:101-144`): full (non-separable) atrous
    convs at rates (1, 6, 12, 18) for os16, + global pooling branch,
    1x1 fuse to 256."""
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32
    output_stride: int = 16

    @nn.compact
    def __call__(self, x, train: bool = True):
        rates = (1, 6, 12, 18) if self.output_stride == 16 else (
            1, 12, 24, 36)
        branches = [_ASPPBranch(256, 1, rates[0], self.axis_name,
                                self.dtype)(x, train)]
        for r in rates[1:]:
            branches.append(_ASPPBranch(256, 3, r, self.axis_name,
                                        self.dtype)(x, train))
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        pooled = _ASPPBranch(256, 1, 1, self.axis_name,
                             self.dtype)(pooled, train)
        pooled = jnp.broadcast_to(
            pooled, (x.shape[0], x.shape[1], x.shape[2], 256))
        branches.append(pooled)
        y = jnp.concatenate(branches, axis=-1)
        y = nn.Conv(256, (1, 1), use_bias=False, dtype=self.dtype)(y)
        feature = y
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, axis_name=self.axis_name)(y)
        return nn.relu(y), feature


class EncoderDC(nn.Module):
    """Domain-code encoder (`deeplab.py:34-70`): global max pool + BN +
    ReLU + 1x1 classifier."""
    num_domain: int
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = jnp.max(x, axis=(1, 2), keepdims=True)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, axis_name=self.axis_name)(x)
        x = nn.relu(x)
        x = nn.Conv(self.num_domain, (1, 1))(x)
        return x[:, 0, 0, :]


class CustomDeepLab(nn.Module):
    """Returns (seg_logits_fullres, domain_logits, pooled_304_feature)."""
    num_classes: int
    backbone: str = "resnet101"
    num_domain: int = 3
    output_stride: int = 16
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        an = self.axis_name
        output_stride = self.output_stride
        if self.backbone in ("resnet50", "resnet101"):
            enc = ResNetEncoder(depth=int(self.backbone[6:]),
                                output_stride=output_stride,
                                axis_name=an, dtype=self.dtype,
                                name="backbone")
        elif self.backbone == "mobilenet_v2":
            enc = MobileNetV2Encoder(output_stride=output_stride,
                                     axis_name=an, dtype=self.dtype,
                                     name="backbone")
        elif self.backbone == "xception":
            from .xception import AlignedXception
            enc = AlignedXception(output_stride=output_stride,
                                  axis_name=an, dtype=self.dtype,
                                  name="backbone")
        elif self.backbone == "drn":
            from .drn import DRN_D_54
            # DRN is inherently output-stride 8 (`deeplab.py:218-219`)
            output_stride = 8
            enc = DRN_D_54(axis_name=an, dtype=self.dtype,
                           name="backbone")
        else:
            raise NotImplementedError(self.backbone)
        low, high = enc(x, train)

        y, aspp_feature = FullASPP(axis_name=an, dtype=self.dtype,
                                   output_stride=output_stride,
                                   name="aspp")(high, train)
        domain_logits = EncoderDC(self.num_domain, axis_name=an,
                                  name="encoder_d")(y, train)

        # decoder (`deeplab.py:160-200`): 48ch low-level projection,
        # upsample ASPP feature, concat -> 304ch, BN, then classifier
        low_proj = nn.Conv(48, (1, 1), use_bias=False,
                           dtype=self.dtype, name="low_proj")(low)
        up = jax.image.resize(
            aspp_feature.astype(jnp.float32),
            (aspp_feature.shape[0], low.shape[1], low.shape[2],
             aspp_feature.shape[3]), method="bilinear")
        feature = jnp.concatenate(
            [up, low_proj.astype(jnp.float32)], axis=-1)  # 304ch
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, axis_name=an, name="feat_bn")(
            feature)
        y = y.astype(self.dtype)
        for ch in (256, 256):
            y = nn.Conv(ch, (3, 3), padding=1, use_bias=False,
                        dtype=self.dtype)(y)
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, axis_name=an)(y)
            y = nn.relu(y)
        logits = nn.Conv(self.num_classes, (1, 1),
                         name="classifier")(y.astype(jnp.float32))
        logits = jax.image.resize(
            logits, (logits.shape[0], x.shape[1], x.shape[2],
                     self.num_classes), method="bilinear")

        pooled = jnp.mean(feature, axis=(1, 2))  # (B, 304)
        return logits.astype(jnp.float32), domain_logits, pooled

    @property
    def feature_dim(self) -> int:
        return 304


def init_centroids(key: jax.Array, num_domain: int = 3,
                   feature_dim: int = 304) -> jnp.ndarray:
    """Random-normal init like the reference's nn.Parameter
    (`deeplab.py:226`), spatially pooled."""
    return jax.random.normal(key, (num_domain, feature_dim))


def update_centroids(centroids: jnp.ndarray, pooled_features: jnp.ndarray,
                     domain_ids: jnp.ndarray, lam: float = 0.9
                     ) -> jnp.ndarray:
    """EMA centroid update (`deeplab.py:240-245`): for each domain d,
    centroid_d <- lam * centroid_d + (1-lam) * mean(features of d).

    pooled_features: (B, F); domain_ids: (B,) int. Pure function."""
    d = centroids.shape[0]
    onehot = jax.nn.one_hot(domain_ids, d)                    # (B, D)
    counts = jnp.maximum(jnp.sum(onehot, axis=0), 1.0)        # (D,)
    means = (onehot.T @ pooled_features) / counts[:, None]    # (D, F)
    has = (jnp.sum(onehot, axis=0) > 0)[:, None]
    updated = lam * centroids + (1.0 - lam) * means
    return jnp.where(has, updated, centroids)
