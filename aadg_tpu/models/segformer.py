"""SegFormer: Mix-Transformer (MiT) encoder + all-MLP decode head.

Capability match for the reference's SegFormer path
(`/root/reference/models/segformer.py:9-83` + vendored mmseg
`models/mmseg/models/backbones/mix_transformer.py:203-424` and
`segformer_head.py`) — the only live part of the 14k-LoC mmseg subtree
(SURVEY §2.2). Re-implemented in flax/NHWC for the MXU: attention and
Mix-FFN are batched matmuls; efficient attention uses the MiT
spatial-reduction (stride-sr conv on K/V).

Variants b0-b5 (the reference instantiates b1/b2/b3, `segformer.py:16-35`;
hyperparameters for the rest per `mix_transformer.py:374-424`).
Returns ``(seg_logits, pooled_last_stage_feature)`` — the framework's
(seg, feature) model contract.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

VARIANTS = {
    # dims, depths, heads, sr_ratios, mlp_ratio
    "mit_b0": ((32, 64, 160, 256), (2, 2, 2, 2), (1, 2, 5, 8),
               (8, 4, 2, 1), 4),
    "mit_b1": ((64, 128, 320, 512), (2, 2, 2, 2), (1, 2, 5, 8),
               (8, 4, 2, 1), 4),
    "mit_b2": ((64, 128, 320, 512), (3, 4, 6, 3), (1, 2, 5, 8),
               (8, 4, 2, 1), 4),
    "mit_b3": ((64, 128, 320, 512), (3, 4, 18, 3), (1, 2, 5, 8),
               (8, 4, 2, 1), 4),
    "mit_b4": ((64, 128, 320, 512), (3, 8, 27, 3), (1, 2, 5, 8),
               (8, 4, 2, 1), 4),
    "mit_b5": ((64, 128, 320, 512), (3, 6, 40, 3), (1, 2, 5, 8),
               (8, 4, 2, 1), 4),
}


class OverlapPatchEmbed(nn.Module):
    dim: int
    patch: int
    stride: int

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.dim, (self.patch, self.patch),
                    strides=(self.stride, self.stride),
                    padding=self.patch // 2)(x)
        b, h, w, c = x.shape
        # named "norm" (`mix_transformer.py` OverlapPatchEmbed.norm) so the
        # SegFormer recipe's paramwise_cfg custom_keys={'norm': ...}
        # substring match exempts it from weight decay, as mmcv does
        x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        return x, h, w


class EfficientAttention(nn.Module):
    dim: int
    heads: int
    sr_ratio: int

    @nn.compact
    def __call__(self, x, h, w):
        b, n, c = x.shape
        head_dim = c // self.heads
        q = nn.Dense(c, name="q")(x).reshape(b, n, self.heads, head_dim)
        if self.sr_ratio > 1:
            xs = x.reshape(b, h, w, c)
            xs = nn.Conv(c, (self.sr_ratio, self.sr_ratio),
                         strides=(self.sr_ratio, self.sr_ratio),
                         name="sr")(xs)
            xs = xs.reshape(b, -1, c)
            xs = nn.LayerNorm(epsilon=1e-6, name="sr_norm")(xs)
        else:
            xs = x
        kv = nn.Dense(2 * c, name="kv")(xs)
        k, v = jnp.split(kv.reshape(b, -1, 2, self.heads, head_dim), 2,
                         axis=2)
        k = k[:, :, 0]
        v = v[:, :, 0]
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) / jnp.sqrt(
            jnp.float32(head_dim)).astype(x.dtype)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, n, c)
        return nn.Dense(c, name="proj")(out)


class MixFFN(nn.Module):
    dim: int
    mlp_ratio: int

    @nn.compact
    def __call__(self, x, h, w):
        b, n, c = x.shape
        hidden = self.dim * self.mlp_ratio
        x = nn.Dense(hidden, name="fc1")(x)
        # depthwise 3x3 conv injects positional information (Mix-FFN)
        xs = x.reshape(b, h, w, hidden)
        xs = nn.Conv(hidden, (3, 3), padding=1,
                     feature_group_count=hidden, name="dwconv")(xs)
        x = xs.reshape(b, n, hidden)
        # official MiT uses nn.GELU() (exact erf form), not the tanh approx
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.dim, name="fc2")(x)


class DropPath(nn.Module):
    """Stochastic depth (timm ``DropPath``, `mix_transformer.py:130-131`):
    drops the whole residual branch per sample, rescaling survivors by
    1/keep. Parameter-free (adding it never changes checkpoint naming);
    identity when rate == 0 or at eval."""
    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(self.make_rng("dropout"), keep, shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


class Block(nn.Module):
    dim: int
    heads: int
    sr_ratio: int
    mlp_ratio: int
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x, h, w, train: bool = True):
        det = not train
        x = x + DropPath(self.drop_path, name="dp1")(
            EfficientAttention(self.dim, self.heads, self.sr_ratio,
                               name="attn")(
                nn.LayerNorm(epsilon=1e-6, name="norm1")(x), h, w), det)
        x = x + DropPath(self.drop_path, name="dp2")(
            MixFFN(self.dim, self.mlp_ratio, name="ffn")(
                nn.LayerNorm(epsilon=1e-6, name="norm2")(x), h, w), det)
        return x


class MixTransformer(nn.Module):
    variant: str = "mit_b1"
    # official SegFormer trains MiT with stochastic depth 0.1, linearly
    # ramped over block depth (`mix_transformer.py:223-227` decay rule)
    drop_path_rate: float = 0.0
    # per-block activation checkpointing (TPU.REMAT): only block-boundary
    # activations survive the fwd/bwd cut; each block's attention maps and
    # Mix-FFN expansions recompute inside its own backward. Numerics and
    # the param tree are identical (explicit block names). The lever's real
    # case is b4/b5 x 512² training (27-40 blocks of stage-3 activations).
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        dims, depths, heads, srs, mlp_ratio = VARIANTS[self.variant]
        total = sum(depths)
        dpr = [self.drop_path_rate * k / max(total - 1, 1)
               for k in range(total)]
        # static_argnums: 0 is the module instance in linen's lifted
        # remat; 2,3 are the python-int h,w; 4 the `train` bool
        block_cls = (nn.remat(Block, static_argnums=(2, 3, 4))
                     if self.remat else Block)
        cur = 0
        feats = []
        for i in range(4):
            patch, stride = (7, 4) if i == 0 else (3, 2)
            x, h, w = OverlapPatchEmbed(dims[i], patch, stride,
                                        name=f"patch_embed{i + 1}")(x)
            b = x.shape[0]
            x = x.reshape(b, h * w, dims[i])
            for j in range(depths[i]):
                x = block_cls(dims[i], heads[i], srs[i], mlp_ratio,
                              drop_path=dpr[cur + j],
                              name=f"block{i + 1}_{j}")(x, h, w, train)
            cur += depths[i]
            x = nn.LayerNorm(epsilon=1e-6, name=f"norm{i + 1}")(x)
            x = x.reshape(b, h, w, dims[i])
            feats.append(x)
        return feats


class SegFormerHead(nn.Module):
    """All-MLP decode head: per-stage linear -> upsample to 1/4 -> concat
    -> 1x1 fuse -> dropout -> classifier (`segformer_head.py:64-87`;
    the dropout is BaseDecodeHead's, ratio 0.1 in the configs)."""
    num_classes: int
    embed_dim: int = 256
    dropout_ratio: float = 0.1
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, feats, train: bool = True):
        target_h, target_w = feats[0].shape[1], feats[0].shape[2]
        ups = []
        for i, f in enumerate(feats):
            f = nn.Dense(self.embed_dim, name=f"linear_c{i + 1}")(f)
            if f.shape[1] != target_h:
                f = jax.image.resize(
                    f, (f.shape[0], target_h, target_w, self.embed_dim),
                    method="bilinear")
            ups.append(f)
        x = jnp.concatenate(ups[::-1], axis=-1)
        x = nn.Conv(self.embed_dim, (1, 1), use_bias=False,
                    name="linear_fuse")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, axis_name=self.axis_name)(x)
        x = nn.relu(x)
        if self.dropout_ratio > 0:
            x = nn.Dropout(self.dropout_ratio)(x, deterministic=not train)
        return nn.Conv(self.num_classes, (1, 1), name="linear_pred")(x)


class SegFormer(nn.Module):
    num_classes: int
    variant: str = "mit_b1"
    axis_name: Optional[str] = None
    drop_path_rate: float = 0.0
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        in_h, in_w = x.shape[1], x.shape[2]
        feats = MixTransformer(self.variant, self.drop_path_rate,
                               remat=self.remat, name="backbone")(x, train)
        logits = SegFormerHead(self.num_classes, axis_name=self.axis_name,
                               name="head")(feats, train)
        # x4 bilinear upsample to input resolution (`segformer.py:77-80`)
        logits = jax.image.resize(
            logits, (logits.shape[0], in_h, in_w, self.num_classes),
            method="bilinear")
        feature = jnp.mean(feats[-1], axis=(1, 2))
        return logits, feature

    @property
    def feature_dim(self) -> int:
        return VARIANTS[self.variant][0][-1]
