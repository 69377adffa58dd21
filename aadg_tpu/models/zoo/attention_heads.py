"""Decode heads, batch 2: attention/context family.

Flax/NHWC re-designs of the reference's vendored mmseg attention heads
(`/root/reference/models/mmseg/models/decode_heads/`): non-local
(`nl_head.py`), global-context (`gc_head.py`), disentangled non-local
(`dnl_head.py`), criss-cross (`cc_head.py`), asymmetric non-local
(`ann_head.py`), adaptive pyramid context (`apc_head.py`), dynamic
multi-scale filters (`dm_head.py`), expectation-maximization attention
(`ema_head.py`), dual attention (`da_head.py`), point-wise spatial
attention (`psa_head.py`), context encoding (`enc_head.py`) and
object-contextual representations (`ocr_head.py`, a cascade head).

TPU-first notes: every attention is expressed as batched einsum/matmul
(MXU work, no custom CUDA ops). The reference's CUDA kernels map as
follows — PSAMask (`psa_head.py`) becomes a dense (HW x HW) attention
matmul over the full feature map (the "compact" global form); criss-cross
attention (`cc_head.py`, CUDA in mmcv) becomes two row/column einsums
with a joint softmax; EMA's distributed `reduce_mean` base update
(`ema_head.py:13-20`) becomes `lax.pmean` over the data axis, the same
collective the framework's cross-replica BatchNorm uses.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .heads import ClsSeg
from .layers import (ConvModule, adaptive_avg_pool, bilinear_resize, resize,
                     transform_inputs)


# ---------------------------------------------------------------------------
# Shared self-attention block (mmseg ``models/utils/self_attention_block.py``)
# ---------------------------------------------------------------------------

class SelfAttentionBlock(nn.Module):
    """mmseg ``models/utils/self_attention_block.py``: query/key/value
    projected attention with optional key/value pyramid sampling (ANN's
    PPMConcat key_downsample). Faithful to the reference parameterization:

    - ``*_norm=True`` projections are ConvModules — conv+BN+ReLU on EVERY
      conv, the act applies to the last conv too
      (`self_attention_block.py:103-126`); ``*_norm=False`` projections
      are plain biased 1x1 convs;
    - a plain-conv ``out_project`` is ZERO-initialized
      (`self_attention_block.py:94-98` ``constant_init``) so residual
      consumers (ANN) start at identity;
    - ``with_out=True``: value projects to ``channels`` and
      ``out_project`` maps to ``out_channels``; ``with_out=False``: value
      projects straight to ``out_channels`` and there is no out projection
      (DANet's PAM);
    - ``share_key_query``: the query reuses the key projection's params
      (ANN's APNB).
    """
    channels: int              # key/query channels
    out_channels: int
    share_key_query: bool = False
    key_query_num_convs: int = 2
    value_out_num_convs: int = 1
    key_query_norm: bool = True
    value_out_norm: bool = True
    matmul_norm: bool = True
    with_out: bool = True
    key_pool_scales: Optional[Tuple[int, ...]] = None  # ANN pyramid sampling
    axis_name: Optional[str] = None

    def _make_project(self, features, num_convs, use_conv_module, name,
                      zero_init=False):
        mods = []
        for i in range(num_convs):
            if use_conv_module:
                mods.append(ConvModule(features, 1,
                                       axis_name=self.axis_name,
                                       name=f"{name}_{i}"))
            else:
                kinit = (nn.initializers.zeros if zero_init
                         else nn.initializers.lecun_normal())
                mods.append(nn.Conv(features, (1, 1), kernel_init=kinit,
                                    name=f"{name}_{i}"))
        return mods

    @staticmethod
    def _apply(mods, x, train):
        for m in mods:
            x = m(x, train) if isinstance(m, ConvModule) else m(x)
        return x

    def _pyramid(self, x):
        """Key/value pyramid sampling (`ann_head.py` PPMConcat): adaptive
        pools flattened and concatenated along the token axis."""
        if self.key_pool_scales is None:
            return x.reshape(x.shape[0], -1, x.shape[-1])
        toks = []
        for s in self.key_pool_scales:
            p = adaptive_avg_pool(x, s)
            toks.append(p.reshape(p.shape[0], -1, p.shape[-1]))
        return jnp.concatenate(toks, axis=1)

    @nn.compact
    def __call__(self, query_feats, key_feats, train: bool = True):
        b, h, w, _ = query_feats.shape
        key_mods = self._make_project(
            self.channels, self.key_query_num_convs, self.key_query_norm,
            "key_project")
        query_mods = key_mods if self.share_key_query else \
            self._make_project(self.channels, self.key_query_num_convs,
                               self.key_query_norm, "query_project")
        value_mods = self._make_project(
            self.channels if self.with_out else self.out_channels,
            self.value_out_num_convs, self.value_out_norm, "value_project")
        q = self._apply(query_mods, query_feats, train)
        k = self._apply(key_mods, key_feats, train)
        v = self._apply(value_mods, key_feats, train)
        q = q.reshape(b, h * w, self.channels)
        k = self._pyramid(k)
        v = self._pyramid(v)
        sim = jnp.einsum("bqc,bkc->bqk", q, k)
        if self.matmul_norm:
            sim = sim * (self.channels ** -0.5)
        attn = jax.nn.softmax(sim, axis=-1)
        ctx = jnp.einsum("bqk,bkc->bqc", attn, v)
        ctx = ctx.reshape(b, h, w, -1)
        if self.with_out:
            out_mods = self._make_project(
                self.out_channels, self.value_out_num_convs,
                self.value_out_norm, "out_project", zero_init=True)
            ctx = self._apply(out_mods, ctx, train)
        return ctx


# ---------------------------------------------------------------------------
# FCN-with-context-block family: NL / GC / DNL / CC
# ---------------------------------------------------------------------------

class _FCNContextHead(nn.Module):
    """Shared skeleton of NL/GC/DNL/CC heads (each is an FCNHead with a
    context block between the two 3x3 convs, `nl_head.py:10-49`)."""
    num_classes: int
    channels: int = 256
    in_index: Any = -1
    input_transform: Optional[str] = None
    dropout_ratio: float = 0.1
    concat_input: bool = True
    axis_name: Optional[str] = None

    def context_block(self, x, train):  # pragma: no cover - abstract
        raise NotImplementedError

    @nn.compact
    def __call__(self, inputs, train: bool = True):
        x = transform_inputs(inputs, self.in_index, self.input_transform)
        y = ConvModule(self.channels, 3, axis_name=self.axis_name,
                       name="convs_0")(x, train)
        y = self.context_block(y, train)
        y = ConvModule(self.channels, 3, axis_name=self.axis_name,
                       name="convs_1")(y, train)
        if self.concat_input:
            y = ConvModule(self.channels, 3, axis_name=self.axis_name,
                           name="conv_cat")(
                jnp.concatenate([x, y], axis=-1), train)
        return ClsSeg(self.num_classes, self.dropout_ratio,
                      name="cls")(y, train)


class NLHead(_FCNContextHead):
    """`nl_head.py`: embedded-gaussian NonLocal2d (reduction 2)."""
    reduction: int = 2
    use_scale: bool = True

    def context_block(self, x, train):
        c = self.channels
        inter = max(c // self.reduction, 1)
        b, h, w, _ = x.shape
        theta = nn.Conv(inter, (1, 1), name="theta")(x).reshape(b, -1, inter)
        phi = nn.Conv(inter, (1, 1), name="phi")(x).reshape(b, -1, inter)
        g = nn.Conv(inter, (1, 1), name="g")(x).reshape(b, -1, inter)
        sim = jnp.einsum("bqc,bkc->bqk", theta, phi)
        if self.use_scale:
            sim = sim * (inter ** -0.5)
        y = jnp.einsum("bqk,bkc->bqc", jax.nn.softmax(sim, -1), g)
        y = y.reshape(b, h, w, inter)
        y = ConvModule(c, 1, act=None, axis_name=self.axis_name,
                       name="conv_out")(y, train)
        return x + y


class GCHead(_FCNContextHead):
    """`gc_head.py`: GCNet ContextBlock — attention-pooled global context
    passed through a channel-add bottleneck (ratio 1/4)."""
    ratio: float = 0.25

    def context_block(self, x, train):
        b, h, w, c = x.shape
        mask = nn.Conv(1, (1, 1), name="conv_mask")(x).reshape(b, -1)
        mask = jax.nn.softmax(mask, axis=-1)
        ctx = jnp.einsum("bn,bnc->bc", mask, x.reshape(b, -1, c))
        ctx = ctx[:, None, None, :]
        t = nn.Conv(int(c * self.ratio), (1, 1), name="channel_add_0")(ctx)
        # torch nn.LayerNorm eps (mmcv ContextBlock uses the default 1e-5)
        t = nn.LayerNorm(epsilon=1e-5, name="channel_add_ln")(t)
        t = nn.relu(t)
        t = nn.Conv(c, (1, 1), name="channel_add_1")(t)
        return x + t


class DNLHead(_FCNContextHead):
    """`dnl_head.py`: disentangled non-local — whitened (mean-subtracted)
    pairwise term plus a unary term, each attending over value g."""
    reduction: int = 2
    temperature: float = 0.05

    def context_block(self, x, train):
        c = self.channels
        inter = max(c // self.reduction, 1)
        b, h, w, _ = x.shape
        theta = nn.Conv(inter, (1, 1), name="theta")(x).reshape(b, -1, inter)
        phi = nn.Conv(inter, (1, 1), name="phi")(x).reshape(b, -1, inter)
        g = nn.Conv(inter, (1, 1), name="g")(x).reshape(b, -1, inter)
        theta = theta - jnp.mean(theta, axis=1, keepdims=True)
        phi = phi - jnp.mean(phi, axis=1, keepdims=True)
        sim = jnp.einsum("bqc,bkc->bqk", theta, phi) * (inter ** -0.5)
        pairwise = jax.nn.softmax(sim / self.temperature, -1)
        y = jnp.einsum("bqk,bkc->bqc", pairwise, g)
        unary = nn.Conv(1, (1, 1), name="conv_mask")(x).reshape(b, -1)
        unary = jax.nn.softmax(unary, -1)
        y_unary = jnp.einsum("bk,bkc->bc", unary, g)[:, None, :]
        y = (y + y_unary).reshape(b, h, w, inter)
        y = ConvModule(c, 1, act=None, axis_name=self.axis_name,
                       name="conv_out")(y, train)
        return x + y


class CrissCrossAttention(nn.Module):
    """`cc_head.py` (CCNet): each position attends over its row and column;
    the mmcv CUDA kernel becomes two einsums with a joint softmax."""
    channels: int

    @nn.compact
    def __call__(self, x):
        inter = max(self.channels // 8, 1)
        q = nn.Conv(inter, (1, 1), name="query")(x)
        k = nn.Conv(inter, (1, 1), name="key")(x)
        v = nn.Conv(self.channels, (1, 1), name="value")(x)
        b, h, w, _ = x.shape
        # column (same w, varying h) and row (same h, varying w) energies
        e_col = jnp.einsum("bhwc,bHwc->bhwH", q, k)
        # mask the duplicated self position out of the column term
        eye = jnp.eye(h, dtype=x.dtype)[None, :, None, :]
        e_col = e_col - 1e9 * eye
        e_row = jnp.einsum("bhwc,bhWc->bhwW", q, k)
        attn = jax.nn.softmax(jnp.concatenate([e_col, e_row], -1), -1)
        a_col, a_row = attn[..., :h], attn[..., h:]
        out = (jnp.einsum("bhwH,bHwc->bhwc", a_col, v)
               + jnp.einsum("bhwW,bhWc->bhwc", a_row, v))
        gamma = self.param("gamma", nn.initializers.zeros, ())
        return x + gamma * out


class CCHead(_FCNContextHead):
    """`cc_head.py`: FCN head with 2 recurrent criss-cross steps."""
    recurrence: int = 2

    def context_block(self, x, train):
        cca = CrissCrossAttention(self.channels, name="cca")
        for _ in range(self.recurrence):
            x = cca(x)
        return x


# ---------------------------------------------------------------------------
# ANN / APC / DM / EMA
# ---------------------------------------------------------------------------

class ANNHead(nn.Module):
    """`ann_head.py` (ANN): AFNB fuses low- (c3) and high-level (c4)
    features with pyramid-sampled keys, then a bottleneck and APNB
    self-attention. Faithful structure: AFNB/APNB are concat+1x1-bottleneck
    blocks (`ann_head.py:125-131,176-181` — NOT residual adds), APNB shares
    the key/query projection (`ann_head.py:161` share_key_query=True), both
    use plain-conv value and ZERO-initialized plain-conv out projections
    (`ann_head.py:70-73` value_out_norm=False +
    `self_attention_block.py:94-98`), and the head applies its dropout
    between AFNB and the bottleneck too (`ann_head.py:240`)."""
    num_classes: int
    channels: int = 512
    project_channels: int = 256
    query_scales: Tuple[int, ...] = (1,)
    key_pool_scales: Tuple[int, ...] = (1, 3, 6, 8)
    in_index: Tuple[int, ...] = (2, 3)
    dropout_ratio: float = 0.1
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, inputs, train: bool = True):
        low, high = [inputs[i] for i in self.in_index]
        # query_scale > 1 is broken in the reference (the context reshape
        # assumes the un-downsampled query grid,
        # self_attention_block.py:157-159); configs only use (1,).
        assert all(s == 1 for s in self.query_scales), self.query_scales
        # AFNB: query from high, key/value pyramid from low.
        priors = [SelfAttentionBlock(
            self.project_channels, high.shape[-1], key_query_num_convs=1,
            value_out_norm=False, key_pool_scales=self.key_pool_scales,
            axis_name=self.axis_name, name=f"afnb_{i}")(high, low, train)
            for i in range(len(self.query_scales))]
        fused = ConvModule(high.shape[-1], 1, act=None,
                           axis_name=self.axis_name,
                           name="afnb_bottleneck")(
            jnp.concatenate([sum(priors), high], -1), train)
        if self.dropout_ratio > 0:
            fused = nn.Dropout(self.dropout_ratio)(
                fused, deterministic=not train)
        x = ConvModule(self.channels, 3, axis_name=self.axis_name,
                       name="bottleneck")(fused, train)
        # APNB: shared-key/query self-attention with pyramid keys.
        priors = [SelfAttentionBlock(
            self.project_channels, self.channels, share_key_query=True,
            key_query_num_convs=1, value_out_norm=False,
            key_pool_scales=self.key_pool_scales,
            axis_name=self.axis_name, name=f"apnb_{i}")(x, x, train)
            for i in range(len(self.query_scales))]
        x = ConvModule(self.channels, 1, axis_name=self.axis_name,
                       name="apnb_bottleneck")(
            jnp.concatenate([sum(priors), x], -1), train)
        return ClsSeg(self.num_classes, self.dropout_ratio,
                      name="cls")(x, train)


class ACM(nn.Module):
    """`apc_head.py:12-107` Adaptive Context Module."""
    pool_scale: int
    channels: int
    fusion: bool = True
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        b, h, w, _ = x.shape
        pooled = adaptive_avg_pool(x, self.pool_scale)
        pooled = ConvModule(self.channels, 1, axis_name=self.axis_name,
                            name="pooled_redu_conv")(pooled, train)
        x = ConvModule(self.channels, 1, axis_name=self.axis_name,
                       name="input_redu_conv")(x, train)
        gi = ConvModule(self.channels, 1, axis_name=self.axis_name,
                        name="global_info")(
            adaptive_avg_pool(x, 1), train)
        affinity = nn.Conv(self.pool_scale ** 2, (1, 1), name="gla")(
            x + resize(gi, (h, w)))
        affinity = nn.sigmoid(affinity.reshape(b, h * w, -1))
        pooled = pooled.reshape(b, -1, self.channels)
        z = jnp.einsum("bns,bsc->bnc", affinity, pooled)
        z = ConvModule(self.channels, 1, axis_name=self.axis_name,
                       name="residual_conv")(
            z.reshape(b, h, w, self.channels), train)
        z = nn.relu(z + x)
        if self.fusion:
            z = ConvModule(self.channels, 1, axis_name=self.axis_name,
                           name="fusion_conv")(z, train)
        return z


class APCHead(nn.Module):
    """`apc_head.py:110-158`: pyramid of ACMs + 3x3 bottleneck."""
    num_classes: int
    channels: int = 512
    pool_scales: Tuple[int, ...] = (1, 2, 3, 6)
    fusion: bool = True
    in_index: Any = -1
    input_transform: Optional[str] = None
    dropout_ratio: float = 0.1
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, inputs, train: bool = True):
        x = transform_inputs(inputs, self.in_index, self.input_transform)
        outs = [x] + [ACM(s, self.channels, self.fusion,
                          axis_name=self.axis_name, name=f"acm_{s}")(
            x, train) for s in self.pool_scales]
        feats = ConvModule(self.channels, 3, axis_name=self.axis_name,
                           name="bottleneck")(
            jnp.concatenate(outs, axis=-1), train)
        return ClsSeg(self.num_classes, self.dropout_ratio,
                      name="cls")(feats, train)


class DCM(nn.Module):
    """`dm_head.py:11-89` Dynamic Convolutional Module: a per-sample
    depthwise filter generated by adaptive pooling. The reference's
    grouped-conv trick becomes k*k shifted multiply-adds (static, fusable)."""
    filter_size: int
    channels: int
    fusion: bool = True
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        k = self.filter_size
        filt = nn.Conv(self.channels, (1, 1), name="filter_gen_conv")(
            adaptive_avg_pool(x, k))  # (b, k, k, C)
        x = ConvModule(self.channels, 1, axis_name=self.axis_name,
                       name="input_redu_conv")(x, train)
        b, h, w, c = x.shape
        pad = (k - 1) // 2
        lo, hi = (pad, pad) if (k - 1) % 2 == 0 else (pad + 1, pad)
        xp = jnp.pad(x, ((0, 0), (lo, hi), (lo, hi), (0, 0)))
        out = jnp.zeros_like(x)
        for i in range(k):
            for j in range(k):
                out = out + xp[:, i:i + h, j:j + w, :] * filt[:, i:i + 1,
                                                              j:j + 1, :]
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, axis_name=self.axis_name,
                           dtype=out.dtype, name="norm")(out)
        out = nn.relu(out)
        if self.fusion:
            out = ConvModule(self.channels, 1, axis_name=self.axis_name,
                             name="fusion_conv")(out, train)
        return out


class DMHead(nn.Module):
    """`dm_head.py:92-140`: pyramid of DCMs (filters 1,3,5,7) + 3x3
    bottleneck. ``fusion=False`` is the reference default
    (`dm_head.py:106`; the mmseg dmnet configs don't override it)."""
    num_classes: int
    channels: int = 512
    filter_sizes: Tuple[int, ...] = (1, 3, 5, 7)
    fusion: bool = False
    in_index: Any = -1
    input_transform: Optional[str] = None
    dropout_ratio: float = 0.1
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, inputs, train: bool = True):
        x = transform_inputs(inputs, self.in_index, self.input_transform)
        outs = [x] + [DCM(k, self.channels, self.fusion,
                          axis_name=self.axis_name, name=f"dcm_{k}")(
            x, train) for k in self.filter_sizes]
        feats = ConvModule(self.channels, 3, axis_name=self.axis_name,
                           name="bottleneck")(
            jnp.concatenate(outs, axis=-1), train)
        return ClsSeg(self.num_classes, self.dropout_ratio,
                      name="cls")(feats, train)


class EMAHead(nn.Module):
    """`ema_head.py`: expectation-maximization attention. Bases live in the
    ``batch_stats`` collection; the training-time momentum update uses
    `lax.pmean` over the data axis where the reference all-reduces
    (`ema_head.py:13-20`).

    Numeric fidelity (`ema_head.py:44-76,154-169`):

    - The whole EM module is non-differentiable w.r.t. its input — the EM
      loop AND the final attention run under ``torch.no_grad()``, and the
      reconstruction reuses the attention from the TOP of the last EM
      iteration (pre-final-base-update), so we ``stop_gradient`` both and
      never recompute attention outside it. This also reproduces the
      reference's frozen ``ema_mid_conv`` (`ema_head.py:126-127`): with the
      recon fully detached, the mid conv's only consumer carries no
      gradient, so its params receive exactly zero grad — no optimizer
      masking needed.
    - The momentum update L2-renormalizes the cross-replica-meaned bases
      BEFORE the EMA blend (`ema_head.py:68-73`) so stored bases stay on
      the unit sphere.
    - ``concat_input=True`` (the mmseg EMANet config default) appends the
      reference's ``conv_cat`` over ``[x, bottleneck_out]``
      (`ema_head.py:144-152,165-166`).
    """
    num_classes: int
    channels: int = 512
    ema_channels: int = 256
    num_bases: int = 64
    num_stages: int = 3
    momentum: float = 0.1
    concat_input: bool = True
    in_index: Any = -1
    input_transform: Optional[str] = None
    dropout_ratio: float = 0.1
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, inputs, train: bool = True):
        x = transform_inputs(inputs, self.in_index, self.input_transform)
        feats = ConvModule(self.ema_channels, 3, axis_name=self.axis_name,
                           name="ema_in_conv")(x, train)
        identity = feats
        feats = nn.Conv(self.ema_channels, (1, 1), name="ema_mid_conv")(
            feats)
        b, h, w, c = feats.shape
        flat = feats.reshape(b, h * w, c)
        bases_var = self.variable(
            "batch_stats", "bases",
            lambda: _normalized_bases(self.make_rng("params")
                                      if self.has_rng("params") else
                                      jax.random.PRNGKey(0),
                                      c, self.num_bases))
        bases = jnp.broadcast_to(bases_var.value, (b, c, self.num_bases))
        # EM iterations run without gradient (`ema_head.py:52-63`); the
        # returned attention is the one computed at the TOP of the final
        # iteration — the reference's loop leaves `attention` holding that
        # value when it computes the reconstruction (`ema_head.py:65`).
        def em(bases):
            attn = None
            for _ in range(self.num_stages):
                attn = jax.nn.softmax(
                    jnp.einsum("bnc,bck->bnk", flat, bases), axis=2)
                attn_normed = attn / jnp.maximum(
                    jnp.sum(attn, axis=1, keepdims=True), 1e-12)
                bases = jnp.einsum("bnc,bnk->bck", flat, attn_normed)
                bases = bases / jnp.maximum(
                    jnp.linalg.norm(bases, axis=1, keepdims=True), 1e-12)
            return bases, attn
        bases, attn = jax.lax.stop_gradient(em(bases))
        recon = jnp.einsum("bnk,bck->bnc", attn, bases)
        if train and not self.is_initializing():
            mean_bases = jnp.mean(bases, axis=0)
            if self.axis_name is not None:
                mean_bases = jax.lax.pmean(mean_bases, self.axis_name)
            # l2-renormalize the reduced mean BEFORE the EMA blend
            # (`ema_head.py:71-72`) — keeps the stored bases on the unit
            # sphere instead of drifting toward shorter vectors
            mean_bases = mean_bases / jnp.maximum(
                jnp.linalg.norm(mean_bases, axis=0, keepdims=True), 1e-12)
            bases_var.value = ((1 - self.momentum) * bases_var.value
                               + self.momentum * mean_bases)
        recon = nn.relu(recon.reshape(b, h, w, c))
        recon = ConvModule(self.ema_channels, 1, act=None,
                           axis_name=self.axis_name,
                           name="ema_out_conv")(recon, train)
        feats = nn.relu(identity + recon)
        feats = ConvModule(self.channels, 3, axis_name=self.axis_name,
                           name="bottleneck")(feats, train)
        if self.concat_input:
            feats = ConvModule(self.channels, 3, axis_name=self.axis_name,
                               name="conv_cat")(
                jnp.concatenate([x, feats], axis=-1), train)
        return ClsSeg(self.num_classes, self.dropout_ratio,
                      name="cls")(feats, train)


def _normalized_bases(key, channels, num_bases):
    import math
    b = jax.random.normal(key, (channels, num_bases)) * math.sqrt(
        2.0 / num_bases)
    return b / jnp.maximum(jnp.linalg.norm(b, axis=0, keepdims=True), 1e-12)


# ---------------------------------------------------------------------------
# DA / PSA / Enc / OCR
# ---------------------------------------------------------------------------

class DAHead(nn.Module):
    """`da_head.py` (DANet): position attention + channel attention.
    ``__call__`` returns the fused logits; with ``return_aux=True`` it also
    returns the PAM-only and CAM-only logits for the reference's auxiliary
    supervision (it computes losses on all three)."""
    num_classes: int
    channels: int = 512
    pam_reduction: int = 8
    in_index: Any = -1
    input_transform: Optional[str] = None
    dropout_ratio: float = 0.1
    axis_name: Optional[str] = None

    def _branches(self, inputs, train):
        x = transform_inputs(inputs, self.in_index, self.input_transform)
        # position attention
        p = ConvModule(self.channels, 3, axis_name=self.axis_name,
                       name="pam_in_conv")(x, train)
        b, h, w, c = p.shape
        inter = max(c // self.pam_reduction, 1)
        q = nn.Conv(inter, (1, 1), name="pam_query")(p).reshape(b, -1, inter)
        k = nn.Conv(inter, (1, 1), name="pam_key")(p).reshape(b, -1, inter)
        v = nn.Conv(c, (1, 1), name="pam_value")(p).reshape(b, -1, c)
        attn = jax.nn.softmax(jnp.einsum("bqc,bkc->bqk", q, k), -1)
        gamma_p = self.param("pam_gamma", nn.initializers.zeros, ())
        pam = p + gamma_p * jnp.einsum(
            "bqk,bkc->bqc", attn, v).reshape(b, h, w, c)
        pam = ConvModule(self.channels, 3, axis_name=self.axis_name,
                         name="pam_out_conv")(pam, train)
        # channel attention
        ca = ConvModule(self.channels, 3, axis_name=self.axis_name,
                        name="cam_in_conv")(x, train)
        flat = ca.reshape(b, -1, c)
        energy = jnp.einsum("bnc,bnd->bcd", flat, flat)
        energy = jnp.max(energy, axis=-1, keepdims=True) - energy
        attn_c = jax.nn.softmax(energy, -1)
        gamma_c = self.param("cam_gamma", nn.initializers.zeros, ())
        cam = ca + gamma_c * jnp.einsum(
            "bcd,bnd->bnc", attn_c, flat).reshape(b, h, w, c)
        cam = ConvModule(self.channels, 3, axis_name=self.axis_name,
                         name="cam_out_conv")(cam, train)
        return pam, cam

    @nn.compact
    def __call__(self, inputs, train: bool = True,
                 return_aux: bool = False):
        pam, cam = self._branches(inputs, train)
        fused = ClsSeg(self.num_classes, self.dropout_ratio,
                       name="cls")(pam + cam, train)
        pam_l = ClsSeg(self.num_classes, self.dropout_ratio,
                       name="pam_cls")(pam, train)
        cam_l = ClsSeg(self.num_classes, self.dropout_ratio,
                       name="cam_cls")(cam, train)
        if return_aux:
            return fused, pam_l, cam_l
        return fused


def psa_mask_attention(logits: jnp.ndarray, mask_size: Tuple[int, int],
                       mode: str) -> jnp.ndarray:
    """mmcv ``PSAMask`` CUDA op (`psa_head.py` non-compact path) as two
    separable one-hot einsums — no gathers, pure MXU work.

    ``logits``: (b, h, w, mask_h*mask_w) per-position relative-offset maps.
    Returns the dense (b, h*w [source s], h*w [target t]) attention with the
    op's exact semantics: for ``collect``, attn[s, t] is target t's map
    evaluated at offset s - t + half; for ``distribute``, source s's map at
    offset t - s + half. Out-of-window entries are ZERO — mmcv zero-fills
    before the dim=1 softmax (exp(0)=1 contributions), a quirk we keep for
    bit-faithfulness.
    """
    b, h, w, _ = logits.shape
    mask_h, mask_w = mask_size
    half_h, half_w = (mask_h - 1) // 2, (mask_w - 1) // 2

    def onehot(n, m, half):
        # A[r, i, j] = 1 iff i - j + half == r  (static, built host-side)
        r = np.arange(m)[:, None, None]
        i = np.arange(n)[None, :, None]
        j = np.arange(n)[None, None, :]
        return jnp.asarray((i - j + half == r), dtype=logits.dtype)

    ah = onehot(h, mask_h, half_h)   # (mask_h, h, h)
    aw = onehot(w, mask_w, half_w)   # (mask_w, w, w)
    z = logits.reshape(b, h, w, mask_h, mask_w)
    if mode == "collect":
        # attn[b,(s),(t)] = z[b, th, tw, sh-th+half_h, sw-tw+half_w]
        u = jnp.einsum("pst,btupq->bstuq", ah, z)
        attn = jnp.einsum("qcu,bstuq->bsctu", aw, u)
    elif mode == "distribute":
        # attn[b,(s),(t)] = z[b, sh, sw, th-sh+half_h, tw-sw+half_w]
        u = jnp.einsum("pts,bscpq->bstcq", ah, z)
        attn = jnp.einsum("quc,bstcq->bsctu", aw, u)
    else:
        raise ValueError(mode)
    return attn.reshape(b, h * w, h * w)


class PSAHead(nn.Module):
    """`psa_head.py` (PSANet): point-wise spatial attention, faithful to
    the reference's full surface:

    - ``psa_type`` in {'collect', 'distribute', 'bi-direction'} (default
      bi-direction = both branches concatenated, `psa_head.py:147-188`);
    - ``shrink_factor``: the reduced maps are bilinear-downscaled before
      attention; when H and W are BOTH non-divisible the reference rounds
      up and flips to align_corners=True for every later resize
      (`psa_head.py:121-134` — quirk kept);
    - ``compact``: the attention conv's h*w channels are read directly as
      the (source, target) matrix — position p's channel r is the logit
      for (source p, target r), softmaxed over sources
      (`psa_head.py:136-140,173-176`; applies to the collect branch alone
      or the distribute branch of bi-direction). Non-compact scatters the
      mask_h*mask_w relative-offset channels through
      :func:`psa_mask_attention` (the mmcv PSAMask CUDA op as one-hot
      einsums);
    - the ``proj`` ConvModule is a 1x1 conv with padding=1 — the output
      grows by a 2-pixel ring before being resized back onto the identity
      grid (`psa_head.py:97-103,189-195` — reference quirk, kept);
    - out = feat · attn then /normalization_factor (None -> mask_h*mask_w,
      `psa_head.py:53-55`).
    """
    num_classes: int
    channels: int = 512
    mask_size: Tuple[int, int] = (97, 97)
    psa_type: str = "bi-direction"
    compact: bool = False
    shrink_factor: int = 2
    psa_softmax: bool = True
    normalization_factor: Optional[float] = 1.0
    in_index: Any = -1
    input_transform: Optional[str] = None
    dropout_ratio: float = 0.1
    axis_name: Optional[str] = None

    def _attend(self, y, a, dirn, compact):
        """feat y (b,h,w,c) x attention logits a -> attended feats."""
        b, h, w, c = y.shape
        if compact:
            # NHWC reshape lands directly on the reference's post-transpose
            # (position, channel) = (source, target) layout
            attn = a.reshape(b, h * w, h * w)
        else:
            attn = psa_mask_attention(a, self.mask_size, dirn)
        if self.psa_softmax:
            attn = jax.nn.softmax(attn, axis=1)  # over sources s
        norm = self.normalization_factor
        if norm is None:
            norm = float(self.mask_size[0] * self.mask_size[1])
        # out[t] = sum_s feat[s] * attn[s, t]   (psa_head.py:143-145)
        out = jnp.einsum("bst,bsc->btc", attn, y.reshape(b, h * w, c))
        return (out * (1.0 / norm)).reshape(b, h, w, c)

    @nn.compact
    def __call__(self, inputs, train: bool = True):
        assert self.psa_type in ("collect", "distribute", "bi-direction")
        x = transform_inputs(inputs, self.in_index, self.input_transform)
        identity = x
        align_corners = False
        dirns = (("collect", "distribute")
                 if self.psa_type == "bi-direction" else (self.psa_type,))
        n_attn = self.mask_size[0] * self.mask_size[1]
        reduced = []
        for dirn in dirns:
            y = ConvModule(self.channels, 1, axis_name=self.axis_name,
                           name=f"reduce_{dirn}")(x, train)
            reduced.append(y)
        b, h, w, _ = reduced[0].shape
        if self.shrink_factor != 1:
            if h % self.shrink_factor and w % self.shrink_factor:
                h = (h - 1) // self.shrink_factor + 1
                w = (w - 1) // self.shrink_factor + 1
                align_corners = True
            else:
                h = h // self.shrink_factor
                w = w // self.shrink_factor
                align_corners = False
            reduced = [bilinear_resize(y, (h, w), align_corners)
                       for y in reduced]
        outs = []
        for dirn, y in zip(dirns, reduced):
            a = ConvModule(self.channels, 1, axis_name=self.axis_name,
                           name=f"attention_{dirn}_0")(y, train)
            a = nn.Conv(n_attn, (1, 1), use_bias=False,
                        name=f"attention_{dirn}_1")(a)
            # compact applies to the single collect branch, or to the
            # distribute branch of bi-direction (psa_head.py:136-139,172-176)
            compact = self.compact and (
                dirn == ("distribute" if self.psa_type == "bi-direction"
                         else "collect"))
            if compact:
                assert n_attn == h * w, (
                    f"compact PSA needs mask_size == shrunk grid "
                    f"({self.mask_size} vs {(h, w)})")
            outs.append(self._attend(y, a, dirn, compact))
        out = jnp.concatenate(outs, -1) if len(outs) > 1 else outs[0]
        # reference proj: 1x1 ConvModule with padding=1 -> +2-pixel ring,
        # resized back onto the identity grid (quirk kept for parity)
        out = jnp.pad(out, ((0, 0), (1, 1), (1, 1), (0, 0)))
        out = ConvModule(identity.shape[-1], 1, axis_name=self.axis_name,
                         name="proj")(out, train)
        out = bilinear_resize(out, (identity.shape[1], identity.shape[2]),
                              align_corners)
        feats = ConvModule(self.channels, 3, axis_name=self.axis_name,
                           name="bottleneck")(
            jnp.concatenate([identity, out], -1), train)
        return ClsSeg(self.num_classes, self.dropout_ratio,
                      name="cls")(feats, train)


class EncHead(nn.Module):
    """`enc_head.py` (EncNet): residual encoding over learned codewords
    gates the channels; optional se head predicts which classes are
    present. ``forward_train`` returns (logits, se_logits)."""
    num_classes: int
    channels: int = 512
    num_codes: int = 32
    add_lateral: bool = False
    use_se_loss: bool = True
    in_index: Tuple[int, ...] = (0, 1, 2, 3)
    dropout_ratio: float = 0.1
    axis_name: Optional[str] = None

    def _encode(self, inputs, train):
        xs = [inputs[i] for i in self.in_index]
        feat = ConvModule(self.channels, 3, axis_name=self.axis_name,
                          name="bottleneck")(xs[-1], train)
        if self.add_lateral:
            laterals = [resize(ConvModule(
                self.channels, 1, axis_name=self.axis_name,
                name=f"lateral_{i}")(x, train),
                (feat.shape[1], feat.shape[2]))
                for i, x in enumerate(xs[:-1])]
            feat = ConvModule(self.channels, 3, axis_name=self.axis_name,
                              name="fusion")(
                jnp.concatenate([feat] + laterals, -1), train)
        b, h, w, c = feat.shape
        # EncModule (`enc_head.py:11-58`): a 1x1 projection feeds the
        # Encoding layer; the gate output is relu(x + x*gamma) on the
        # UN-projected feat.
        proj = ConvModule(c, 1, axis_name=self.axis_name,
                          name="encoding_project")(feat, train)
        # Encoding layer (`ops/encoding.py`): scaled-L2 soft assignment of
        # per-pixel residuals to learned codewords. torch inits: codewords
        # uniform(-std, std) with std = (K*C)^-0.5; scale uniform(-1, 0) —
        # NEGATIVE, so `scale * ||resid||^2` is a similarity. Sign
        # convention kept so converted torch weights drop straight in.
        std = 1.0 / (self.num_codes * c) ** 0.5
        codewords = self.param(
            "codewords",
            lambda key: jax.random.uniform(key, (self.num_codes, c),
                                           minval=-std, maxval=std))
        scale = self.param(
            "scale",
            lambda key: jax.random.uniform(key, (self.num_codes,),
                                           minval=-1.0, maxval=0.0))
        flat = proj.reshape(b, h * w, c)
        resid = flat[:, :, None, :] - codewords[None, None]   # (b,n,K,c)
        dist = jnp.sum(resid ** 2, -1) * scale[None, None]
        assign = jax.nn.softmax(dist, axis=2)                 # (b,n,K)
        encoded = jnp.einsum("bnk,bnkc->bkc", assign, resid)  # (b,K,c)
        # torch BN1d on (b, K, C) normalizes over the CODE axis
        # (`enc_head.py:43-46` build_norm_layer(..., num_codes))
        encoded = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                               epsilon=1e-5, axis=1,
                               axis_name=self.axis_name,
                               name="enc_bn")(encoded)
        encoded = nn.relu(encoded)
        enc_feat = jnp.mean(encoded, axis=1)                  # (b,c)
        gamma = nn.sigmoid(nn.Dense(c, name="fc")(enc_feat))
        # `enc_head.py:57`: output = relu_(x + x * y)
        out = nn.relu(feat + feat * gamma[:, None, None, :])
        return out, enc_feat

    @nn.compact
    def __call__(self, inputs, train: bool = True,
                 return_se: bool = False):
        out, enc_feat = self._encode(inputs, train)
        logits = ClsSeg(self.num_classes, self.dropout_ratio,
                        name="cls")(out, train)
        if return_se and not self.use_se_loss:
            raise ValueError("return_se=True requires use_se_loss=True")
        if self.use_se_loss:
            se = nn.Dense(self.num_classes, name="se_layer")(enc_feat)
            if return_se:
                return logits, se
        return logits


def encode_onehot_labels(seg_label: jnp.ndarray,
                         num_classes: int) -> jnp.ndarray:
    """`enc_head.py:158-176`: multi-hot 'which classes appear' targets for
    the se loss."""
    onehot = jax.nn.one_hot(seg_label.reshape(seg_label.shape[0], -1),
                            num_classes)
    return (jnp.sum(onehot, axis=1) > 0).astype(jnp.float32)


class OCRHead(nn.Module):
    """`ocr_head.py` (cascade head): soft class regions from the previous
    head's logits gather object context; pixels attend over the object
    representations. Call as ``head(feats, prev_logits, train)``."""
    num_classes: int
    channels: int = 512
    ocr_channels: int = 256
    scale: float = 1.0
    in_index: Any = -1
    input_transform: Optional[str] = None
    dropout_ratio: float = 0.1
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, inputs, prev_output, train: bool = True):
        x = transform_inputs(inputs, self.in_index, self.input_transform)
        feats = ConvModule(self.channels, 3, axis_name=self.axis_name,
                           name="bottleneck")(x, train)
        b, h, w, c = feats.shape
        prev = resize(prev_output, (h, w))
        probs = jax.nn.softmax(
            self.scale * prev.reshape(b, h * w, -1), axis=1)
        # object context: (b, classes, c) soft-pooled pixel features
        context = jnp.einsum("bnk,bnc->bkc", probs,
                             feats.reshape(b, h * w, c))
        context = context[:, None]  # (b, 1, K, c) as a pseudo-image
        attended = SelfAttentionBlock(
            self.ocr_channels, c, key_query_num_convs=2, matmul_norm=True,
            axis_name=self.axis_name, name="object_attention")(
            feats, context, train)
        out = ConvModule(c, 1, axis_name=self.axis_name,
                         name="oab_bottleneck")(
            jnp.concatenate([attended, feats], -1), train)
        return ClsSeg(self.num_classes, self.dropout_ratio,
                      name="cls")(out, train)
