"""Zoo backbones (flax, NHWC). All return a 4-stage feature pyramid list
(except MobileNetV3, which returns the three stages its LRASPP head
consumes).

Capability matches for the reference's vendored mmseg backbones
(`/root/reference/models/mmseg/models/backbones/`):

- ``ResNetV1c`` — `resnet.py` (deep 3x3 stem, dilated stages 3/4 for
  output-stride-8 semantic segmentation, the mmseg default encoder).
- ``ResNeXt`` — `resnext.py` (grouped 3x3 bottleneck, 32x4d / 32x8d).
- ``ResNeSt`` — `resnest.py` (split-attention bottleneck, radix 2,
  avg-down shortcuts, stem-deep).
- ``HRNet`` — `hrnet.py` (parallel multi-resolution branches with full
  cross-resolution fusion; W18/W32/W48).
- ``MobileNetV3`` — `mobilenet_v3.py` (inverted residuals with
  squeeze-excite and hard-swish; 'small'/'large').

Everything is standard flax conv/BN so XLA fuses and tiles onto the MXU;
no torch-style module registries.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .layers import (ConvModule, DepthwiseSeparableConvModule,
                     adaptive_avg_pool, resize)


def _bn(train, axis_name, name=None, dtype=None):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, axis_name=axis_name, name=name,
                        dtype=dtype)


# ---------------------------------------------------------------------------
# ResNetV1c / ResNeXt
# ---------------------------------------------------------------------------

class Bottleneck(nn.Module):
    """ResNet bottleneck with optional grouping (ResNeXt) and dilation."""
    planes: int
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    base_width: int = 64
    avg_down: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        out_ch = self.planes * 4
        y = nn.Conv(width, (1, 1), use_bias=False, name="conv1")(x)
        y = _bn(train, self.axis_name, "bn1", y.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(width, (3, 3), strides=(self.stride, self.stride),
                    kernel_dilation=(self.dilation, self.dilation),
                    padding=self.dilation, feature_group_count=self.groups,
                    use_bias=False, name="conv2")(y)
        y = _bn(train, self.axis_name, "bn2", y.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(out_ch, (1, 1), use_bias=False, name="conv3")(y)
        y = _bn(train, self.axis_name, "bn3", y.dtype)(y)
        if x.shape[-1] != out_ch or self.stride != 1:
            if self.avg_down and self.stride != 1:
                x = nn.avg_pool(x, (self.stride, self.stride),
                                strides=(self.stride, self.stride))
                x = nn.Conv(out_ch, (1, 1), use_bias=False,
                            name="down_conv")(x)
            else:
                x = nn.Conv(out_ch, (1, 1),
                            strides=(self.stride, self.stride),
                            use_bias=False, name="down_conv")(x)
            x = _bn(train, self.axis_name, "down_bn", x.dtype)(x)
        return nn.relu(x + y)


class ResNetV1c(nn.Module):
    """mmseg's default encoder (`resnet.py`, v1c): deep 3x3x3 stem and
    dilations (1,1,2,4) with strides (1,2,1,1) -> output stride 8."""
    depth: int = 50
    groups: int = 1
    base_width: int = 64
    dilations: Tuple[int, ...] = (1, 1, 2, 4)
    strides: Tuple[int, ...] = (1, 2, 1, 1)
    avg_down: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        blocks = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3),
                  152: (3, 8, 36, 3)}[self.depth]
        for i, ch in enumerate((32, 32, 64)):
            x = nn.Conv(ch, (3, 3), strides=(2, 2) if i == 0 else (1, 1),
                        padding=1, use_bias=False, name=f"stem{i}")(x)
            x = _bn(train, self.axis_name, f"stem_bn{i}", x.dtype)(x)
            x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        feats = []
        for s in range(4):
            planes = 64 * (2 ** s)
            for b in range(blocks[s]):
                x = Bottleneck(planes,
                               stride=self.strides[s] if b == 0 else 1,
                               dilation=self.dilations[s],
                               groups=self.groups,
                               base_width=self.base_width,
                               avg_down=self.avg_down,
                               axis_name=self.axis_name,
                               name=f"layer{s + 1}_{b}")(x, train)
            feats.append(x)
        return feats


def ResNeXt(depth: int = 50, groups: int = 32, base_width: int = 4,
            **kw) -> ResNetV1c:
    """`resnext.py`: grouped bottlenecks (32x4d default)."""
    return ResNetV1c(depth=depth, groups=groups, base_width=base_width,
                     **kw)


# ---------------------------------------------------------------------------
# ResNeSt
# ---------------------------------------------------------------------------

class SplitAttentionConv(nn.Module):
    """`resnest.py` SplAtConv2d: radix-grouped conv + learned soft
    attention over the radix splits."""
    channels: int
    radix: int = 2
    groups: int = 1
    dilation: int = 1
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        r, g, c = self.radix, self.groups, self.channels
        y = nn.Conv(c * r, (3, 3), kernel_dilation=(self.dilation,) * 2,
                    padding=self.dilation, feature_group_count=g * r,
                    use_bias=False, name="conv")(x)
        y = _bn(train, self.axis_name, "bn0", y.dtype)(y)
        y = nn.relu(y)
        b, h, w, _ = y.shape
        splits = y.reshape(b, h, w, r, c)
        gap = jnp.mean(jnp.sum(splits, axis=3), axis=(1, 2))  # (b, c)
        inter = max(c * r // 4, 32)
        a = nn.Dense(inter, name="fc1")(gap)
        a = _bn(train, self.axis_name, "bn1", a.dtype)(a)
        a = nn.relu(a)
        a = nn.Dense(c * r, name="fc2")(a).reshape(b, r, g, c // g)
        # rSoftMax: softmax over radix within each group (radix>1)
        a = nn.softmax(a, axis=1).reshape(b, 1, 1, r, c)
        return jnp.sum(splits * a, axis=3)


class ResNeStBottleneck(nn.Module):
    """`resnest.py` Bottleneck: split-attention 3x3, avd stride via
    3x3 avg-pool, avg-down shortcut."""
    planes: int
    stride: int = 1
    dilation: int = 1
    radix: int = 2
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        out_ch = self.planes * 4
        y = nn.Conv(self.planes, (1, 1), use_bias=False, name="conv1")(x)
        y = _bn(train, self.axis_name, "bn1", y.dtype)(y)
        y = nn.relu(y)
        y = SplitAttentionConv(self.planes, radix=self.radix,
                               dilation=self.dilation,
                               axis_name=self.axis_name, name="conv2")(
            y, train)
        if self.stride > 1:  # avd layer, avd_first=False
            y = nn.avg_pool(y, (3, 3), strides=(self.stride,) * 2,
                            padding=((1, 1), (1, 1)))
        y = nn.Conv(out_ch, (1, 1), use_bias=False, name="conv3")(y)
        y = _bn(train, self.axis_name, "bn3", y.dtype)(y)
        if x.shape[-1] != out_ch or self.stride != 1:
            if self.stride != 1:
                x = nn.avg_pool(x, (self.stride,) * 2,
                                strides=(self.stride,) * 2)
            x = nn.Conv(out_ch, (1, 1), use_bias=False, name="down_conv")(x)
            x = _bn(train, self.axis_name, "down_bn", x.dtype)(x)
        return nn.relu(x + y)


class ResNeSt(nn.Module):
    """`resnest.py`: ResNet-D + split attention; 50/101 depths."""
    depth: int = 50
    radix: int = 2
    dilations: Tuple[int, ...] = (1, 1, 2, 4)
    strides: Tuple[int, ...] = (1, 2, 1, 1)
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        blocks = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}[self.depth]
        stem_ch = (32, 32, 64) if self.depth == 50 else (64, 64, 128)
        for i, ch in enumerate(stem_ch):
            x = nn.Conv(ch, (3, 3), strides=(2, 2) if i == 0 else (1, 1),
                        padding=1, use_bias=False, name=f"stem{i}")(x)
            x = _bn(train, self.axis_name, f"stem_bn{i}", x.dtype)(x)
            x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        feats = []
        for s in range(4):
            planes = 64 * (2 ** s)
            for b in range(blocks[s]):
                x = ResNeStBottleneck(
                    planes, stride=self.strides[s] if b == 0 else 1,
                    dilation=self.dilations[s], radix=self.radix,
                    axis_name=self.axis_name,
                    name=f"layer{s + 1}_{b}")(x, train)
            feats.append(x)
        return feats


# ---------------------------------------------------------------------------
# HRNet
# ---------------------------------------------------------------------------

class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        y = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2,
                    padding=1, use_bias=False, name="conv1")(x)
        y = _bn(train, self.axis_name, "bn1", y.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                    name="conv2")(y)
        y = _bn(train, self.axis_name, "bn2", y.dtype)(y)
        if x.shape[-1] != self.planes or self.stride != 1:
            x = nn.Conv(self.planes, (1, 1), strides=(self.stride,) * 2,
                        use_bias=False, name="down_conv")(x)
            x = _bn(train, self.axis_name, "down_bn", x.dtype)(x)
        return nn.relu(x + y)


class HRModule(nn.Module):
    """One exchange unit (`hrnet.py` HRModule): per-branch BasicBlocks then
    full pairwise cross-resolution fusion."""
    channels: Tuple[int, ...]
    num_blocks: int = 4
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, xs, train: bool = True):
        n = len(self.channels)
        ys = []
        for i in range(n):
            y = xs[i]
            for b in range(self.num_blocks):
                y = BasicBlock(self.channels[i], axis_name=self.axis_name,
                               name=f"branch{i}_block{b}")(y, train)
            ys.append(y)
        fused = []
        for i in range(n):
            acc = None
            for j in range(n):
                y = ys[j]
                if j > i:  # upsample: 1x1 conv + BN + bilinear
                    y = nn.Conv(self.channels[i], (1, 1), use_bias=False,
                                name=f"fuse_{i}_{j}_conv")(y)
                    y = _bn(train, self.axis_name, f"fuse_{i}_{j}_bn",
                            y.dtype)(y)
                    y = resize(y, (ys[i].shape[1], ys[i].shape[2]))
                elif j < i:  # downsample: stride-2 3x3 conv chain
                    for k in range(i - j):
                        last = k == i - j - 1
                        ch = self.channels[i] if last else self.channels[j]
                        y = nn.Conv(ch, (3, 3), strides=(2, 2), padding=1,
                                    use_bias=False,
                                    name=f"fuse_{i}_{j}_conv{k}")(y)
                        y = _bn(train, self.axis_name,
                                f"fuse_{i}_{j}_bn{k}", y.dtype)(y)
                        if not last:
                            y = nn.relu(y)
                acc = y if acc is None else acc + y
            fused.append(nn.relu(acc))
        return fused


class HRNet(nn.Module):
    """`hrnet.py` HRNetV2: stem + Bottleneck layer1, then 3 multi-branch
    stages; returns the 4 parallel-branch features (strides 4/8/16/32)."""
    width: int = 18  # W18 / W32 / W48
    stage_modules: Tuple[int, ...] = (1, 4, 3)
    num_blocks: int = 4
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        w = self.width
        chans = (w, 2 * w, 4 * w, 8 * w)
        for i in range(2):
            x = nn.Conv(64, (3, 3), strides=(2, 2), padding=1,
                        use_bias=False, name=f"stem{i}")(x)
            x = _bn(train, self.axis_name, f"stem_bn{i}", x.dtype)(x)
            x = nn.relu(x)
        for b in range(4):  # layer1: Bottleneck x4 @ 64
            x = Bottleneck(64, axis_name=self.axis_name,
                           name=f"layer1_{b}")(x, train)
        # transition to 2 branches
        xs = [ConvModule(chans[0], 3, axis_name=self.axis_name,
                         name="transition1_0")(x, train),
              ConvModule(chans[1], 3, strides=2, axis_name=self.axis_name,
                         name="transition1_1")(x, train)]
        for stage, n_mod in enumerate(self.stage_modules):
            n_br = stage + 2
            for m in range(n_mod):
                xs = HRModule(chans[:n_br], self.num_blocks,
                              axis_name=self.axis_name,
                              name=f"stage{stage + 2}_module{m}")(xs, train)
            if stage < len(self.stage_modules) - 1:  # grow a branch
                xs = xs + [ConvModule(
                    chans[n_br], 3, strides=2, axis_name=self.axis_name,
                    name=f"transition{stage + 2}_{n_br}")(xs[-1], train)]
        return xs


# ---------------------------------------------------------------------------
# MobileNetV3
# ---------------------------------------------------------------------------

def _hswish(x):
    return x * nn.relu6(x + 3.0) / 6.0


def make_divisible(v: int, divisor: int = 8) -> int:
    """torchvision/mmcv `_make_divisible`: round to the nearest multiple
    of ``divisor``, never dropping below 90% of ``v``."""
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class SqueezeExcite(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2))
        # squeeze width is make_divisible(C/4, 8) in both torchvision's
        # SqueezeExcitation and mmcv's SELayer (pretrained-checkpoint
        # compatible)
        s = nn.relu(nn.Dense(make_divisible(self.channels // 4),
                             name="fc1")(s))
        # mmseg/torchvision MNv3 uses hard-sigmoid gating
        s = nn.relu6(nn.Dense(self.channels, name="fc2")(s) + 3.0) / 6.0
        return x * s[:, None, None, :]


class InvertedResidualV3(nn.Module):
    exp: int
    out: int
    kernel: int
    stride: int
    se: bool
    act: str  # 'RE' | 'HS'
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        a = _hswish if self.act == "HS" else nn.relu
        y = x
        if self.exp != x.shape[-1]:
            y = nn.Conv(self.exp, (1, 1), use_bias=False, name="expand")(y)
            y = _bn(train, self.axis_name, "expand_bn", y.dtype)(y)
            y = a(y)
        y = nn.Conv(self.exp, (self.kernel,) * 2, strides=(self.stride,) * 2,
                    padding=self.kernel // 2, feature_group_count=self.exp,
                    use_bias=False, name="dw")(y)
        y = _bn(train, self.axis_name, "dw_bn", y.dtype)(y)
        y = a(y)
        if self.se:
            y = SqueezeExcite(self.exp, name="se")(y)
        y = nn.Conv(self.out, (1, 1), use_bias=False, name="project")(y)
        y = _bn(train, self.axis_name, "project_bn", y.dtype)(y)
        if self.stride == 1 and x.shape[-1] == self.out:
            y = x + y
        return y


# (kernel, expansion, out, SE, act, stride) — torchvision/mmseg tables
_MNV3_LARGE = (
    (3, 16, 16, False, "RE", 1), (3, 64, 24, False, "RE", 2),
    (3, 72, 24, False, "RE", 1), (5, 72, 40, True, "RE", 2),
    (5, 120, 40, True, "RE", 1), (5, 120, 40, True, "RE", 1),
    (3, 240, 80, False, "HS", 2), (3, 200, 80, False, "HS", 1),
    (3, 184, 80, False, "HS", 1), (3, 184, 80, False, "HS", 1),
    (3, 480, 112, True, "HS", 1), (3, 672, 112, True, "HS", 1),
    (5, 672, 160, True, "HS", 2), (5, 960, 160, True, "HS", 1),
    (5, 960, 160, True, "HS", 1),
)
_MNV3_SMALL = (
    (3, 16, 16, True, "RE", 2), (3, 72, 24, False, "RE", 2),
    (3, 88, 24, False, "RE", 1), (5, 96, 40, True, "HS", 2),
    (5, 240, 40, True, "HS", 1), (5, 240, 40, True, "HS", 1),
    (5, 120, 48, True, "HS", 1), (5, 144, 48, True, "HS", 1),
    (5, 288, 96, True, "HS", 2), (5, 576, 96, True, "HS", 1),
    (5, 576, 96, True, "HS", 1),
)


class MobileNetV3(nn.Module):
    """`mobilenet_v3.py`: returns the three features LRASPP consumes —
    an early high-res stage, a mid stage, and the final stage."""
    arch: str = "large"
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        table = _MNV3_LARGE if self.arch == "large" else _MNV3_SMALL
        # out_indices per mmseg: large (1, 3, 16)->layers; here: after the
        # last stride-4 block, last stride-8 block, and the final block.
        taps = (2, 5, 14) if self.arch == "large" else (0, 2, 10)
        x = nn.Conv(16, (3, 3), strides=(2, 2), padding=1, use_bias=False,
                    name="stem")(x)
        x = _bn(train, self.axis_name, "stem_bn", x.dtype)(x)
        x = _hswish(x)
        feats = []
        for i, (k, e, o, se, act, s) in enumerate(table):
            x = InvertedResidualV3(e, o, k, s, se, act,
                                   axis_name=self.axis_name,
                                   name=f"block{i}")(x, train)
            if i in taps:
                feats.append(x)
        return feats


# ---------------------------------------------------------------------------
# Fast-SCNN
# ---------------------------------------------------------------------------

class InvertedResidualV2(nn.Module):
    """MobileNetV2-style bottleneck used by Fast-SCNN's global feature
    extractor (`fast_scnn.py`)."""
    out: int
    stride: int = 1
    expand: int = 6
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        hidden = x.shape[-1] * self.expand
        y = nn.Conv(hidden, (1, 1), use_bias=False, name="expand")(x)
        y = _bn(train, self.axis_name, "expand_bn", y.dtype)(y)
        y = nn.relu6(y)
        y = nn.Conv(hidden, (3, 3), strides=(self.stride,) * 2, padding=1,
                    feature_group_count=hidden, use_bias=False, name="dw")(y)
        y = _bn(train, self.axis_name, "dw_bn", y.dtype)(y)
        y = nn.relu6(y)
        y = nn.Conv(self.out, (1, 1), use_bias=False, name="project")(y)
        y = _bn(train, self.axis_name, "project_bn", y.dtype)(y)
        if self.stride == 1 and x.shape[-1] == self.out:
            y = x + y
        return y


class FastSCNN(nn.Module):
    """`fast_scnn.py`: learning-to-downsample -> global feature extractor
    (inverted residuals + PPM) -> feature fusion. Returns
    [higher_res (1/8), lower_res (1/32), fusion (1/8)] like the reference
    (its sep-FCN head consumes the fusion output, index 2; the auxiliary
    heads consume 0 and 1)."""
    downsample_dw_channels: Tuple[int, int] = (32, 48)
    higher_in_channels: int = 64
    lower_in_channels: int = 128
    global_block_channels: Tuple[int, ...] = (64, 96, 128)
    global_block_strides: Tuple[int, ...] = (2, 2, 1)
    fusion_out_channels: int = 128
    pool_scales: Tuple[int, ...] = (1, 2, 3, 6)
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        CM, DSCM = ConvModule, DepthwiseSeparableConvModule
        # learning to downsample (`fast_scnn.py:13-70`): the first conv
        # keeps mmcv ConvModule's DEFAULT padding 0 (the reference passes
        # none), then 2 sep convs with padding 1
        x = CM(self.downsample_dw_channels[0], 3, strides=2, padding=0,
               axis_name=self.axis_name, name="ltd_conv")(x, train)
        x = DSCM(self.downsample_dw_channels[1], 3, strides=2,
                 axis_name=self.axis_name, name="ltd_ds1")(x, train)
        higher = DSCM(self.higher_in_channels, 3, strides=2,
                      axis_name=self.axis_name, name="ltd_ds2")(x, train)
        # global feature extractor (`fast_scnn.py:73-178`): 3 stages of
        # 3 inverted residuals, then a PPM at block_channels[2]//4 pool
        # width and a 1x1 fuse back to lower_in_channels
        y = higher
        for s, (ch, st) in enumerate(zip(self.global_block_channels,
                                         self.global_block_strides)):
            for b in range(3):
                y = InvertedResidualV2(ch, st if b == 0 else 1,
                                       axis_name=self.axis_name,
                                       name=f"gfe_{s}_{b}")(y, train)
        size = (y.shape[1], y.shape[2])
        pools = [y]
        for i, sc in enumerate(self.pool_scales):
            p = adaptive_avg_pool(y, sc)
            p = CM(self.global_block_channels[-1] // 4, 1,
                   axis_name=self.axis_name, name=f"ppm_{i}")(p, train)
            pools.append(resize(p, size))
        lower = CM(self.lower_in_channels, 1, axis_name=self.axis_name,
                   name="gfe_out")(jnp.concatenate(pools, -1), train)
        # feature fusion module (`fast_scnn.py:181-246`): the reference's
        # 'dwconv' is in fact a plain 1x1 ConvModule (BN+ReLU), then
        # act-free 1x1 projections on both branches, add, ReLU
        up = resize(lower, (higher.shape[1], higher.shape[2]))
        up = CM(self.fusion_out_channels, 1, axis_name=self.axis_name,
                name="ffm_dwconv")(up, train)
        up = CM(self.fusion_out_channels, 1, act=None,
                axis_name=self.axis_name, name="ffm_lower")(up, train)
        hi = CM(self.fusion_out_channels, 1, act=None,
                axis_name=self.axis_name, name="ffm_higher")(higher, train)
        fusion = nn.relu(hi + up)
        return [higher, lower, fusion]


# ---------------------------------------------------------------------------
# CGNet
# ---------------------------------------------------------------------------

class ChannelPReLU(nn.Module):
    """torch ``nn.PReLU(num_parameters=C)``: one learnable negative slope
    PER CHANNEL (init 0.25) — CGNet constructs every PReLU with
    ``num_parameters`` (`cgnet.py:96-97,131,266-268`); flax's ``nn.PReLU``
    is a single shared scalar, a different parameterization."""

    @nn.compact
    def __call__(self, x):
        alpha = self.param(
            "alpha", lambda k, s: jnp.full(s, 0.25, jnp.float32),
            (x.shape[-1],))
        return jnp.where(x >= 0, x, alpha.astype(x.dtype) * x)


class GlobalContextExtractor(nn.Module):
    """`cgnet.py` fglo: squeeze-excite channel gate."""
    channels: int
    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2))
        s = nn.relu(nn.Dense(max(self.channels // self.reduction, 1),
                             name="fc1")(s))
        s = nn.sigmoid(nn.Dense(self.channels, name="fc2")(s))
        return x * s[:, None, None, :]


class ContextGuidedBlock(nn.Module):
    """`cgnet.py` CG block: local (3x3) + surrounding (dilated 3x3)
    depthwise branches, joint BN+PReLU, global-context gate; residual when
    not downsampling."""
    out_channels: int
    dilation: int = 2
    reduction: int = 16
    downsample: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        n = self.out_channels if self.downsample else self.out_channels // 2
        y = nn.Conv(n, (3, 3) if self.downsample else (1, 1),
                    strides=(2, 2) if self.downsample else (1, 1),
                    padding=1 if self.downsample else 0, use_bias=False,
                    name="conv1x1")(x)
        y = _bn(train, self.axis_name, "bn1", y.dtype)(y)
        y = ChannelPReLU(name="prelu1")(y)
        floc = nn.Conv(n, (3, 3), padding=1, feature_group_count=n,
                       use_bias=False, name="floc")(y)
        fsur = nn.Conv(n, (3, 3), padding=self.dilation,
                       kernel_dilation=(self.dilation,) * 2,
                       feature_group_count=n, use_bias=False,
                       name="fsur")(y)
        joi = jnp.concatenate([floc, fsur], -1)
        joi = _bn(train, self.axis_name, "bn2", joi.dtype)(joi)
        joi = ChannelPReLU(name="prelu2")(joi)
        if self.downsample:
            joi = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                          name="reduce")(joi)
        out = GlobalContextExtractor(joi.shape[-1], self.reduction,
                                     name="fglo")(joi)
        if not self.downsample and x.shape[-1] == out.shape[-1]:
            out = x + out
        return out


class CGNet(nn.Module):
    """`cgnet.py` (M3N21): stem + 2 CG stages with input injection;
    returns the 3 stage features (strides 2, 4, 8)."""
    num_channels: Tuple[int, int, int] = (32, 64, 128)
    num_blocks: Tuple[int, int] = (3, 21)
    dilations: Tuple[int, int] = (2, 4)
    reductions: Tuple[int, int] = (8, 16)
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        inp = x
        y = x
        for i in range(3):
            y = nn.Conv(self.num_channels[0], (3, 3),
                        strides=(2, 2) if i == 0 else (1, 1), padding=1,
                        use_bias=False, name=f"stem{i}")(y)
            y = _bn(train, self.axis_name, f"stem_bn{i}", y.dtype)(y)
            y = ChannelPReLU(name=f"stem_prelu{i}")(y)
        feats = []
        # input injection at each resolution (`cgnet.py` InputInjection)
        down1 = nn.avg_pool(inp, (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)))
        y = jnp.concatenate([y, down1], -1)
        y = _bn(train, self.axis_name, "cat_bn0", y.dtype)(y)
        y = ChannelPReLU(name="cat_prelu0")(y)
        feats.append(y)
        for stage in range(2):
            blocks = self.num_blocks[stage]
            ch = self.num_channels[stage + 1]
            z = ContextGuidedBlock(ch, self.dilations[stage],
                                   self.reductions[stage], downsample=True,
                                   axis_name=self.axis_name,
                                   name=f"stage{stage}_down")(y, train)
            first = z
            for b in range(blocks - 1):
                z = ContextGuidedBlock(ch, self.dilations[stage],
                                       self.reductions[stage],
                                       axis_name=self.axis_name,
                                       name=f"stage{stage}_{b}")(z, train)
            # reference concat orders differ per stage (`cgnet.py:322-333`):
            # stage 1 is cat([x, down1, inp_4x]); stage 2 is cat([down2, x])
            if stage == 0:
                down = nn.avg_pool(down1, (3, 3), strides=(2, 2),
                                   padding=((1, 1), (1, 1)))
                z = jnp.concatenate([z, first, down], -1)
            else:
                z = jnp.concatenate([first, z], -1)
            z = _bn(train, self.axis_name, f"cat_bn{stage + 1}", z.dtype)(z)
            z = ChannelPReLU(name=f"cat_prelu{stage + 1}")(z)
            feats.append(z)
            y = z
        return feats


# ---------------------------------------------------------------------------
# UNet (mmseg configurable backbone)
# ---------------------------------------------------------------------------


class BasicConvBlock(nn.Module):
    """`backbones/unet.py:13-84`: num_convs stacked ConvModules; the first
    carries the stage stride, the rest the stage dilation."""
    features: int
    num_convs: int = 2
    strides: int = 1
    dilation: int = 1
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        for i in range(self.num_convs):
            x = ConvModule(self.features, kernel=3,
                           strides=self.strides if i == 0 else 1,
                           dilation=1 if i == 0 else self.dilation,
                           axis_name=self.axis_name, name=f"conv{i}")(
                x, train)
        return x


class DeconvModule(nn.Module):
    """`backbones/unet.py:87-145`: ConvTranspose 2x upsample -> BN -> ReLU.
    Requires (kernel - scale) even and kernel >= scale."""
    features: int
    kernel: int = 4
    scale: int = 2
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        assert self.kernel >= self.scale and \
            (self.kernel - self.scale) % 2 == 0
        # torch ConvTranspose2d(k, stride=scale, padding=(k-scale)//2)
        # yields exactly in*scale; lax's SAME transposed-conv padding is
        # the same symmetric (k-scale)//2 crop
        # bias=True: mmseg's DeconvModule keeps ConvTranspose2d's default
        # bias even under BN (`unet.py:127-131`) — checkpoint compatible
        x = nn.ConvTranspose(self.features, (self.kernel, self.kernel),
                             strides=(self.scale, self.scale),
                             padding="SAME",
                             use_bias=True, name="deconv")(x)
        x = _bn(train, self.axis_name, "bn", x.dtype)(x)
        return nn.relu(x)


class InterpConv(nn.Module):
    """`backbones/unet.py:148-221`: bilinear 2x upsample + 1x1 ConvModule
    (upsample first unless ``conv_first``)."""
    features: int
    conv_first: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        def up(y):
            return resize(y, (y.shape[1] * 2, y.shape[2] * 2))
        conv = ConvModule(self.features, kernel=1,
                          axis_name=self.axis_name, name="conv")
        if self.conv_first:
            return up(conv(x, train))
        return conv(up(x), train)


class UpConvBlock(nn.Module):
    """`models/utils/up_conv_block.py:44-100`: upsample the coarse input,
    concat the encoder skip, run a BasicConvBlock. When the paired encoder
    stage never downsampled, upsampling degenerates to a 1x1 ConvModule."""
    features: int
    num_convs: int = 2
    dilation: int = 1
    upsample: Optional[str] = "InterpConv"  # None | InterpConv | DeconvModule
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, skip, x, train: bool = True):
        if self.upsample == "InterpConv":
            x = InterpConv(self.features, axis_name=self.axis_name,
                           name="upsample")(x, train)
        elif self.upsample == "DeconvModule":
            x = DeconvModule(self.features, axis_name=self.axis_name,
                             name="upsample")(x, train)
        elif self.upsample is None:
            x = ConvModule(self.features, kernel=1,
                           axis_name=self.axis_name, name="upsample")(
                x, train)
        else:
            raise ValueError(self.upsample)
        x = jnp.concatenate([skip, x], axis=-1)
        return BasicConvBlock(self.features, self.num_convs,
                              dilation=self.dilation,
                              axis_name=self.axis_name,
                              name="conv_block")(x, train)


class UNetBackbone(nn.Module):
    """mmseg's configurable UNet (`backbones/unet.py:222-408`).

    Returns ``dec_outs``: ``[bottleneck, ...decoder outputs coarse->fine]``
    of length ``num_stages`` — mmseg's fcn_unet_s5-d16 family reads
    ``in_index=4`` (full-res, base_channels wide) for the decode head and
    ``in_index=3`` for the auxiliary head. Input H/W must be divisible by
    the cumulative downsample rate (`:398-409`); flax ``nn.max_pool``
    replaces MaxPool2d, everything NHWC.
    """
    base_channels: int = 64
    num_stages: int = 5
    strides: Sequence[int] = (1, 1, 1, 1, 1)
    enc_num_convs: Sequence[int] = (2, 2, 2, 2, 2)
    dec_num_convs: Sequence[int] = (2, 2, 2, 2)
    downsamples: Sequence[bool] = (True, True, True, True)
    enc_dilations: Sequence[int] = (1, 1, 1, 1, 1)
    dec_dilations: Sequence[int] = (1, 1, 1, 1)
    upsample: Optional[str] = "InterpConv"
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        ns = self.num_stages
        assert len(self.strides) == ns and len(self.enc_num_convs) == ns \
            and len(self.enc_dilations) == ns
        assert len(self.dec_num_convs) == ns - 1 \
            and len(self.downsamples) == ns - 1 \
            and len(self.dec_dilations) == ns - 1
        rate = 1
        for i in range(1, ns):
            if self.strides[i] == 2 or self.downsamples[i - 1]:
                rate *= 2
        assert x.shape[1] % rate == 0 and x.shape[2] % rate == 0, \
            f"input {x.shape[1:3]} not divisible by downsample rate {rate}"

        enc_outs = []
        for i in range(ns):
            if i != 0 and self.strides[i] == 1 and self.downsamples[i - 1]:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = BasicConvBlock(self.base_channels * 2 ** i,
                               self.enc_num_convs[i],
                               strides=self.strides[i],
                               dilation=self.enc_dilations[i],
                               axis_name=self.axis_name,
                               name=f"enc{i}")(x, train)
            enc_outs.append(x)
        dec_outs = [x]
        for i in reversed(range(ns - 1)):
            up = self.upsample if (self.strides[i + 1] != 1
                                   or self.downsamples[i]) else None
            x = UpConvBlock(self.base_channels * 2 ** i,
                            self.dec_num_convs[i],
                            dilation=self.dec_dilations[i],
                            upsample=up, axis_name=self.axis_name,
                            name=f"dec{i}")(enc_outs[i], x, train)
            dec_outs.append(x)
        return dec_outs
