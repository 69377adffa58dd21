"""Numeric parity: zoo backbones vs torch oracles with source-naming keys.

Neither torchvision, mmcv nor the official SegFormer repo ship in this
image, so each oracle reconstructs the SOURCE module layout (state_dict
key structure + forward math) in plain torch with random weights, converts
it via tools/convert_torch_weights.py, and compares forwards. This
validates the converters' key mappings AND the flax backbones' semantics
(stride/dilation/padding/BN/attention math), so a real pretrained `.pth`
dropped on disk converts correctly:

- ResNetV1c-50 / ResNeXt-50 (mmcv naming: `stem.N`, `layerS.B`,
  reference `models/mmseg/models/backbones/{resnet,resnext}.py`)
- ResNeSt-50 (mmcv naming incl. SplAtConv2d `conv2.{conv,bn0,fc1,bn1,fc2}`,
  reference `resnest.py:39-143`)
- HRNet-W18 (mmcv naming: transitions/branches/fuse_layers,
  reference `hrnet.py:26-215`)
- MobileNetV3-small (torchvision naming: `features.N.block.J`)
- MiT-b0 (SegFormer-official naming: `patch_embedN`, `blockN.J`, `normN`)
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.slow  # backbone torch oracles: big single compiles, ~2 min

import jax
import jax.numpy as jnp
from torch import nn
import torch.nn.functional as F

import sys, os
REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)
from aadg_tpu.models.zoo.backbones import (ResNetV1c, ResNeXt, ResNeSt,
                                           HRNet, MobileNetV3,
                                           make_divisible, _MNV3_SMALL)
from aadg_tpu.models.segformer import MixTransformer
from tools.convert_torch_weights import (convert_resnet, convert_hrnet,
                                         convert_mobilenet_v3, convert_mit)


def _randomize_bn(module):
    for m in module.modules():
        if isinstance(m, (nn.BatchNorm2d, nn.BatchNorm1d)):
            m.running_mean.uniform_(-0.5, 0.5)
            m.running_var.uniform_(0.5, 1.5)


def _nhwc(t):
    return np.transpose(t.numpy(), (0, 2, 3, 1))


def _forward_compare(flax_model, variables, torch_feats, x_np, atol):
    outs = flax_model.apply(variables, jnp.asarray(x_np), train=False)
    assert len(outs) == len(torch_feats)
    for i, (got, want) in enumerate(zip(outs, torch_feats)):
        np.testing.assert_allclose(
            np.asarray(got, np.float32), _nhwc(want), rtol=1e-3, atol=atol,
            err_msg=f"stage {i}")


# ---------------------------------------------------------------------------
# ResNetV1c / ResNeXt / ResNeSt oracles (mmcv naming)
# ---------------------------------------------------------------------------

class TBottleneck(nn.Module):
    def __init__(self, inplanes, planes, stride=1, dilation=1, groups=1,
                 base_width=64, ds=False):
        super().__init__()
        width = int(planes * (base_width / 64.0)) * groups
        self.conv1 = nn.Conv2d(inplanes, width, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.conv2 = nn.Conv2d(width, width, 3, stride, dilation, dilation,
                               groups, bias=False)
        self.bn2 = nn.BatchNorm2d(width)
        self.conv3 = nn.Conv2d(width, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU()
        self.downsample = None
        if ds:
            self.downsample = nn.Sequential(
                nn.Conv2d(inplanes, planes * 4, 1, stride, bias=False),
                nn.BatchNorm2d(planes * 4))

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return self.relu(y + idn)


class TRSoftmax(nn.Module):
    def __init__(self, radix, groups):
        super().__init__()
        self.radix, self.groups = radix, groups

    def forward(self, x):
        b = x.size(0)
        x = x.view(b, self.groups, self.radix, -1).transpose(1, 2)
        return F.softmax(x, dim=1).reshape(b, -1)


class TSplAt(nn.Module):
    """reference `resnest.py:39-143` SplitAttentionConv2d, groups=1."""

    def __init__(self, in_ch, channels, stride=1, dilation=1, radix=2):
        super().__init__()
        inter = max(in_ch * radix // 4, 32)
        self.radix = radix
        self.conv = nn.Conv2d(in_ch, channels * radix, 3, stride, dilation,
                              dilation, groups=radix, bias=False)
        self.bn0 = nn.BatchNorm2d(channels * radix)
        self.relu = nn.ReLU()
        self.fc1 = nn.Conv2d(channels, inter, 1)
        self.bn1 = nn.BatchNorm2d(inter)
        self.fc2 = nn.Conv2d(inter, channels * radix, 1)
        self.rsoftmax = TRSoftmax(radix, 1)

    def forward(self, x):
        x = self.relu(self.bn0(self.conv(x)))
        b = x.size(0)
        splits = x.view(b, self.radix, -1, *x.shape[2:])
        gap = F.adaptive_avg_pool2d(splits.sum(dim=1), 1)
        gap = self.relu(self.bn1(self.fc1(gap)))
        atten = self.rsoftmax(self.fc2(gap)).view(b, -1, 1, 1)
        attens = atten.view(b, self.radix, -1, 1, 1)
        return (attens * splits).sum(dim=1)


class TResNeStBottleneck(nn.Module):
    def __init__(self, inplanes, planes, stride=1, dilation=1, ds=False):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = TSplAt(planes, planes, 1, dilation)
        self.avd_layer = (nn.AvgPool2d(3, stride, padding=1)
                          if stride > 1 else None)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU()
        self.downsample = None
        if ds:  # avg_down: AvgPool at index 0, conv at 1, bn at 2
            self.downsample = nn.Sequential(
                nn.AvgPool2d(stride, stride, ceil_mode=True,
                             count_include_pad=False),
                nn.Conv2d(inplanes, planes * 4, 1, bias=False),
                nn.BatchNorm2d(planes * 4))

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.conv2(y)
        if self.avd_layer is not None:
            y = self.avd_layer(y)
        y = self.bn3(self.conv3(y))
        return self.relu(y + idn)


class TResNet(nn.Module):
    def __init__(self, blocks=(3, 4, 6, 3), groups=1, base_width=64,
                 family="resnet"):
        super().__init__()
        self.stem = nn.Sequential(
            nn.Conv2d(3, 32, 3, 2, 1, bias=False), nn.BatchNorm2d(32),
            nn.ReLU(),
            nn.Conv2d(32, 32, 3, 1, 1, bias=False), nn.BatchNorm2d(32),
            nn.ReLU(),
            nn.Conv2d(32, 64, 3, 1, 1, bias=False), nn.BatchNorm2d(64),
            nn.ReLU())
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        dilations, strides = (1, 1, 2, 4), (1, 2, 1, 1)
        inplanes = 64
        for s in range(4):
            planes = 64 * 2 ** s
            layer = []
            for b in range(blocks[s]):
                stride = strides[s] if b == 0 else 1
                ds = b == 0 and (inplanes != planes * 4 or stride != 1)
                if family == "resnest":
                    layer.append(TResNeStBottleneck(
                        inplanes, planes, stride, dilations[s], ds))
                else:
                    layer.append(TBottleneck(
                        inplanes, planes, stride, dilations[s], groups,
                        base_width, ds))
                inplanes = planes * 4
            setattr(self, f"layer{s + 1}", nn.Sequential(*layer))

    def forward(self, x):
        x = self.maxpool(self.stem(x))
        feats = []
        for s in range(4):
            x = getattr(self, f"layer{s + 1}")(x)
            feats.append(x)
        return feats


@pytest.mark.parametrize("family,flax_ctor", [
    ("resnet", lambda: ResNetV1c(depth=50)),
    ("resnext", lambda: ResNeXt(depth=50)),
    ("resnest", lambda: ResNeSt(depth=50)),
])
def test_resnet_family_matches_torch_oracle(family, flax_ctor):
    torch.manual_seed(0)
    groups, bw = (32, 4) if family == "resnext" else (1, 64)
    tm = TResNet(groups=groups, base_width=bw, family=family).eval()
    _randomize_bn(tm)
    params, stats = convert_resnet(tm.state_dict(), 50, family)
    x_np = np.random.default_rng(1).uniform(
        -1, 1, (1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        feats = tm(torch.from_numpy(np.transpose(x_np, (0, 3, 1, 2))))
    _forward_compare(flax_ctor(), {"params": params, "batch_stats": stats},
                     feats, x_np, atol=2e-3)


# ---------------------------------------------------------------------------
# HRNet oracle (mmcv naming; reference `hrnet.py:26-215`)
# ---------------------------------------------------------------------------

class TBasicBlock(nn.Module):
    def __init__(self, planes):
        super().__init__()
        self.conv1 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.relu = nn.ReLU()

    def forward(self, x):
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return self.relu(x + y)


def _t_conv_bn_relu(cin, cout, k=3, stride=1):
    return nn.Sequential(
        nn.Conv2d(cin, cout, k, stride, k // 2, bias=False),
        nn.BatchNorm2d(cout), nn.ReLU())


class THRModule(nn.Module):
    def __init__(self, chans, num_blocks=4):
        super().__init__()
        n = len(chans)
        self.branches = nn.ModuleList([
            nn.Sequential(*[TBasicBlock(chans[i]) for _ in range(num_blocks)])
            for i in range(n)])
        fuse = []
        for i in range(n):
            row = []
            for j in range(n):
                if j > i:
                    row.append(nn.Sequential(
                        nn.Conv2d(chans[j], chans[i], 1, bias=False),
                        nn.BatchNorm2d(chans[i]),
                        nn.Upsample(scale_factor=2 ** (j - i),
                                    mode="bilinear", align_corners=False)))
                elif j == i:
                    row.append(None)
                else:
                    downs = []
                    for k in range(i - j):
                        last = k == i - j - 1
                        cout = chans[i] if last else chans[j]
                        mods = [nn.Conv2d(chans[j] if k == 0 else chans[j],
                                          cout, 3, 2, 1, bias=False),
                                nn.BatchNorm2d(cout)]
                        if not last:
                            mods.append(nn.ReLU())
                        downs.append(nn.Sequential(*mods))
                    row.append(nn.Sequential(*downs))
            fuse.append(nn.ModuleList(row))
        self.fuse_layers = nn.ModuleList(fuse)
        self.relu = nn.ReLU()

    def forward(self, xs):
        xs = [br(x) for br, x in zip(self.branches, xs)]
        out = []
        for i in range(len(xs)):
            y = 0
            for j in range(len(xs)):
                if i == j:
                    y = y + xs[j]
                elif j > i:
                    y = y + F.interpolate(
                        self.fuse_layers[i][j](xs[j]),
                        size=xs[i].shape[2:], mode="bilinear",
                        align_corners=False)
                else:
                    y = y + self.fuse_layers[i][j](xs[j])
            out.append(self.relu(y))
        return out


class THRNet(nn.Module):
    def __init__(self, w=18, stage_modules=(1, 4, 3)):
        super().__init__()
        chans = (w, 2 * w, 4 * w, 8 * w)
        self.stage_modules = stage_modules
        self.conv1 = nn.Conv2d(3, 64, 3, 2, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.conv2 = nn.Conv2d(64, 64, 3, 2, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU()
        self.layer1 = nn.Sequential(
            TBottleneck(64, 64, ds=True),
            *[TBottleneck(256, 64) for _ in range(3)])
        self.transition1 = nn.ModuleList([
            _t_conv_bn_relu(256, chans[0]),
            nn.Sequential(_t_conv_bn_relu(256, chans[1], stride=2))])
        for stage, n_mod in enumerate(stage_modules):
            s = stage + 2
            setattr(self, f"stage{s}", nn.Sequential(
                *[THRModule(chans[:s]) for _ in range(n_mod)]))
            if stage < len(stage_modules) - 1:
                setattr(self, f"transition{s}", nn.ModuleList(
                    [None] * s +
                    [nn.Sequential(_t_conv_bn_relu(chans[s - 1], chans[s],
                                                   stride=2))]))

    def forward(self, x):
        x = self.relu(self.bn1(self.conv1(x)))
        x = self.relu(self.bn2(self.conv2(x)))
        x = self.layer1(x)
        xs = [t(x) for t in self.transition1]
        for stage in range(len(self.stage_modules)):
            s = stage + 2
            xs = list(getattr(self, f"stage{s}")(xs))
            if stage < len(self.stage_modules) - 1:
                xs.append(getattr(self, f"transition{s}")[-1](xs[-1]))
        return xs


def test_hrnet_matches_torch_oracle():
    torch.manual_seed(0)
    tm = THRNet(18).eval()
    _randomize_bn(tm)
    params, stats = convert_hrnet(tm.state_dict())
    x_np = np.random.default_rng(2).uniform(
        -1, 1, (1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        feats = tm(torch.from_numpy(np.transpose(x_np, (0, 3, 1, 2))))
    _forward_compare(HRNet(width=18),
                     {"params": params, "batch_stats": stats},
                     feats, x_np, atol=2e-3)


# ---------------------------------------------------------------------------
# MobileNetV3 oracle (torchvision naming)
# ---------------------------------------------------------------------------

class TSqueezeExcite(nn.Module):
    def __init__(self, ch):
        super().__init__()
        sq = make_divisible(ch // 4)
        self.fc1 = nn.Conv2d(ch, sq, 1)
        self.fc2 = nn.Conv2d(sq, ch, 1)

    def forward(self, x):
        s = F.adaptive_avg_pool2d(x, 1)
        s = F.hardsigmoid(self.fc2(F.relu(self.fc1(s))))
        return x * s


class TConvBNAct(nn.Sequential):
    def __init__(self, cin, cout, k=3, stride=1, groups=1, act=nn.ReLU):
        super().__init__(
            nn.Conv2d(cin, cout, k, stride, (k - 1) // 2, groups=groups,
                      bias=False),
            nn.BatchNorm2d(cout), act())


class TInvertedResidualV3(nn.Module):
    def __init__(self, cin, k, e, o, se, act, stride):
        super().__init__()
        a = nn.Hardswish if act == "HS" else nn.ReLU
        layers = []
        if e != cin:
            layers.append(TConvBNAct(cin, e, 1, act=a))
        layers.append(TConvBNAct(e, e, k, stride, groups=e, act=a))
        if se:
            layers.append(TSqueezeExcite(e))
        layers.append(TConvBNAct(e, o, 1, act=nn.Identity))
        self.block = nn.Sequential(*layers)
        self.use_res = stride == 1 and cin == o

    def forward(self, x):
        y = self.block(x)
        return x + y if self.use_res else y


def test_mobilenet_v3_matches_torch_oracle():
    torch.manual_seed(0)
    feats_mods = [TConvBNAct(3, 16, 3, 2, act=nn.Hardswish)]
    cin = 16
    for (k, e, o, se, act, s) in _MNV3_SMALL:
        feats_mods.append(TInvertedResidualV3(cin, k, e, o, se, act, s))
        cin = o
    tm = nn.Sequential(*feats_mods).eval()
    _randomize_bn(tm)
    sd = {f"features.{k}": v for k, v in tm.state_dict().items()}
    params, stats = convert_mobilenet_v3(sd, "small")
    x_np = np.random.default_rng(3).uniform(
        -1, 1, (2, 64, 64, 3)).astype(np.float32)
    taps = (1, 3, 11)  # features indices == zoo taps (0, 2, 10) + stem
    with torch.no_grad():
        y = torch.from_numpy(np.transpose(x_np, (0, 3, 1, 2)))
        feats = []
        for i, mod in enumerate(tm):
            y = mod(y)
            if i in taps:
                feats.append(y)
    _forward_compare(MobileNetV3(arch="small"),
                     {"params": params, "batch_stats": stats},
                     feats, x_np, atol=1e-3)


# ---------------------------------------------------------------------------
# MiT oracle (SegFormer-official naming)
# ---------------------------------------------------------------------------

class TMitAttention(nn.Module):
    def __init__(self, dim, heads, sr):
        super().__init__()
        self.heads, self.sr_ratio = heads, sr
        self.q = nn.Linear(dim, dim)
        self.kv = nn.Linear(dim, dim * 2)
        self.proj = nn.Linear(dim, dim)
        if sr > 1:
            self.sr = nn.Conv2d(dim, dim, sr, sr)
            self.norm = nn.LayerNorm(dim, eps=1e-6)

    def forward(self, x, H, W):
        B, N, C = x.shape
        hd = C // self.heads
        q = self.q(x).reshape(B, N, self.heads, hd).permute(0, 2, 1, 3)
        if self.sr_ratio > 1:
            x_ = x.permute(0, 2, 1).reshape(B, C, H, W)
            x_ = self.sr(x_).reshape(B, C, -1).permute(0, 2, 1)
            x_ = self.norm(x_)
        else:
            x_ = x
        kv = self.kv(x_).reshape(B, -1, 2, self.heads, hd).permute(
            2, 0, 3, 1, 4)
        k, v = kv[0], kv[1]
        attn = (q @ k.transpose(-2, -1)) * hd ** -0.5
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(B, N, C)
        return self.proj(x)


class TDWConv(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.dwconv = nn.Conv2d(dim, dim, 3, 1, 1, groups=dim)

    def forward(self, x, H, W):
        B, N, C = x.shape
        x = x.transpose(1, 2).view(B, C, H, W)
        return self.dwconv(x).flatten(2).transpose(1, 2)


class TMixFFN(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.dwconv = TDWConv(hidden)
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x, H, W):
        return self.fc2(F.gelu(self.dwconv(self.fc1(x), H, W)))


class TMitBlock(nn.Module):
    def __init__(self, dim, heads, sr, mlp_ratio):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = TMitAttention(dim, heads, sr)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = TMixFFN(dim, dim * mlp_ratio)

    def forward(self, x, H, W):
        x = x + self.attn(self.norm1(x), H, W)
        return x + self.mlp(self.norm2(x), H, W)


class TPatchEmbed(nn.Module):
    def __init__(self, cin, dim, patch, stride):
        super().__init__()
        self.proj = nn.Conv2d(cin, dim, patch, stride, patch // 2)
        self.norm = nn.LayerNorm(dim, eps=1e-6)

    def forward(self, x):
        x = self.proj(x)
        _, _, H, W = x.shape
        return self.norm(x.flatten(2).transpose(1, 2)), H, W


class TMit(nn.Module):
    def __init__(self, dims=(32, 64, 160, 256), depths=(2, 2, 2, 2),
                 heads=(1, 2, 5, 8), srs=(8, 4, 2, 1), mlp_ratio=4):
        super().__init__()
        self.depths = depths
        cin = 3
        for i in range(4):
            patch, stride = (7, 4) if i == 0 else (3, 2)
            setattr(self, f"patch_embed{i + 1}",
                    TPatchEmbed(cin, dims[i], patch, stride))
            setattr(self, f"block{i + 1}", nn.ModuleList(
                [TMitBlock(dims[i], heads[i], srs[i], mlp_ratio)
                 for _ in range(depths[i])]))
            setattr(self, f"norm{i + 1}", nn.LayerNorm(dims[i], eps=1e-6))
            cin = dims[i]

    def forward(self, x):
        B = x.shape[0]
        feats = []
        for i in range(4):
            x, H, W = getattr(self, f"patch_embed{i + 1}")(x)
            for blk in getattr(self, f"block{i + 1}"):
                x = blk(x, H, W)
            x = getattr(self, f"norm{i + 1}")(x)
            x = x.reshape(B, H, W, -1).permute(0, 3, 1, 2).contiguous()
            feats.append(x)
        return feats


def test_mit_matches_torch_oracle():
    torch.manual_seed(0)
    tm = TMit().eval()
    params, stats = convert_mit(tm.state_dict(), "mit_b0")
    assert stats == {}
    x_np = np.random.default_rng(4).uniform(
        -1, 1, (1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        feats = tm(torch.from_numpy(np.transpose(x_np, (0, 3, 1, 2))))
    _forward_compare(MixTransformer(variant="mit_b0"), {"params": params},
                     feats, x_np, atol=1e-3)


@pytest.mark.parametrize("variant", ["mit_b4", "mit_b5"])
def test_mit_b4_b5_convert_match_torch_oracle(variant):
    """b4/b5 share the naming scheme with deeper stages
    (`mix_transformer.py:374-424`): the converter mapping must walk every
    block of the deeper depths tables — (3,8,27,3) / (3,6,40,3)."""
    from aadg_tpu.models.segformer import VARIANTS
    dims, depths, heads, srs, mlp_ratio = VARIANTS[variant]
    torch.manual_seed(1)
    tm = TMit(dims=dims, depths=depths, heads=heads, srs=srs,
              mlp_ratio=mlp_ratio).eval()
    params, stats = convert_mit(tm.state_dict(), variant)
    assert stats == {}
    x_np = np.random.default_rng(5).uniform(
        -1, 1, (1, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        feats = tm(torch.from_numpy(np.transpose(x_np, (0, 3, 1, 2))))
    _forward_compare(MixTransformer(variant=variant), {"params": params},
                     feats, x_np, atol=2e-3)


# ---------------------------------------------------------------------------
# load_pretrained grafting (utils/pretrained.py + TPU.PRETRAINED)
# ---------------------------------------------------------------------------

def test_converter_cli_unwraps_and_writes(tmp_path):
    """CLI path: open-mmlab 'state_dict' wrapper + 'backbone.' prefixes
    (how mmseg checkpoints actually ship) convert end-to-end."""
    import subprocess
    from flax import serialization

    torch.manual_seed(2)
    tm = TMit().eval()
    sd = {f"backbone.{k}": v for k, v in tm.state_dict().items()}
    src = tmp_path / "mit_b0.pth"
    torch.save({"state_dict": sd, "meta": {}}, src)
    dst = tmp_path / "out.msgpack"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools",
                                      "convert_torch_weights.py"),
         str(src), str(dst), "--arch", "mit_b0"],
        capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
    tree = serialization.msgpack_restore(dst.read_bytes())
    got = tree["params"]["patch_embed1"]["Conv_0"]["kernel"]
    want = np.transpose(tm.patch_embed1.proj.weight.detach().numpy(),
                        (2, 3, 1, 0))
    np.testing.assert_allclose(got, want, atol=1e-7)


def test_load_pretrained_grafts_and_validates(tmp_path):
    from flax import serialization
    from aadg_tpu.utils.pretrained import load_pretrained

    torch.manual_seed(1)
    feats_mods = [TConvBNAct(3, 16, 3, 2, act=nn.Hardswish)]
    cin = 16
    for (k, e, o, se, act, s) in _MNV3_SMALL:
        feats_mods.append(TInvertedResidualV3(cin, k, e, o, se, act, s))
        cin = o
    tm = nn.Sequential(*feats_mods).eval()
    sd = {f"features.{k}": v for k, v in tm.state_dict().items()}
    p, st = convert_mobilenet_v3(sd, "small")
    path = tmp_path / "mnv3.msgpack"
    path.write_bytes(serialization.to_bytes(
        {"params": p, "batch_stats": st}))

    model = MobileNetV3(arch="small")
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    # auto graft at the root (backbone params ARE the tree)
    params, stats = load_pretrained(variables["params"],
                                    variables["batch_stats"], str(path))
    got = np.asarray(params["stem"]["kernel"])
    want = np.transpose(tm[0][0].weight.detach().numpy(), (2, 3, 1, 0))
    np.testing.assert_allclose(got, want, atol=1e-7)

    # auto graft nested one level down (EncoderDecoder-style layout)
    nested = {"backbone": variables["params"], "head": {"w": np.zeros(3)}}
    grafted = load_pretrained(nested, {"backbone": variables["batch_stats"]},
                              str(path))[0]
    np.testing.assert_allclose(
        np.asarray(grafted["backbone"]["stem"]["kernel"]), want, atol=1e-7)

    # a shape mismatch fails loudly
    bad = dict(p)
    bad["stem"] = {"kernel": np.zeros((3, 3, 3, 99), np.float32)}
    bad_path = tmp_path / "bad.msgpack"
    bad_path.write_bytes(serialization.to_bytes(
        {"params": bad, "batch_stats": {}}))
    with pytest.raises(ValueError):
        load_pretrained(variables["params"], variables["batch_stats"],
                        str(bad_path))


# ---------------------------------------------------------------------------
# UNet (mmseg `backbones/unet.py` naming: encoder.i.j.convs.k / decoder.i)
# ---------------------------------------------------------------------------

class TUConvModule(nn.Module):
    def __init__(self, cin, cout, k=3, stride=1, dilation=1):
        super().__init__()
        pad = dilation * (k - 1) // 2
        self.conv = nn.Conv2d(cin, cout, k, stride, padding=pad,
                              dilation=dilation, bias=False)
        self.bn = nn.BatchNorm2d(cout)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class TUBasicConvBlock(nn.Module):
    def __init__(self, cin, cout, num_convs=2, stride=1, dilation=1):
        super().__init__()
        mods = [TUConvModule(cin, cout, stride=stride)]
        for _ in range(num_convs - 1):
            mods.append(TUConvModule(cout, cout, dilation=dilation))
        self.convs = nn.Sequential(*mods)

    def forward(self, x):
        return self.convs(x)


class TUInterpConv(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.interp_upsample = nn.Sequential(
            nn.Upsample(scale_factor=2, mode="bilinear",
                        align_corners=False),
            TUConvModule(cin, cout, k=1))

    def forward(self, x):
        return self.interp_upsample(x)


class TUDeconv(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.deconv_upsamping = nn.Sequential(
            nn.ConvTranspose2d(cin, cout, 4, stride=2, padding=1),
            nn.BatchNorm2d(cout), nn.ReLU())

    def forward(self, x):
        return self.deconv_upsamping(x)


class TUUpConvBlock(nn.Module):
    def __init__(self, cin, skip, cout, deconv=False):
        super().__init__()
        self.conv_block = TUBasicConvBlock(2 * skip, cout)
        self.upsample = (TUDeconv if deconv else TUInterpConv)(cin, skip)

    def forward(self, skip, x):
        x = self.upsample(x)
        return self.conv_block(torch.cat([skip, x], dim=1))


class TUNet(nn.Module):
    """mmseg UNet layout, 3 stages, all downsamples via MaxPool."""

    def __init__(self, base=8, num_stages=3, deconv=False):
        super().__init__()
        self.encoder = nn.ModuleList()
        self.decoder = nn.ModuleList()
        cin = 3
        for i in range(num_stages):
            blocks = []
            if i != 0:
                blocks.append(nn.MaxPool2d(2))
                self.decoder.append(TUUpConvBlock(
                    base * 2 ** i, base * 2 ** (i - 1),
                    base * 2 ** (i - 1), deconv=deconv))
            blocks.append(TUBasicConvBlock(cin, base * 2 ** i))
            self.encoder.append(nn.Sequential(*blocks))
            cin = base * 2 ** i

    def forward(self, x):
        enc = []
        for e in self.encoder:
            x = e(x)
            enc.append(x)
        dec = [x]
        for i in reversed(range(len(self.decoder))):
            x = self.decoder[i](enc[i], x)
            dec.append(x)
        return dec


@pytest.mark.slow
@pytest.mark.parametrize("deconv", [False, True])
def test_unet_matches_torch_oracle(deconv):
    from aadg_tpu.models.zoo.backbones import UNetBackbone
    from tools.convert_torch_weights import convert_unet

    torch.manual_seed(0)
    tm = TUNet(deconv=deconv).eval()
    _randomize_bn(tm)
    params, stats = convert_unet(tm.state_dict(), num_stages=3)
    x_np = np.random.default_rng(5).uniform(
        -1, 1, (1, 16, 16, 3)).astype(np.float32)
    with torch.no_grad():
        feats = tm(torch.from_numpy(np.transpose(x_np, (0, 3, 1, 2))))
    fm = UNetBackbone(base_channels=8, num_stages=3, strides=(1, 1, 1),
                      enc_num_convs=(2, 2, 2), dec_num_convs=(2, 2),
                      downsamples=(True, True), enc_dilations=(1, 1, 1),
                      dec_dilations=(1, 1),
                      upsample="DeconvModule" if deconv else "InterpConv")
    _forward_compare(fm, {"params": params, "batch_stats": stats},
                     feats, x_np, atol=1e-4)


# ---------------------------------------------------------------------------
# CGNet oracle (`cgnet.py:13-336`) — trains from scratch in mmseg (no
# pretrained checkpoints), so this pins the flax MODULE semantics:
# per-channel PReLUs, CG block local/surrounding/joint/global structure,
# and the per-stage concat orders ([x, down1, inp_4x] then [down2, x]).
# ---------------------------------------------------------------------------

class TCGBlock(nn.Module):
    def __init__(self, cin, cout, dilation, reduction, downsample):
        super().__init__()
        ch = cout if downsample else cout // 2
        k, s = (3, 2) if downsample else (1, 1)
        self.conv1x1 = nn.Sequential(
            nn.Conv2d(cin, ch, k, s, (k - 1) // 2, bias=False),
            nn.BatchNorm2d(ch), nn.PReLU(ch))
        self.f_loc = nn.Conv2d(ch, ch, 3, padding=1, groups=ch, bias=False)
        self.f_sur = nn.Conv2d(ch, ch, 3, padding=dilation,
                               dilation=dilation, groups=ch, bias=False)
        self.bn = nn.BatchNorm2d(2 * ch)
        self.activate = nn.PReLU(2 * ch)
        self.bottleneck = nn.Conv2d(2 * ch, cout, 1, bias=False) \
            if downsample else None
        self.f_glo = nn.Sequential(
            nn.Linear(cout, cout // reduction), nn.ReLU(),
            nn.Linear(cout // reduction, cout), nn.Sigmoid())
        self.downsample = downsample

    def forward(self, x):
        out = self.conv1x1(x)
        joi = torch.cat([self.f_loc(out), self.f_sur(out)], 1)
        joi = self.activate(self.bn(joi))
        if self.bottleneck is not None:
            joi = self.bottleneck(joi)
        g = self.f_glo(joi.mean(dim=(2, 3)))[..., None, None]
        out = joi * g
        return out if self.downsample else x + out


class TCGNet(nn.Module):
    def __init__(self, nc=(8, 16, 32), nb=(2, 3), dil=(2, 4), red=(4, 8)):
        super().__init__()
        self.stem = nn.ModuleList()
        cur = 3
        for i in range(3):
            self.stem.append(nn.Sequential(
                nn.Conv2d(cur, nc[0], 3, 2 if i == 0 else 1, 1, bias=False),
                nn.BatchNorm2d(nc[0]), nn.PReLU(nc[0])))
            cur = nc[0]
        self.norm_prelu_0 = nn.Sequential(nn.BatchNorm2d(nc[0] + 3),
                                          nn.PReLU(nc[0] + 3))
        self.level1 = nn.ModuleList(
            [TCGBlock(nc[0] + 3 if i == 0 else nc[1], nc[1], dil[0],
                      red[0], i == 0) for i in range(nb[0])])
        self.norm_prelu_1 = nn.Sequential(nn.BatchNorm2d(2 * nc[1] + 3),
                                          nn.PReLU(2 * nc[1] + 3))
        self.level2 = nn.ModuleList(
            [TCGBlock(2 * nc[1] + 3 if i == 0 else nc[2], nc[2], dil[1],
                      red[1], i == 0) for i in range(nb[1])])
        self.norm_prelu_2 = nn.Sequential(nn.BatchNorm2d(2 * nc[2]),
                                          nn.PReLU(2 * nc[2]))

    def forward(self, x):
        pool = nn.AvgPool2d(3, stride=2, padding=1)
        inp_2x, inp_4x = pool(x), pool(pool(x))
        out = []
        for layer in self.stem:
            x = layer(x)
        x = self.norm_prelu_0(torch.cat([x, inp_2x], 1))
        out.append(x)
        for i, layer in enumerate(self.level1):
            x = layer(x)
            if i == 0:
                down1 = x
        x = self.norm_prelu_1(torch.cat([x, down1, inp_4x], 1))
        out.append(x)
        for i, layer in enumerate(self.level2):
            x = layer(x)
            if i == 0:
                down2 = x
        x = self.norm_prelu_2(torch.cat([down2, x], 1))
        out.append(x)
        return out


def _cg_w(t):
    return np.transpose(t.detach().numpy(), (2, 3, 1, 0))


def _cg_bn(m):
    return ({"scale": m.weight.detach().numpy(),
             "bias": m.bias.detach().numpy()},
            {"mean": m.running_mean.numpy(), "var": m.running_var.numpy()})


def _cg_prelu(m):
    return {"alpha": m.weight.detach().numpy()}


def _cg_block(t):
    p, s = {}, {}
    p["conv1x1"] = {"kernel": _cg_w(t.conv1x1[0].weight)}
    p["bn1"], s["bn1"] = _cg_bn(t.conv1x1[1])
    p["prelu1"] = _cg_prelu(t.conv1x1[2])
    p["floc"] = {"kernel": _cg_w(t.f_loc.weight)}
    p["fsur"] = {"kernel": _cg_w(t.f_sur.weight)}
    p["bn2"], s["bn2"] = _cg_bn(t.bn)
    p["prelu2"] = _cg_prelu(t.activate)
    if t.bottleneck is not None:
        p["reduce"] = {"kernel": _cg_w(t.bottleneck.weight)}
    p["fglo"] = {
        "fc1": {"kernel": t.f_glo[0].weight.detach().numpy().T,
                "bias": t.f_glo[0].bias.detach().numpy()},
        "fc2": {"kernel": t.f_glo[2].weight.detach().numpy().T,
                "bias": t.f_glo[2].bias.detach().numpy()}}
    return p, s


def test_cgnet_matches_torch_oracle():
    from aadg_tpu.models.zoo.backbones import CGNet

    torch.manual_seed(3)
    tm = TCGNet().eval()
    for m in tm.modules():
        if isinstance(m, nn.PReLU):
            m.weight.data.uniform_(0.1, 0.4)
    _randomize_bn(tm)

    params, stats = {}, {}
    for i in range(3):
        params[f"stem{i}"] = {"kernel": _cg_w(tm.stem[i][0].weight)}
        params[f"stem_bn{i}"], stats[f"stem_bn{i}"] = _cg_bn(tm.stem[i][1])
        params[f"stem_prelu{i}"] = _cg_prelu(tm.stem[i][2])
    for j, np_mod in enumerate([tm.norm_prelu_0, tm.norm_prelu_1,
                                tm.norm_prelu_2]):
        params[f"cat_bn{j}"], stats[f"cat_bn{j}"] = _cg_bn(np_mod[0])
        params[f"cat_prelu{j}"] = _cg_prelu(np_mod[1])
    for s_i, level in enumerate([tm.level1, tm.level2]):
        for b, blk in enumerate(level):
            name = f"stage{s_i}_down" if b == 0 else f"stage{s_i}_{b - 1}"
            params[name], stats[name] = _cg_block(blk)

    x_np = np.random.default_rng(7).uniform(
        -1, 1, (2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        feats = tm(torch.from_numpy(np.transpose(x_np, (0, 3, 1, 2))))
    model = CGNet(num_channels=(8, 16, 32), num_blocks=(2, 3),
                  dilations=(2, 4), reductions=(4, 8))
    _forward_compare(model, {"params": params, "batch_stats": stats},
                     feats, x_np, atol=2e-4)


# ---------------------------------------------------------------------------
# Fast-SCNN oracle (`fast_scnn.py:13-386`) — also trains from scratch;
# pins the LTD padding-0 first conv, the block_channels//4 PPM width with
# the 1x1 fuse, and the FFM's plain-1x1 'dwconv' + act-free projections.
# ---------------------------------------------------------------------------

class TCMod(nn.Module):
    def __init__(self, cin, cout, k, stride=1, padding=0, act=True):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, k, stride, padding, bias=False)
        self.bn = nn.BatchNorm2d(cout)
        self.act = act

    def forward(self, x):
        x = self.bn(self.conv(x))
        return F.relu(x) if self.act else x


class TDSC(nn.Module):
    def __init__(self, cin, cout, stride):
        super().__init__()
        self.depthwise = TCMod(cin, cin, 3, stride, 1)
        self.depthwise.conv = nn.Conv2d(cin, cin, 3, stride, 1,
                                        groups=cin, bias=False)
        self.pointwise = TCMod(cin, cout, 1)

    def forward(self, x):
        return self.pointwise(self.depthwise(x))


class TIRes(nn.Module):
    def __init__(self, cin, cout, stride, expand=6):
        super().__init__()
        hid = int(round(cin * expand))
        self.expand = TCMod(cin, hid, 1)
        self.dw = TCMod(hid, hid, 3, stride, 1)
        self.dw.conv = nn.Conv2d(hid, hid, 3, stride, 1, groups=hid,
                                 bias=False)
        self.project = TCMod(hid, cout, 1, act=False)
        self.res = stride == 1 and cin == cout

    def forward(self, x):
        y = self.project(F.relu6(self.dw.bn(self.dw.conv(
            F.relu6(self.expand.bn(self.expand.conv(x)))))))
        return x + y if self.res else y


class TFastSCNN(nn.Module):
    def __init__(self, dw=(8, 12), higher=16, blocks=(16, 24, 32),
                 strides=(2, 2, 1), lower=32, fusion=32, scales=(1, 2)):
        super().__init__()
        self.conv = TCMod(3, dw[0], 3, 2, 0)  # mmcv default padding 0
        self.dsconv1 = TDSC(dw[0], dw[1], 2)
        self.dsconv2 = TDSC(dw[1], higher, 2)
        layers, cin = [], higher
        for ch, st in zip(blocks, strides):
            for b in range(3):
                layers.append(TIRes(cin, ch, st if b == 0 else 1))
                cin = ch
        self.gfe = nn.ModuleList(layers)
        self.scales = scales
        self.ppm = nn.ModuleList(
            [TCMod(blocks[-1], blocks[-1] // 4, 1) for _ in scales])
        self.out = TCMod(blocks[-1] + len(scales) * (blocks[-1] // 4),
                         lower, 1)
        self.dwconv = TCMod(lower, fusion, 1)
        self.conv_lower_res = TCMod(fusion, fusion, 1, act=False)
        self.conv_higher_res = TCMod(higher, fusion, 1, act=False)

    def forward(self, x):
        x = self.dsconv2(self.dsconv1(self.conv(x)))
        higher = x
        y = x
        for m in self.gfe:
            y = m(y)
        pools = [y]
        for s, conv in zip(self.scales, self.ppm):
            p = conv(F.adaptive_avg_pool2d(y, s))
            pools.append(F.interpolate(p, size=y.shape[2:],
                                       mode="bilinear",
                                       align_corners=False))
        lower = self.out(torch.cat(pools, 1))
        up = F.interpolate(lower, size=higher.shape[2:], mode="bilinear",
                           align_corners=False)
        up = self.conv_lower_res(self.dwconv(up))
        fusion = F.relu(self.conv_higher_res(higher) + up)
        return [higher, lower, fusion]


def _cm_ps(t):
    return ({"conv": {"kernel": np.transpose(
        t.conv.weight.detach().numpy(), (2, 3, 1, 0))},
        "bn": {"scale": t.bn.weight.detach().numpy(),
               "bias": t.bn.bias.detach().numpy()}},
        {"bn": {"mean": t.bn.running_mean.numpy(),
                "var": t.bn.running_var.numpy()}})


def test_fast_scnn_matches_torch_oracle():
    from aadg_tpu.models.zoo.backbones import FastSCNN

    torch.manual_seed(4)
    tm = TFastSCNN().eval()
    _randomize_bn(tm)

    params, stats = {}, {}

    def put_cm(name, t):
        params[name], stats[name] = _cm_ps(t)

    def put_ds(name, t):
        params[name] = {
            "depthwise": {"kernel": np.transpose(
                t.depthwise.conv.weight.detach().numpy(), (2, 3, 1, 0))},
            "dw_bn": {"scale": t.depthwise.bn.weight.detach().numpy(),
                      "bias": t.depthwise.bn.bias.detach().numpy()},
            "pointwise": {"kernel": np.transpose(
                t.pointwise.conv.weight.detach().numpy(), (2, 3, 1, 0))},
            "pw_bn": {"scale": t.pointwise.bn.weight.detach().numpy(),
                      "bias": t.pointwise.bn.bias.detach().numpy()}}
        stats[name] = {
            "dw_bn": {"mean": t.depthwise.bn.running_mean.numpy(),
                      "var": t.depthwise.bn.running_var.numpy()},
            "pw_bn": {"mean": t.pointwise.bn.running_mean.numpy(),
                      "var": t.pointwise.bn.running_var.numpy()}}

    put_cm("ltd_conv", tm.conv)
    put_ds("ltd_ds1", tm.dsconv1)
    put_ds("ltd_ds2", tm.dsconv2)
    for i, blk in enumerate(tm.gfe):
        s, b = divmod(i, 3)
        name = f"gfe_{s}_{b}"
        p, st = {}, {}
        for sub, tmod in (("expand", blk.expand), ("dw", blk.dw),
                          ("project", blk.project)):
            p[sub] = {"kernel": np.transpose(
                tmod.conv.weight.detach().numpy(), (2, 3, 1, 0))}
            p[f"{sub}_bn"] = {"scale": tmod.bn.weight.detach().numpy(),
                              "bias": tmod.bn.bias.detach().numpy()}
            st[f"{sub}_bn"] = {"mean": tmod.bn.running_mean.numpy(),
                               "var": tmod.bn.running_var.numpy()}
        params[name], stats[name] = p, st
    for i, t in enumerate(tm.ppm):
        put_cm(f"ppm_{i}", t)
    put_cm("gfe_out", tm.out)
    put_cm("ffm_dwconv", tm.dwconv)
    put_cm("ffm_lower", tm.conv_lower_res)
    put_cm("ffm_higher", tm.conv_higher_res)

    x_np = np.random.default_rng(8).uniform(
        -1, 1, (2, 128, 128, 3)).astype(np.float32)
    with torch.no_grad():
        feats = tm(torch.from_numpy(np.transpose(x_np, (0, 3, 1, 2))))
    model = FastSCNN(downsample_dw_channels=(8, 12), higher_in_channels=16,
                     lower_in_channels=32, global_block_channels=(16, 24, 32),
                     fusion_out_channels=32, pool_scales=(1, 2))
    _forward_compare(model, {"params": params, "batch_stats": stats},
                     feats, x_np, atol=5e-4)
