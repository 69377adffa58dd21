"""Numeric parity, batch 2: conv/pyramid + remaining context heads vs
torch oracles.

Completes the oracle coverage started in test_torch_parity_heads.py
(EMA/DNL/DA/OCR/PSA/ANN): every other concrete decode head is pinned
against a plain-torch reconstruction of the reference's module layout and
forward math with loaded random weights (eval mode):

- FCNHead          (`models/mmseg/models/decode_heads/fcn_head.py`)
- PSPHead          (`psp_head.py`)
- ASPPHead         (`aspp_head.py`)
- DepthwiseSeparableASPPHead (`sep_aspp_head.py`)
- UPerHead         (`uper_head.py`)
- FPNHead          (`fpn_head.py`)
- LRASPPHead       (`lraspp_head.py`, incl. the AvgPool2d(49,(16,20)) gate)
- NLHead           (`nl_head.py` + mmcv NonLocal2d embedded_gaussian)
- GCHead           (`gc_head.py` + mmcv ContextBlock att/channel_add)
- CCHead           (`cc_head.py` + mmcv CrissCrossAttention semantics)
- APCHead          (`apc_head.py` ACM)
- DMHead           (`dm_head.py` DCM, fusion=False reference default)
- EncHead          (`enc_head.py` + `ops/encoding.py`)
- SegFormerHead    (`segformer_head.py` all-MLP decoder)
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp
from torch import nn
import torch.nn.functional as F

import sys, os
REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)
from aadg_tpu.models.zoo import (APCHead, ASPPHead, CCHead, DMHead, EncHead,
                                 FCNHead, FPNHead, GCHead, LRASPPHead,
                                 NLHead, PSPHead, UPerHead)
from aadg_tpu.models.zoo.heads import DepthwiseSeparableASPPHead
from aadg_tpu.models.segformer import SegFormerHead

C_IN = 32


def _w(t):
    return np.transpose(t.detach().numpy(), (2, 3, 1, 0))


def conv_p(m):
    p = {"kernel": _w(m.weight)}
    if m.bias is not None:
        p["bias"] = m.bias.detach().numpy()
    return p


def dense_p(m):
    return {"kernel": m.weight.detach().numpy().T,
            "bias": m.bias.detach().numpy()}


def bn_p(m):
    return {"scale": m.weight.detach().numpy(),
            "bias": m.bias.detach().numpy()}


def bn_s(m):
    return {"mean": m.running_mean.numpy(), "var": m.running_var.numpy()}


class CM(nn.Module):
    """mmcv ConvModule oracle: conv (no bias) + BN + optional ReLU."""

    def __init__(self, cin, cout, k, act=True, pad=None, norm=True,
                 dilation=1, bias=None):
        super().__init__()
        if pad is None:
            pad = dilation * (k - 1) // 2
        if bias is None:
            bias = not norm
        self.conv = nn.Conv2d(cin, cout, k, padding=pad, bias=bias,
                              dilation=dilation)
        self.bn = nn.BatchNorm2d(cout) if norm else None
        self.act = act

    def forward(self, x):
        x = self.conv(x)
        if self.bn is not None:
            x = self.bn(x)
        return F.relu(x) if self.act else x


class DSCM(nn.Module):
    """mmcv DepthwiseSeparableConvModule: depthwise CM + pointwise CM."""

    def __init__(self, cin, cout, k, dilation=1):
        super().__init__()
        self.depthwise = CM(cin, cin, k, dilation=dilation)
        self.depthwise.conv = nn.Conv2d(cin, cin, k,
                                        padding=dilation * (k - 1) // 2,
                                        dilation=dilation, groups=cin,
                                        bias=False)
        self.pointwise = CM(cin, cout, 1)

    def forward(self, x):
        return self.pointwise(self.depthwise(x))


def cm_params(m):
    p = {"conv": conv_p(m.conv)}
    if m.bn is not None:
        p["bn"] = bn_p(m.bn)
    return p


def cm_stats(m):
    return {"bn": bn_s(m.bn)}


def dw_w(t):
    """torch depthwise (C,1,k,k) -> flax HWIO with feature_group_count=C:
    HWIO kernel shape (k,k,1,C)."""
    return np.transpose(t.detach().numpy(), (2, 3, 1, 0))


def dscm_params(m):
    return {"depthwise": {"kernel": dw_w(m.depthwise.conv.weight)},
            "dw_bn": bn_p(m.depthwise.bn),
            "pointwise": {"kernel": _w(m.pointwise.conv.weight)},
            "pw_bn": bn_p(m.pointwise.bn)}


def dscm_stats(m):
    return {"dw_bn": bn_s(m.depthwise.bn), "pw_bn": bn_s(m.pointwise.bn)}


def _randomize(module, seed):
    torch.manual_seed(seed)
    for m in module.modules():
        if isinstance(m, (nn.Conv2d, nn.Linear)):
            m.weight.data.normal_(0, 0.2)
            if m.bias is not None:
                m.bias.data.normal_(0, 0.1)
        elif isinstance(m, (nn.BatchNorm2d, nn.BatchNorm1d)):
            m.weight.data.uniform_(0.5, 1.5)
            m.bias.data.normal_(0, 0.1)
            m.running_mean.uniform_(-0.5, 0.5)
            m.running_var.uniform_(0.5, 1.5)


def _nhwc(x_np):
    return jnp.asarray(np.transpose(x_np, (0, 2, 3, 1)))


def _check(out, torch_out, atol=2e-4):
    want = np.transpose(torch_out.detach().numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(out, np.float32), want,
                               rtol=1e-3, atol=atol)


def _x(shape, seed=0):
    return np.random.default_rng(seed).normal(0, 1, shape).astype(np.float32)


# ---------------------------------------------------------------------------
# FCNHead (`fcn_head.py`)
# ---------------------------------------------------------------------------

class TFCN(nn.Module):
    def __init__(self, cin, channels, num_classes, num_convs=2):
        super().__init__()
        convs = [CM(cin, channels, 3)]
        for _ in range(num_convs - 1):
            convs.append(CM(channels, channels, 3))
        self.convs = nn.Sequential(*convs)
        self.conv_cat = CM(cin + channels, channels, 3)
        self.conv_seg = nn.Conv2d(channels, num_classes, 1)

    def forward(self, x):
        out = self.convs(x)
        out = self.conv_cat(torch.cat([x, out], 1))
        return self.conv_seg(out)


def test_fcn_head_torch_parity():
    t = TFCN(C_IN, 24, 5)
    _randomize(t, 0)
    t.eval()
    x = _x((2, C_IN, 8, 8))
    with torch.no_grad():
        want = t(torch.from_numpy(x))
    head = FCNHead(num_classes=5, channels=24)
    params = {"convs_0": cm_params(t.convs[0]),
              "convs_1": cm_params(t.convs[1]),
              "conv_cat": cm_params(t.conv_cat),
              "cls": {"conv_seg": conv_p(t.conv_seg)}}
    stats = {"convs_0": cm_stats(t.convs[0]),
             "convs_1": cm_stats(t.convs[1]),
             "conv_cat": cm_stats(t.conv_cat)}
    out = head.apply({"params": params, "batch_stats": stats},
                     [_nhwc(x)], train=False)
    _check(out, want)


# ---------------------------------------------------------------------------
# PSPHead (`psp_head.py`)
# ---------------------------------------------------------------------------

class TPSP(nn.Module):
    def __init__(self, cin, channels, num_classes, scales=(1, 2, 3, 6)):
        super().__init__()
        self.scales = scales
        self.pools = nn.ModuleList([CM(cin, channels, 1) for _ in scales])
        self.bottleneck = CM(cin + len(scales) * channels, channels, 3)
        self.conv_seg = nn.Conv2d(channels, num_classes, 1)

    def forward(self, x):
        outs = [x]
        for s, conv in zip(self.scales, self.pools):
            p = conv(F.adaptive_avg_pool2d(x, s))
            outs.append(F.interpolate(p, size=x.shape[2:], mode="bilinear",
                                      align_corners=False))
        return self.conv_seg(self.bottleneck(torch.cat(outs, 1)))


def test_psp_head_torch_parity():
    t = TPSP(C_IN, 16, 4)
    _randomize(t, 1)
    t.eval()
    x = _x((2, C_IN, 12, 12), 1)
    with torch.no_grad():
        want = t(torch.from_numpy(x))
    head = PSPHead(num_classes=4, channels=16)
    params = {"ppm": {f"pool_{i}": cm_params(m)
                      for i, m in enumerate(t.pools)},
              "bottleneck": cm_params(t.bottleneck),
              "cls": {"conv_seg": conv_p(t.conv_seg)}}
    stats = {"ppm": {f"pool_{i}": cm_stats(m)
                     for i, m in enumerate(t.pools)},
             "bottleneck": cm_stats(t.bottleneck)}
    out = head.apply({"params": params, "batch_stats": stats},
                     [_nhwc(x)], train=False)
    _check(out, want)


# ---------------------------------------------------------------------------
# ASPPHead (`aspp_head.py`)
# ---------------------------------------------------------------------------

class TASPP(nn.Module):
    def __init__(self, cin, channels, num_classes, dilations=(1, 6, 12, 18),
                 separable=False):
        super().__init__()
        self.image_pool = CM(cin, channels, 1)
        branches = []
        for d in dilations:
            if d == 1:
                branches.append(CM(cin, channels, 1))
            elif separable:
                branches.append(DSCM(cin, channels, 3, dilation=d))
            else:
                branches.append(CM(cin, channels, 3, dilation=d))
        self.branches = nn.ModuleList(branches)
        self.bottleneck = CM((len(dilations) + 1) * channels, channels, 3)
        self.conv_seg = nn.Conv2d(channels, num_classes, 1)

    def aspp_forward(self, x):
        pool = self.image_pool(F.adaptive_avg_pool2d(x, 1))
        outs = [F.interpolate(pool, size=x.shape[2:], mode="bilinear",
                              align_corners=False)]
        outs += [b(x) for b in self.branches]
        return self.bottleneck(torch.cat(outs, 1))

    def forward(self, x):
        return self.conv_seg(self.aspp_forward(x))


def test_aspp_head_torch_parity():
    t = TASPP(C_IN, 16, 4)
    _randomize(t, 2)
    t.eval()
    x = _x((2, C_IN, 10, 10), 2)
    with torch.no_grad():
        want = t(torch.from_numpy(x))
    head = ASPPHead(num_classes=4, channels=16, dilations=(1, 6, 12, 18))
    params = {"image_pool": cm_params(t.image_pool),
              "aspp": {f"branch_{i}": cm_params(m)
                       for i, m in enumerate(t.branches)},
              "bottleneck": cm_params(t.bottleneck),
              "cls": {"conv_seg": conv_p(t.conv_seg)}}
    stats = {"image_pool": cm_stats(t.image_pool),
             "aspp": {f"branch_{i}": cm_stats(m)
                      for i, m in enumerate(t.branches)},
             "bottleneck": cm_stats(t.bottleneck)}
    out = head.apply({"params": params, "batch_stats": stats},
                     [_nhwc(x)], train=False)
    _check(out, want)


# ---------------------------------------------------------------------------
# DepthwiseSeparableASPPHead (`sep_aspp_head.py`, the DeepLabV3+ head)
# ---------------------------------------------------------------------------

class TSepASPP(TASPP):
    def __init__(self, cin, c1_in, channels, c1_channels, num_classes,
                 dilations=(1, 6, 12, 18)):
        super().__init__(cin, channels, num_classes, dilations,
                         separable=True)
        self.c1_bottleneck = CM(c1_in, c1_channels, 1)
        self.sep0 = DSCM(channels + c1_channels, channels, 3)
        self.sep1 = DSCM(channels, channels, 3)

    def forward(self, inputs):
        c1, x = inputs
        out = self.aspp_forward(x)
        c1 = self.c1_bottleneck(c1)
        out = F.interpolate(out, size=c1.shape[2:], mode="bilinear",
                            align_corners=False)
        out = self.sep1(self.sep0(torch.cat([out, c1], 1)))
        return self.conv_seg(out)


def test_sep_aspp_head_torch_parity():
    c1_in = 16
    t = TSepASPP(C_IN, c1_in, 16, 8, 4)
    _randomize(t, 3)
    t.eval()
    c1 = _x((2, c1_in, 16, 16), 30)
    x = _x((2, C_IN, 8, 8), 31)
    with torch.no_grad():
        want = t((torch.from_numpy(c1), torch.from_numpy(x)))
    head = DepthwiseSeparableASPPHead(num_classes=4, channels=16,
                                      c1_channels=8,
                                      dilations=(1, 6, 12, 18))
    aspp_p, aspp_s = {}, {}
    for i, m in enumerate(t.branches):
        if isinstance(m, DSCM):
            aspp_p[f"branch_{i}"] = dscm_params(m)
            aspp_s[f"branch_{i}"] = dscm_stats(m)
        else:
            aspp_p[f"branch_{i}"] = cm_params(m)
            aspp_s[f"branch_{i}"] = cm_stats(m)
    params = {"image_pool": cm_params(t.image_pool), "aspp": aspp_p,
              "bottleneck": cm_params(t.bottleneck),
              "c1_bottleneck": cm_params(t.c1_bottleneck),
              "sep_bottleneck_0": dscm_params(t.sep0),
              "sep_bottleneck_1": dscm_params(t.sep1),
              "cls": {"conv_seg": conv_p(t.conv_seg)}}
    stats = {"image_pool": cm_stats(t.image_pool), "aspp": aspp_s,
             "bottleneck": cm_stats(t.bottleneck),
             "c1_bottleneck": cm_stats(t.c1_bottleneck),
             "sep_bottleneck_0": dscm_stats(t.sep0),
             "sep_bottleneck_1": dscm_stats(t.sep1)}
    out = head.apply({"params": params, "batch_stats": stats},
                     [_nhwc(c1), _nhwc(x)], train=False)
    _check(out, want)


# ---------------------------------------------------------------------------
# UPerHead (`uper_head.py`)
# ---------------------------------------------------------------------------

class TUPer(nn.Module):
    def __init__(self, cins, channels, num_classes, scales=(1, 2, 3, 6)):
        super().__init__()
        self.scales = scales
        self.pools = nn.ModuleList(
            [CM(cins[-1], channels, 1) for _ in scales])
        self.psp_bottleneck = CM(cins[-1] + len(scales) * channels,
                                 channels, 3)
        self.laterals = nn.ModuleList(
            [CM(c, channels, 1) for c in cins[:-1]])
        self.fpn_convs = nn.ModuleList(
            [CM(channels, channels, 3) for _ in cins[:-1]])
        self.fpn_bottleneck = CM(len(cins) * channels, channels, 3)
        self.conv_seg = nn.Conv2d(channels, num_classes, 1)

    def forward(self, xs):
        top = xs[-1]
        outs = [top]
        for s, conv in zip(self.scales, self.pools):
            p = conv(F.adaptive_avg_pool2d(top, s))
            outs.append(F.interpolate(p, size=top.shape[2:],
                                      mode="bilinear", align_corners=False))
        psp = self.psp_bottleneck(torch.cat(outs, 1))
        laterals = [m(xs[i]) for i, m in enumerate(self.laterals)] + [psp]
        for i in range(len(laterals) - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + F.interpolate(
                laterals[i], size=laterals[i - 1].shape[2:],
                mode="bilinear", align_corners=False)
        fpn_outs = [m(laterals[i]) for i, m in enumerate(self.fpn_convs)]
        fpn_outs.append(laterals[-1])
        fpn_outs = [F.interpolate(o, size=fpn_outs[0].shape[2:],
                                  mode="bilinear", align_corners=False)
                    for o in fpn_outs]
        return self.conv_seg(self.fpn_bottleneck(torch.cat(fpn_outs, 1)))


def test_uper_head_torch_parity():
    cins = (8, 12, 16, 24)
    t = TUPer(cins, 16, 4)
    _randomize(t, 4)
    t.eval()
    xs = [_x((2, c, 16 >> i, 16 >> i), 40 + i)
          for i, c in enumerate(cins)]
    with torch.no_grad():
        want = t([torch.from_numpy(a) for a in xs])
    head = UPerHead(num_classes=4, channels=16)
    params = {"ppm": {f"pool_{i}": cm_params(m)
                      for i, m in enumerate(t.pools)},
              "psp_bottleneck": cm_params(t.psp_bottleneck),
              "fpn_bottleneck": cm_params(t.fpn_bottleneck),
              "cls": {"conv_seg": conv_p(t.conv_seg)}}
    stats = {"ppm": {f"pool_{i}": cm_stats(m)
                     for i, m in enumerate(t.pools)},
             "psp_bottleneck": cm_stats(t.psp_bottleneck),
             "fpn_bottleneck": cm_stats(t.fpn_bottleneck)}
    for i, m in enumerate(t.laterals):
        params[f"lateral_{i}"] = cm_params(m)
        stats[f"lateral_{i}"] = cm_stats(m)
    for i, m in enumerate(t.fpn_convs):
        params[f"fpn_conv_{i}"] = cm_params(m)
        stats[f"fpn_conv_{i}"] = cm_stats(m)
    out = head.apply({"params": params, "batch_stats": stats},
                     [_nhwc(a) for a in xs], train=False)
    _check(out, want)


# ---------------------------------------------------------------------------
# FPNHead (`fpn_head.py`), feature_strides (4, 8, 16, 32)
# ---------------------------------------------------------------------------

class TFPNHead(nn.Module):
    def __init__(self, cins, channels, num_classes):
        super().__init__()
        self.heads = nn.ModuleList()
        for i, c in enumerate(cins):
            mods = []
            for k in range(max(1, i)):
                mods.append(CM(c if k == 0 else channels, channels, 3))
            self.heads.append(nn.Sequential(*mods))
        self.conv_seg = nn.Conv2d(channels, num_classes, 1)
        self.ups = [max(1, i) for i in range(len(cins))]

    def forward(self, xs):
        out = None
        for i, (x, head) in enumerate(zip(xs, self.heads)):
            for mod in head:
                x = mod(x)
                if i > 0:
                    x = F.interpolate(x, scale_factor=2, mode="bilinear",
                                      align_corners=False)
            out = x if out is None else out + x
        return self.conv_seg(out)


def test_fpn_head_torch_parity():
    cins = (8, 12, 16, 24)
    t = TFPNHead(cins, 16, 4)
    _randomize(t, 5)
    t.eval()
    xs = [_x((2, c, 16 >> i, 16 >> i), 50 + i)
          for i, c in enumerate(cins)]
    with torch.no_grad():
        want = t([torch.from_numpy(a) for a in xs])
    head = FPNHead(num_classes=4, channels=16)
    params = {"cls": {"conv_seg": conv_p(t.conv_seg)}}
    stats = {}
    for i, h in enumerate(t.heads):
        for k, m in enumerate(h):
            params[f"scale_head_{i}_{k}"] = cm_params(m)
            stats[f"scale_head_{i}_{k}"] = cm_stats(m)
    out = head.apply({"params": params, "batch_stats": stats},
                     [_nhwc(a) for a in xs], train=False)
    _check(out, want)


# ---------------------------------------------------------------------------
# LRASPPHead (`lraspp_head.py`) — incl. the AvgPool2d(49, (16, 20)) gate
# ---------------------------------------------------------------------------

class TLRASPP(nn.Module):
    def __init__(self, cins, channels, branch_channels, num_classes):
        super().__init__()
        self.convs = nn.ModuleList(
            [nn.Conv2d(cins[i], bc, 1, bias=False)
             for i, bc in enumerate(branch_channels)])
        self.conv_ups = nn.ModuleList(
            [CM(channels + bc, channels, 1) for bc in branch_channels])
        self.conv_up_input = nn.Conv2d(channels, channels, 1)
        self.aspp_conv = CM(cins[-1], channels, 1)
        self.image_pool = nn.Sequential(
            nn.AvgPool2d(kernel_size=49, stride=(16, 20)),
            nn.Conv2d(cins[-1], channels, 1, bias=False))
        self.conv_seg = nn.Conv2d(channels, num_classes, 1)

    def forward(self, xs):
        x = xs[-1]
        gate = torch.sigmoid(self.image_pool(x))
        x = self.aspp_conv(x) * F.interpolate(
            gate, size=x.shape[2:], mode="bilinear", align_corners=False)
        x = self.conv_up_input(x)
        for i in range(len(self.convs) - 1, -1, -1):
            x = F.interpolate(x, size=xs[i].shape[2:], mode="bilinear",
                              align_corners=False)
            x = torch.cat([x, self.convs[i](xs[i])], 1)
            x = self.conv_ups[i](x)
        return self.conv_seg(x)


def test_lraspp_head_torch_parity():
    cins = (8, 12, 16)
    t = TLRASPP(cins, 16, (4, 6), 4)
    _randomize(t, 6)
    t.eval()
    # last stage >= 49x49 so the reference's sliding AvgPool2d is active
    xs = [_x((1, 8, 104, 120), 60), _x((1, 12, 52, 60), 61),
          _x((1, 16, 52, 60), 62)]
    with torch.no_grad():
        want = t([torch.from_numpy(a) for a in xs])
    head = LRASPPHead(num_classes=4, channels=16, branch_channels=(4, 6))
    params = {"image_pool": {"conv": conv_p(t.image_pool[1])},
              "aspp_conv": cm_params(t.aspp_conv),
              "conv_up_input": conv_p(t.conv_up_input),
              "cls": {"conv_seg": conv_p(t.conv_seg)}}
    stats = {"aspp_conv": cm_stats(t.aspp_conv)}
    for i in range(2):
        params[f"convs_{i}"] = {"kernel": _w(t.convs[i].weight)}
        params[f"conv_ups_{i}"] = cm_params(t.conv_ups[i])
        stats[f"conv_ups_{i}"] = cm_stats(t.conv_ups[i])
    out = head.apply({"params": params, "batch_stats": stats},
                     [_nhwc(a) for a in xs], train=False)
    _check(out, want)


# ---------------------------------------------------------------------------
# NLHead (`nl_head.py` + mmcv NonLocal2d, embedded_gaussian)
# ---------------------------------------------------------------------------

class TNL(nn.Module):
    def __init__(self, cin, channels, num_classes, reduction=2):
        super().__init__()
        inter = max(channels // reduction, 1)
        self.inter = inter
        self.convs0 = CM(cin, channels, 3)
        self.theta = nn.Conv2d(channels, inter, 1)
        self.phi = nn.Conv2d(channels, inter, 1)
        self.g = nn.Conv2d(channels, inter, 1)
        self.conv_out = CM(inter, channels, 1, act=False)
        self.convs1 = CM(channels, channels, 3)
        self.conv_cat = CM(cin + channels, channels, 3)
        self.conv_seg = nn.Conv2d(channels, num_classes, 1)

    def forward(self, x):
        out = self.convs0(x)
        n, c, h, w = out.shape
        g_x = self.g(out).view(n, self.inter, -1).permute(0, 2, 1)
        theta_x = self.theta(out).view(n, self.inter, -1).permute(0, 2, 1)
        phi_x = self.phi(out).view(n, self.inter, -1)
        pw = torch.matmul(theta_x, phi_x) / self.inter ** 0.5
        pw = pw.softmax(dim=-1)
        y = torch.matmul(pw, g_x).permute(0, 2, 1).reshape(
            n, self.inter, h, w)
        out = out + self.conv_out(y)
        out = self.convs1(out)
        out = self.conv_cat(torch.cat([x, out], 1))
        return self.conv_seg(out)


def test_nl_head_torch_parity():
    t = TNL(C_IN, 24, 5)
    _randomize(t, 7)
    t.eval()
    x = _x((2, C_IN, 8, 8), 7)
    with torch.no_grad():
        want = t(torch.from_numpy(x))
    head = NLHead(num_classes=5, channels=24)
    params = {"convs_0": cm_params(t.convs0),
              "convs_1": cm_params(t.convs1),
              "conv_cat": cm_params(t.conv_cat),
              "theta": conv_p(t.theta), "phi": conv_p(t.phi),
              "g": conv_p(t.g), "conv_out": cm_params(t.conv_out),
              "cls": {"conv_seg": conv_p(t.conv_seg)}}
    stats = {"convs_0": cm_stats(t.convs0), "convs_1": cm_stats(t.convs1),
             "conv_cat": cm_stats(t.conv_cat),
             "conv_out": cm_stats(t.conv_out)}
    out = head.apply({"params": params, "batch_stats": stats},
                     [_nhwc(x)], train=False)
    _check(out, want)


# ---------------------------------------------------------------------------
# GCHead (`gc_head.py` + mmcv ContextBlock: att pooling, channel_add)
# ---------------------------------------------------------------------------

class TGC(nn.Module):
    def __init__(self, cin, channels, num_classes, ratio=0.25):
        super().__init__()
        planes = int(channels * ratio)
        self.convs0 = CM(cin, channels, 3)
        self.conv_mask = nn.Conv2d(channels, 1, 1)
        self.channel_add = nn.Sequential(
            nn.Conv2d(channels, planes, 1),
            nn.LayerNorm([planes, 1, 1]), nn.ReLU(),
            nn.Conv2d(planes, channels, 1))
        self.convs1 = CM(channels, channels, 3)
        self.conv_cat = CM(cin + channels, channels, 3)
        self.conv_seg = nn.Conv2d(channels, num_classes, 1)

    def forward(self, x):
        out = self.convs0(x)
        n, c, h, w = out.shape
        inp = out.view(n, 1, c, h * w)
        mask = self.conv_mask(out).view(n, 1, h * w).softmax(dim=2)
        ctx = torch.matmul(inp, mask.unsqueeze(-1)).view(n, c, 1, 1)
        out = out + self.channel_add(ctx)
        out = self.convs1(out)
        out = self.conv_cat(torch.cat([x, out], 1))
        return self.conv_seg(out)


def test_gc_head_torch_parity():
    t = TGC(C_IN, 24, 5)
    _randomize(t, 8)
    # LayerNorm params get default init; randomize them too
    ln = t.channel_add[1]
    ln.weight.data.uniform_(0.5, 1.5)
    ln.bias.data.normal_(0, 0.1)
    t.eval()
    x = _x((2, C_IN, 8, 8), 8)
    with torch.no_grad():
        want = t(torch.from_numpy(x))
    head = GCHead(num_classes=5, channels=24)
    params = {"convs_0": cm_params(t.convs0),
              "convs_1": cm_params(t.convs1),
              "conv_cat": cm_params(t.conv_cat),
              "conv_mask": conv_p(t.conv_mask),
              "channel_add_0": conv_p(t.channel_add[0]),
              "channel_add_ln": {
                  "scale": ln.weight.detach().numpy().reshape(-1),
                  "bias": ln.bias.detach().numpy().reshape(-1)},
              "channel_add_1": conv_p(t.channel_add[3]),
              "cls": {"conv_seg": conv_p(t.conv_seg)}}
    stats = {"convs_0": cm_stats(t.convs0), "convs_1": cm_stats(t.convs1),
             "conv_cat": cm_stats(t.conv_cat)}
    out = head.apply({"params": params, "batch_stats": stats},
                     [_nhwc(x)], train=False)
    _check(out, want)


# ---------------------------------------------------------------------------
# CCHead (`cc_head.py` + mmcv CrissCrossAttention semantics: -inf diagonal
# on the column branch, joint softmax over H+W, gamma-scaled residual)
# ---------------------------------------------------------------------------

class TCC(nn.Module):
    def __init__(self, cin, channels, num_classes, recurrence=2):
        super().__init__()
        self.recurrence = recurrence
        self.convs0 = CM(cin, channels, 3)
        self.query_conv = nn.Conv2d(channels, channels // 8, 1)
        self.key_conv = nn.Conv2d(channels, channels // 8, 1)
        self.value_conv = nn.Conv2d(channels, channels, 1)
        self.gamma = nn.Parameter(torch.tensor(0.7))
        self.convs1 = CM(channels, channels, 3)
        self.conv_cat = CM(cin + channels, channels, 3)
        self.conv_seg = nn.Conv2d(channels, num_classes, 1)

    def cca(self, x):
        B, C, H, W = x.shape
        q = self.query_conv(x)
        k = self.key_conv(x)
        v = self.value_conv(x)
        neg_inf = torch.diag(
            torch.full((H,), -float("inf"))).view(1, H, 1, H)
        energy_h = torch.einsum("bchw,bciw->bhwi", q, k) + neg_inf
        energy_w = torch.einsum("bchw,bchj->bhwj", q, k)
        attn = F.softmax(torch.cat([energy_h, energy_w], dim=-1), dim=-1)
        out = torch.einsum("bciw,bhwi->bchw", v, attn[..., :H])
        out = out + torch.einsum("bchj,bhwj->bchw", v, attn[..., H:])
        return self.gamma * out + x

    def forward(self, x):
        out = self.convs0(x)
        for _ in range(self.recurrence):
            out = self.cca(out)
        out = self.convs1(out)
        out = self.conv_cat(torch.cat([x, out], 1))
        return self.conv_seg(out)


def test_cc_head_torch_parity():
    t = TCC(C_IN, 24, 5)
    _randomize(t, 9)
    t.eval()
    x = _x((2, C_IN, 7, 9), 9)
    with torch.no_grad():
        want = t(torch.from_numpy(x))
    head = CCHead(num_classes=5, channels=24)
    params = {"convs_0": cm_params(t.convs0),
              "convs_1": cm_params(t.convs1),
              "conv_cat": cm_params(t.conv_cat),
              "cca": {"query": conv_p(t.query_conv),
                      "key": conv_p(t.key_conv),
                      "value": conv_p(t.value_conv),
                      "gamma": np.float32(0.7)},
              "cls": {"conv_seg": conv_p(t.conv_seg)}}
    stats = {"convs_0": cm_stats(t.convs0), "convs_1": cm_stats(t.convs1),
             "conv_cat": cm_stats(t.conv_cat)}
    out = head.apply({"params": params, "batch_stats": stats},
                     [_nhwc(x)], train=False)
    _check(out, want)


# ---------------------------------------------------------------------------
# APCHead (`apc_head.py` ACM pyramid, fusion=True default)
# ---------------------------------------------------------------------------

class TACM(nn.Module):
    def __init__(self, cin, channels, pool_scale, fusion=True):
        super().__init__()
        self.pool_scale = pool_scale
        self.pooled_redu_conv = CM(cin, channels, 1)
        self.input_redu_conv = CM(cin, channels, 1)
        self.global_info = CM(channels, channels, 1)
        self.gla = nn.Conv2d(channels, pool_scale ** 2, 1)
        self.residual_conv = CM(channels, channels, 1)
        self.fusion_conv = CM(channels, channels, 1) if fusion else None

    def forward(self, x):
        pooled = self.pooled_redu_conv(
            F.adaptive_avg_pool2d(x, self.pool_scale))
        x = self.input_redu_conv(x)
        n, c, h, w = x.shape
        pooled = pooled.view(n, c, -1).permute(0, 2, 1)
        gi = F.interpolate(
            self.global_info(F.adaptive_avg_pool2d(x, 1)),
            size=x.shape[2:], mode="bilinear", align_corners=False)
        aff = torch.sigmoid(self.gla(x + gi).permute(0, 2, 3, 1).reshape(
            n, -1, self.pool_scale ** 2))
        z = torch.matmul(aff, pooled).permute(0, 2, 1).reshape(n, c, h, w)
        z = F.relu(self.residual_conv(z) + x)
        if self.fusion_conv is not None:
            z = self.fusion_conv(z)
        return z


class TAPC(nn.Module):
    def __init__(self, cin, channels, num_classes, scales=(1, 2, 3, 6)):
        super().__init__()
        self.acms = nn.ModuleList([TACM(cin, channels, s) for s in scales])
        self.bottleneck = CM(cin + len(scales) * channels, channels, 3)
        self.conv_seg = nn.Conv2d(channels, num_classes, 1)

    def forward(self, x):
        outs = [x] + [m(x) for m in self.acms]
        return self.conv_seg(self.bottleneck(torch.cat(outs, 1)))


def _acm_maps(m):
    p = {"pooled_redu_conv": cm_params(m.pooled_redu_conv),
         "input_redu_conv": cm_params(m.input_redu_conv),
         "global_info": cm_params(m.global_info),
         "gla": conv_p(m.gla),
         "residual_conv": cm_params(m.residual_conv)}
    s = {"pooled_redu_conv": cm_stats(m.pooled_redu_conv),
         "input_redu_conv": cm_stats(m.input_redu_conv),
         "global_info": cm_stats(m.global_info),
         "residual_conv": cm_stats(m.residual_conv)}
    if m.fusion_conv is not None:
        p["fusion_conv"] = cm_params(m.fusion_conv)
        s["fusion_conv"] = cm_stats(m.fusion_conv)
    return p, s


def test_apc_head_torch_parity():
    t = TAPC(C_IN, 16, 4)
    _randomize(t, 10)
    t.eval()
    x = _x((2, C_IN, 10, 10), 10)
    with torch.no_grad():
        want = t(torch.from_numpy(x))
    head = APCHead(num_classes=4, channels=16)
    params = {"bottleneck": cm_params(t.bottleneck),
              "cls": {"conv_seg": conv_p(t.conv_seg)}}
    stats = {"bottleneck": cm_stats(t.bottleneck)}
    for s, m in zip((1, 2, 3, 6), t.acms):
        p_, s_ = _acm_maps(m)
        params[f"acm_{s}"] = p_
        stats[f"acm_{s}"] = s_
    out = head.apply({"params": params, "batch_stats": stats},
                     [_nhwc(x)], train=False)
    _check(out, want)


# ---------------------------------------------------------------------------
# DMHead (`dm_head.py` DCM pyramid, fusion=False reference default)
# ---------------------------------------------------------------------------

class TDCM(nn.Module):
    def __init__(self, cin, channels, filter_size):
        super().__init__()
        self.filter_size = filter_size
        self.filter_gen_conv = nn.Conv2d(cin, channels, 1)
        self.input_redu_conv = CM(cin, channels, 1)
        self.norm = nn.BatchNorm2d(channels)

    def forward(self, x):
        k = self.filter_size
        filt = self.filter_gen_conv(F.adaptive_avg_pool2d(x, k))
        x = self.input_redu_conv(x)
        b, c, h, w = x.shape
        x = x.reshape(1, b * c, h, w)
        filt = filt.reshape(b * c, 1, k, k)
        pad = (k - 1) // 2
        p2d = (pad, pad, pad, pad) if (k - 1) % 2 == 0 else \
            (pad + 1, pad, pad + 1, pad)
        x = F.pad(x, p2d)
        out = F.conv2d(x, filt, groups=b * c).view(b, c, h, w)
        return F.relu(self.norm(out))


class TDM(nn.Module):
    def __init__(self, cin, channels, num_classes, sizes=(1, 3, 5, 7)):
        super().__init__()
        self.dcms = nn.ModuleList([TDCM(cin, channels, k) for k in sizes])
        self.bottleneck = CM(cin + len(sizes) * channels, channels, 3)
        self.conv_seg = nn.Conv2d(channels, num_classes, 1)

    def forward(self, x):
        outs = [x] + [m(x) for m in self.dcms]
        return self.conv_seg(self.bottleneck(torch.cat(outs, 1)))


def test_dm_head_torch_parity():
    t = TDM(C_IN, 16, 4)
    _randomize(t, 11)
    t.eval()
    x = _x((2, C_IN, 10, 10), 11)
    with torch.no_grad():
        want = t(torch.from_numpy(x))
    head = DMHead(num_classes=4, channels=16)
    params = {"bottleneck": cm_params(t.bottleneck),
              "cls": {"conv_seg": conv_p(t.conv_seg)}}
    stats = {"bottleneck": cm_stats(t.bottleneck)}
    for k, m in zip((1, 3, 5, 7), t.dcms):
        params[f"dcm_{k}"] = {
            "filter_gen_conv": conv_p(m.filter_gen_conv),
            "input_redu_conv": cm_params(m.input_redu_conv),
            "norm": bn_p(m.norm)}
        stats[f"dcm_{k}"] = {"input_redu_conv": cm_stats(m.input_redu_conv),
                             "norm": bn_s(m.norm)}
    out = head.apply({"params": params, "batch_stats": stats},
                     [_nhwc(x)], train=False)
    _check(out, want)


# ---------------------------------------------------------------------------
# EncHead (`enc_head.py` + `ops/encoding.py`)
# ---------------------------------------------------------------------------

class TEnc(nn.Module):
    def __init__(self, cin, channels, num_codes, num_classes):
        super().__init__()
        self.num_codes = num_codes
        self.bottleneck = CM(cin, channels, 3)
        self.encoding_project = CM(channels, channels, 1)
        self.codewords = nn.Parameter(
            torch.empty(num_codes, channels).uniform_(-0.1, 0.1))
        self.scale = nn.Parameter(
            torch.empty(num_codes).uniform_(-1, 0))
        self.enc_bn = nn.BatchNorm1d(num_codes)
        self.fc = nn.Linear(channels, channels)
        self.se_layer = nn.Linear(channels, num_classes)
        self.conv_seg = nn.Conv2d(channels, num_classes, 1)

    def forward(self, x):
        feat = self.bottleneck(x)
        proj = self.encoding_project(feat)
        b, c = proj.shape[:2]
        flat = proj.view(b, c, -1).transpose(1, 2)           # (b, n, c)
        resid = flat.unsqueeze(2) - self.codewords.view(1, 1, -1, c)
        dist = self.scale.view(1, 1, -1) * resid.pow(2).sum(3)
        assign = F.softmax(dist, dim=2)                       # (b, n, K)
        encoded = (assign.unsqueeze(3) * resid).sum(1)        # (b, K, c)
        encoded = F.relu(self.enc_bn(encoded))
        enc_feat = encoded.mean(dim=1)
        gamma = torch.sigmoid(self.fc(enc_feat))
        out = F.relu(feat + feat * gamma.view(b, c, 1, 1))
        return self.conv_seg(out), self.se_layer(enc_feat)


def test_enc_head_torch_parity():
    t = TEnc(C_IN, 16, 8, 4)
    _randomize(t, 12)
    t.eval()
    x = _x((2, C_IN, 8, 8), 12)
    with torch.no_grad():
        want, want_se = t(torch.from_numpy(x))
    head = EncHead(num_classes=4, channels=16, num_codes=8,
                   in_index=(0,))
    params = {"bottleneck": cm_params(t.bottleneck),
              "encoding_project": cm_params(t.encoding_project),
              "codewords": t.codewords.detach().numpy(),
              "scale": t.scale.detach().numpy(),
              "enc_bn": bn_p(t.enc_bn),
              "fc": dense_p(t.fc),
              "se_layer": dense_p(t.se_layer),
              "cls": {"conv_seg": conv_p(t.conv_seg)}}
    stats = {"bottleneck": cm_stats(t.bottleneck),
             "encoding_project": cm_stats(t.encoding_project),
             "enc_bn": bn_s(t.enc_bn)}
    out, se = head.apply({"params": params, "batch_stats": stats},
                         [_nhwc(x)], train=False, return_se=True)
    _check(out, want)
    np.testing.assert_allclose(np.asarray(se, np.float32),
                               want_se.detach().numpy(),
                               rtol=1e-3, atol=2e-4)


# ---------------------------------------------------------------------------
# SegFormerHead (`segformer_head.py` all-MLP decoder)
# ---------------------------------------------------------------------------

class TSegFormerHead(nn.Module):
    def __init__(self, cins, embed_dim, num_classes):
        super().__init__()
        self.linears = nn.ModuleList(
            [nn.Linear(c, embed_dim) for c in cins])
        self.fuse = CM(embed_dim * len(cins), embed_dim, 1)
        self.pred = nn.Conv2d(embed_dim, num_classes, 1)

    def forward(self, xs):
        outs = []
        for x, lin in zip(xs, self.linears):
            n, _, h, w = x.shape
            y = lin(x.flatten(2).transpose(1, 2)).permute(0, 2, 1).reshape(
                n, -1, h, w)
            if h != xs[0].shape[2]:
                y = F.interpolate(y, size=xs[0].shape[2:], mode="bilinear",
                                  align_corners=False)
            outs.append(y)
        return self.pred(self.fuse(torch.cat(outs[::-1], 1)))


def test_segformer_head_torch_parity():
    cins = (8, 12, 16, 24)
    t = TSegFormerHead(cins, 16, 4)
    _randomize(t, 13)
    t.eval()
    xs = [_x((2, c, 16 >> i, 16 >> i), 70 + i)
          for i, c in enumerate(cins)]
    with torch.no_grad():
        want = t([torch.from_numpy(a) for a in xs])
    head = SegFormerHead(num_classes=4, embed_dim=16)
    params = {f"linear_c{i + 1}": dense_p(t.linears[i]) for i in range(4)}
    params["linear_fuse"] = {"kernel": _w(t.fuse.conv.weight)}
    params["BatchNorm_0"] = bn_p(t.fuse.bn)
    params["linear_pred"] = conv_p(t.pred)
    stats = {"BatchNorm_0": bn_s(t.fuse.bn)}
    out = head.apply({"params": params, "batch_stats": stats},
                     [_nhwc(a) for a in xs], train=False)
    _check(out, want)


# ---------------------------------------------------------------------------
# FPN neck (`necks/fpn.py`) — nearest top-down upsample (mmdet default)
# ---------------------------------------------------------------------------

class TFPNNeck(nn.Module):
    def __init__(self, cins, channels, num_outs):
        super().__init__()
        self.lateral_convs = nn.ModuleList(
            [nn.Conv2d(c, channels, 1) for c in cins])
        self.fpn_convs = nn.ModuleList(
            [nn.Conv2d(channels, channels, 3, padding=1) for _ in cins])
        self.num_outs = num_outs

    def forward(self, xs):
        laterals = [m(xs[i]) for i, m in enumerate(self.lateral_convs)]
        for i in range(len(laterals) - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + F.interpolate(
                laterals[i], size=laterals[i - 1].shape[2:], mode="nearest")
        outs = [m(laterals[i]) for i, m in enumerate(self.fpn_convs)]
        while len(outs) < self.num_outs:
            outs.append(F.max_pool2d(outs[-1], 1, stride=2))
        return outs


def test_fpn_neck_torch_parity():
    from aadg_tpu.models.zoo.necks import FPN

    cins = (8, 12, 16, 24)
    t = TFPNNeck(cins, 16, 5)
    _randomize(t, 21)
    t.eval()
    # odd sizes so a wrong (bilinear / half-pixel) upsample cannot pass
    xs = [_x((2, c, s, s), 80 + i) for i, (c, s) in
          enumerate(zip(cins, (21, 11, 6, 3)))]
    with torch.no_grad():
        want = t([torch.from_numpy(a) for a in xs])
    neck = FPN(out_channels=16, num_outs=5)
    params = {}
    for i in range(4):
        params[f"lateral_{i}"] = conv_p(t.lateral_convs[i])
        params[f"fpn_conv_{i}"] = conv_p(t.fpn_convs[i])
    outs = neck.apply({"params": params}, [_nhwc(a) for a in xs],
                      train=False)
    assert len(outs) == 5
    for got, w in zip(outs, want):
        _check(got, w)
