"""Numeric parity: attention decode heads vs torch oracles.

Same method as test_torch_parity_zoo.py (backbones): each oracle
reconstructs the reference head's module layout + forward math in plain
torch (mmcv ConvModule = conv+BN+ReLU) with random weights, the weights are
mapped into the flax head's param tree, and eval-mode forwards are
compared. Covers the heads the round-2 verdict flagged as
behavioral-test-only:

- EMAHead   (`models/mmseg/models/decode_heads/ema_head.py`)
- OCRHead   (`ocr_head.py` + `utils/self_attention_block.py`)
- DNLHead   (`dnl_head.py` + mmcv NonLocal2d)
- DAHead    (`da_head.py`)
- PSAHead   (`psa_head.py` + mmcv PSAMask), local-mask bi-direction with
  shrink_factor=2 and the 1x1-conv-padding-1 proj quirk
- ANNHead   (`ann_head.py` AFNB/APNB + PPMConcat)
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
from aadg_tpu.models.zoo import (ANNHead, DAHead, DNLHead, EMAHead, OCRHead,
                                 PSAHead)

C_IN = 32


def _w(t):
    """torch conv weight OIHW -> flax HWIO."""
    return np.transpose(t.detach().numpy(), (2, 3, 1, 0))


def conv_p(m):
    p = {"kernel": _w(m.weight)}
    if m.bias is not None:
        p["bias"] = m.bias.detach().numpy()
    return p


def bn_p(m):
    return {"scale": m.weight.detach().numpy(),
            "bias": m.bias.detach().numpy()}


def bn_s(m):
    return {"mean": m.running_mean.numpy(), "var": m.running_var.numpy()}


class CM(nn.Module):
    """mmcv ConvModule oracle: conv (no bias) + BN + optional ReLU."""

    def __init__(self, cin, cout, k, act=True, pad=None, norm=True):
        super().__init__()
        if pad is None:
            pad = k // 2
        self.conv = nn.Conv2d(cin, cout, k, padding=pad, bias=not norm)
        self.bn = nn.BatchNorm2d(cout) if norm else None
        self.act = act

    def forward(self, x):
        x = self.conv(x)
        if self.bn is not None:
            x = self.bn(x)
        return F.relu(x) if self.act else x


def cm_params(m):
    return {"conv": conv_p(m.conv), "bn": bn_p(m.bn)}


def _randomize(module, seed):
    torch.manual_seed(seed)
    for m in module.modules():
        if isinstance(m, nn.Conv2d):
            m.weight.data.normal_(0, 0.2)
            if m.bias is not None:
                m.bias.data.normal_(0, 0.1)
        elif isinstance(m, (nn.BatchNorm2d, nn.BatchNorm1d)):
            m.weight.data.uniform_(0.5, 1.5)
            m.bias.data.normal_(0, 0.1)
            m.running_mean.uniform_(-0.5, 0.5)
            m.running_var.uniform_(0.5, 1.5)


def _compare(flax_head, variables, torch_out, x_np, extra_args=(),
             atol=2e-4):
    out = flax_head.apply(
        variables, [jnp.asarray(np.transpose(x_np, (0, 2, 3, 1)))],
        *extra_args, train=False)
    want = np.transpose(torch_out.detach().numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(out, np.float32), want,
                               rtol=1e-3, atol=atol)


# ---------------------------------------------------------------------------
# EMAHead oracle (`ema_head.py`)
# ---------------------------------------------------------------------------

class TEMAHead(nn.Module):
    def __init__(self, cin, channels, ema_channels, num_bases, num_stages,
                 num_classes):
        super().__init__()
        self.num_stages = num_stages
        bases = torch.zeros(1, ema_channels, num_bases).normal_(
            0, (2.0 / num_bases) ** 0.5)
        self.register_buffer("bases", F.normalize(bases, dim=1, p=2))
        self.ema_in_conv = CM(cin, ema_channels, 3)
        self.ema_mid_conv = nn.Conv2d(ema_channels, ema_channels, 1)
        self.ema_out_conv = CM(ema_channels, ema_channels, 1, act=False)
        self.bottleneck = CM(ema_channels, channels, 3)
        self.conv_cat = CM(cin + channels, channels, 3)
        self.conv_seg = nn.Conv2d(channels, num_classes, 1)

    def forward(self, x):
        feats = self.ema_in_conv(x)
        identity = feats
        feats = self.ema_mid_conv(feats)
        n, c, h, w = feats.shape
        feats = feats.view(n, c, h * w)
        bases = self.bases.repeat(n, 1, 1)
        with torch.no_grad():
            for _ in range(self.num_stages):
                attention = torch.einsum("bcn,bck->bnk", feats, bases)
                attention = F.softmax(attention, dim=2)
                attention_normed = F.normalize(attention, dim=1, p=1)
                bases = torch.einsum("bcn,bnk->bck", feats,
                                     attention_normed)
                bases = F.normalize(bases, dim=1, p=2)
        recon = torch.einsum("bck,bnk->bcn", bases, attention)
        recon = recon.view(n, c, h, w)
        recon = F.relu(recon)
        recon = self.ema_out_conv(recon)
        out = F.relu(identity + recon)
        out = self.bottleneck(out)
        out = self.conv_cat(torch.cat([x, out], dim=1))
        return self.conv_seg(out)


def test_ema_head_torch_parity():
    t = TEMAHead(C_IN, channels=24, ema_channels=16, num_bases=8,
                 num_stages=3, num_classes=5)
    _randomize(t, 0)
    t.eval()
    x = np.random.default_rng(0).normal(
        0, 1, (2, C_IN, 8, 8)).astype(np.float32)
    with torch.no_grad():
        want = t(torch.from_numpy(x))

    head = EMAHead(num_classes=5, channels=24, ema_channels=16, num_bases=8,
                   num_stages=3)
    params = {
        "ema_in_conv": cm_params(t.ema_in_conv),
        "ema_mid_conv": conv_p(t.ema_mid_conv),
        "ema_out_conv": cm_params(t.ema_out_conv),
        "bottleneck": cm_params(t.bottleneck),
        "conv_cat": cm_params(t.conv_cat),
        "cls": {"conv_seg": conv_p(t.conv_seg)},
    }
    stats = {
        "ema_in_conv": {"bn": bn_s(t.ema_in_conv.bn)},
        "ema_out_conv": {"bn": bn_s(t.ema_out_conv.bn)},
        "bottleneck": {"bn": bn_s(t.bottleneck.bn)},
        "conv_cat": {"bn": bn_s(t.conv_cat.bn)},
        "bases": t.bases[0].numpy(),  # (c, k)
    }
    _compare(head, {"params": params, "batch_stats": stats}, want, x)


def test_ema_head_momentum_update_renormalizes():
    """Train-mode base update: mean over batch, L2-renormalized BEFORE the
    EMA blend (`ema_head.py:68-73`) — stored bases stay unit-norm-blended."""
    head = EMAHead(num_classes=3, channels=8, ema_channels=8, num_bases=4,
                   num_stages=2, dropout_ratio=0.0)
    x = [jnp.asarray(np.random.default_rng(1).normal(
        0, 1, (2, 6, 6, 8)).astype(np.float32))]
    v = head.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    before = np.asarray(v["batch_stats"]["bases"])
    _, mut = head.apply(v, x, train=True, mutable=["batch_stats"],
                        rngs={"dropout": jax.random.PRNGKey(1)})
    after = np.asarray(mut["batch_stats"]["bases"])
    assert not np.allclose(before, after)
    # after = 0.9*before + 0.1*unit_norm_mean => the update increment
    # has unit-norm columns
    inc = (after - 0.9 * before) / 0.1
    np.testing.assert_allclose(np.linalg.norm(inc, axis=0),
                               np.ones(4), rtol=1e-4)


# ---------------------------------------------------------------------------
# DNLHead oracle (`dnl_head.py` + mmcv NonLocal2d layout)
# ---------------------------------------------------------------------------

class TDNLHead(nn.Module):
    def __init__(self, cin, channels, num_classes, reduction=2,
                 temperature=0.05):
        super().__init__()
        inter = channels // reduction
        self.temperature = temperature
        self.inter = inter
        self.convs0 = CM(cin, channels, 3)
        self.convs1 = CM(channels, channels, 3)
        self.conv_cat = CM(cin + channels, channels, 3)
        self.g = nn.Conv2d(channels, inter, 1)
        self.theta = nn.Conv2d(channels, inter, 1)
        self.phi = nn.Conv2d(channels, inter, 1)
        self.conv_out = CM(inter, channels, 1, act=False)
        self.conv_mask = nn.Conv2d(channels, 1, 1)
        self.conv_seg = nn.Conv2d(channels, num_classes, 1)

    def dnl(self, x):
        n = x.size(0)
        g_x = self.g(x).view(n, self.inter, -1).permute(0, 2, 1)
        theta_x = self.theta(x).view(n, self.inter, -1).permute(0, 2, 1)
        phi_x = self.phi(x).view(n, self.inter, -1)
        theta_x = theta_x - theta_x.mean(dim=-2, keepdim=True)
        phi_x = phi_x - phi_x.mean(dim=-1, keepdim=True)
        pw = torch.matmul(theta_x, phi_x)
        pw = pw / theta_x.shape[-1] ** 0.5
        pw = (pw / self.temperature).softmax(dim=-1)
        y = torch.matmul(pw, g_x)
        y = y.permute(0, 2, 1).reshape(n, self.inter, *x.shape[2:])
        unary = self.conv_mask(x).view(n, 1, -1).softmax(dim=-1)
        unary_x = torch.matmul(unary, g_x).permute(0, 2, 1).reshape(
            n, self.inter, 1, 1)
        return x + self.conv_out(y + unary_x)

    def forward(self, x):
        out = self.convs0(x)
        out = self.dnl(out)
        out = self.convs1(out)
        out = self.conv_cat(torch.cat([x, out], dim=1))
        return self.conv_seg(out)


def test_dnl_head_torch_parity():
    t = TDNLHead(C_IN, channels=16, num_classes=4)
    _randomize(t, 1)
    t.eval()
    x = np.random.default_rng(2).normal(
        0, 1, (2, C_IN, 8, 8)).astype(np.float32)
    with torch.no_grad():
        want = t(torch.from_numpy(x))

    head = DNLHead(num_classes=4, channels=16)
    params = {
        "convs_0": cm_params(t.convs0),
        "convs_1": cm_params(t.convs1),
        "conv_cat": cm_params(t.conv_cat),
        "g": conv_p(t.g), "theta": conv_p(t.theta), "phi": conv_p(t.phi),
        "conv_mask": conv_p(t.conv_mask),
        "conv_out": cm_params(t.conv_out),
        "cls": {"conv_seg": conv_p(t.conv_seg)},
    }
    stats = {
        "convs_0": {"bn": bn_s(t.convs0.bn)},
        "convs_1": {"bn": bn_s(t.convs1.bn)},
        "conv_cat": {"bn": bn_s(t.conv_cat.bn)},
        "conv_out": {"bn": bn_s(t.conv_out.bn)},
    }
    _compare(head, {"params": params, "batch_stats": stats}, want, x)


# ---------------------------------------------------------------------------
# DAHead oracle (`da_head.py`)
# ---------------------------------------------------------------------------

class TDAHead(nn.Module):
    def __init__(self, cin, channels, num_classes, pam_channels):
        super().__init__()
        self.pam_in_conv = CM(cin, channels, 3)
        self.pam_query = nn.Conv2d(channels, pam_channels, 1)
        self.pam_key = nn.Conv2d(channels, pam_channels, 1)
        self.pam_value = nn.Conv2d(channels, channels, 1)
        self.pam_gamma = nn.Parameter(torch.tensor(0.3))
        self.pam_out_conv = CM(channels, channels, 3)
        self.cam_in_conv = CM(cin, channels, 3)
        self.cam_gamma = nn.Parameter(torch.tensor(-0.2))
        self.cam_out_conv = CM(channels, channels, 3)
        self.conv_seg = nn.Conv2d(channels, num_classes, 1)
        self.pam_conv_seg = nn.Conv2d(channels, num_classes, 1)
        self.cam_conv_seg = nn.Conv2d(channels, num_classes, 1)

    def forward(self, x):
        p = self.pam_in_conv(x)
        n, c, h, w = p.shape
        q = self.pam_query(p).view(n, -1, h * w).permute(0, 2, 1)
        k = self.pam_key(p).view(n, -1, h * w)
        v = self.pam_value(p).view(n, -1, h * w).permute(0, 2, 1)
        attn = torch.matmul(q, k).softmax(dim=-1)
        pam = torch.matmul(attn, v).permute(0, 2, 1).reshape(n, c, h, w)
        pam = self.pam_gamma * pam + p
        pam = self.pam_out_conv(pam)
        ca = self.cam_in_conv(x)
        flat = ca.view(n, c, -1)
        energy = torch.bmm(flat, flat.permute(0, 2, 1))
        energy = energy.max(-1, keepdim=True)[0].expand_as(energy) - energy
        attn_c = energy.softmax(dim=-1)
        cam = torch.bmm(attn_c, flat).view(n, c, h, w)
        cam = self.cam_gamma * cam + ca
        cam = self.cam_out_conv(cam)
        fused = self.conv_seg(pam + cam)
        return fused, self.pam_conv_seg(pam), self.cam_conv_seg(cam)


def test_da_head_torch_parity():
    t = TDAHead(C_IN, channels=16, num_classes=4, pam_channels=2)
    _randomize(t, 3)
    t.eval()
    x = np.random.default_rng(4).normal(
        0, 1, (2, C_IN, 8, 8)).astype(np.float32)
    with torch.no_grad():
        want_f, want_p, want_c = t(torch.from_numpy(x))

    head = DAHead(num_classes=4, channels=16, pam_reduction=8)
    params = {
        "pam_in_conv": cm_params(t.pam_in_conv),
        "pam_query": conv_p(t.pam_query), "pam_key": conv_p(t.pam_key),
        "pam_value": conv_p(t.pam_value),
        "pam_gamma": t.pam_gamma.detach().numpy(),
        "pam_out_conv": cm_params(t.pam_out_conv),
        "cam_in_conv": cm_params(t.cam_in_conv),
        "cam_gamma": t.cam_gamma.detach().numpy(),
        "cam_out_conv": cm_params(t.cam_out_conv),
        "cls": {"conv_seg": conv_p(t.conv_seg)},
        "pam_cls": {"conv_seg": conv_p(t.pam_conv_seg)},
        "cam_cls": {"conv_seg": conv_p(t.cam_conv_seg)},
    }
    stats = {
        "pam_in_conv": {"bn": bn_s(t.pam_in_conv.bn)},
        "pam_out_conv": {"bn": bn_s(t.pam_out_conv.bn)},
        "cam_in_conv": {"bn": bn_s(t.cam_in_conv.bn)},
        "cam_out_conv": {"bn": bn_s(t.cam_out_conv.bn)},
    }
    v = {"params": params, "batch_stats": stats}
    xs = [jnp.asarray(np.transpose(x, (0, 2, 3, 1)))]
    fused, pam_l, cam_l = head.apply(v, xs, train=False, return_aux=True)
    for got, want in ((fused, want_f), (pam_l, want_p), (cam_l, want_c)):
        np.testing.assert_allclose(
            np.asarray(got, np.float32),
            np.transpose(want.detach().numpy(), (0, 2, 3, 1)),
            rtol=1e-3, atol=2e-4)


# ---------------------------------------------------------------------------
# OCRHead oracle (`ocr_head.py` + `utils/self_attention_block.py`)
# ---------------------------------------------------------------------------

class TOCRHead(nn.Module):
    def __init__(self, cin, channels, ocr_channels, num_classes):
        super().__init__()
        self.channels = ocr_channels
        self.bottleneck = CM(cin, channels, 3)
        # ObjectAttentionBlock projections: ConvModule(BN+ReLU) on EVERY
        # conv (key_query_norm=True, value_out_norm=True)
        self.query_project = nn.Sequential(CM(channels, ocr_channels, 1),
                                           CM(ocr_channels, ocr_channels, 1))
        self.key_project = nn.Sequential(CM(channels, ocr_channels, 1),
                                         CM(ocr_channels, ocr_channels, 1))
        self.value_project = CM(channels, ocr_channels, 1)
        self.out_project = CM(ocr_channels, channels, 1)
        self.oab_bottleneck = CM(channels * 2, channels, 1)
        self.conv_seg = nn.Conv2d(channels, num_classes, 1)

    def forward(self, x, prev):
        feats = self.bottleneck(x)
        n, c, h, w = feats.shape
        k = prev.shape[1]
        probs = prev.view(n, k, -1).softmax(dim=2)
        context = torch.matmul(
            probs, feats.view(n, c, -1).permute(0, 2, 1))  # (n, k, c)
        context = context.permute(0, 2, 1).unsqueeze(3)     # (n, c, k, 1)
        query = self.query_project(feats).view(
            n, self.channels, -1).permute(0, 2, 1)
        key = self.key_project(context).view(n, self.channels, -1)
        value = self.value_project(context).view(
            n, self.channels, -1).permute(0, 2, 1)
        sim = (self.channels ** -0.5) * torch.matmul(query, key)
        attn = sim.softmax(dim=-1)
        ctx = torch.matmul(attn, value).permute(0, 2, 1).reshape(
            n, self.channels, h, w)
        ctx = self.out_project(ctx)
        out = self.oab_bottleneck(torch.cat([ctx, feats], dim=1))
        return self.conv_seg(out)


def test_ocr_head_torch_parity():
    t = TOCRHead(C_IN, channels=16, ocr_channels=8, num_classes=4)
    _randomize(t, 5)
    t.eval()
    rng = np.random.default_rng(6)
    x = rng.normal(0, 1, (2, C_IN, 8, 8)).astype(np.float32)
    prev = rng.normal(0, 1, (2, 4, 8, 8)).astype(np.float32)
    with torch.no_grad():
        want = t(torch.from_numpy(x), torch.from_numpy(prev))

    head = OCRHead(num_classes=4, channels=16, ocr_channels=8)

    def proj(seq):
        if isinstance(seq, nn.Sequential):
            mods = list(seq)
        else:
            mods = [seq]
        p = {f"_{i}": cm_params(m) for i, m in enumerate(mods)}
        s = {f"_{i}": {"bn": bn_s(m.bn)} for i, m in enumerate(mods)}
        return p, s

    qp, qs = proj(t.query_project)
    kp, ks = proj(t.key_project)
    vp, vs = proj(t.value_project)
    op, os_ = proj(t.out_project)
    oa_p = {f"query_project{k}": v for k, v in qp.items()}
    oa_p.update({f"key_project{k}": v for k, v in kp.items()})
    oa_p.update({f"value_project{k}": v for k, v in vp.items()})
    oa_p.update({f"out_project{k}": v for k, v in op.items()})
    oa_s = {f"query_project{k}": v for k, v in qs.items()}
    oa_s.update({f"key_project{k}": v for k, v in ks.items()})
    oa_s.update({f"value_project{k}": v for k, v in vs.items()})
    oa_s.update({f"out_project{k}": v for k, v in os_.items()})
    params = {
        "bottleneck": cm_params(t.bottleneck),
        "object_attention": oa_p,
        "oab_bottleneck": cm_params(t.oab_bottleneck),
        "cls": {"conv_seg": conv_p(t.conv_seg)},
    }
    stats = {
        "bottleneck": {"bn": bn_s(t.bottleneck.bn)},
        "object_attention": oa_s,
        "oab_bottleneck": {"bn": bn_s(t.oab_bottleneck.bn)},
    }
    v = {"params": params, "batch_stats": stats}
    got = head.apply(v, [jnp.asarray(np.transpose(x, (0, 2, 3, 1)))],
                     jnp.asarray(np.transpose(prev, (0, 2, 3, 1))),
                     train=False)
    np.testing.assert_allclose(
        np.asarray(got, np.float32),
        np.transpose(want.detach().numpy(), (0, 2, 3, 1)),
        rtol=1e-3, atol=2e-4)


# ---------------------------------------------------------------------------
# PSAHead oracle (`psa_head.py` + mmcv PSAMask), bi-direction local masks
# ---------------------------------------------------------------------------

def _psamask(z, mask, mode):
    """mmcv PSAMask as numpy: (n, mh*mw, h, w) -> (n, h*w, h, w),
    zero-filled outside the window."""
    n, _, h, w = z.shape
    mh, mw = mask
    hh, hw = (mh - 1) // 2, (mw - 1) // 2
    out = np.zeros((n, h * w, h, w), z.dtype)
    for p in range(h):
        for q in range(w):
            for dp in range(mh):
                for dq in range(mw):
                    sp, sq = p + dp - hh, q + dq - hw
                    if not (0 <= sp < h and 0 <= sq < w):
                        continue
                    if mode == "collect":
                        # channel = source s, spatial = current t=(p,q):
                        # attn[s, t] = z[t, offset s-t+half]
                        out[:, sp * w + sq, p, q] = z[:, dp * mw + dq, p, q]
                    else:
                        # channel = current s=(p,q), spatial = target t:
                        # attn[s, t] = z[s, offset t-s+half]
                        out[:, p * w + q, sp, sq] = z[:, dp * mw + dq, p, q]
    return out


class TPSAHead(nn.Module):
    """bi-direction, compact=False, shrink_factor=2, norm_factor=1."""

    def __init__(self, cin, channels, num_classes, mask):
        super().__init__()
        self.mask = mask
        mh, mw = mask
        self.reduce = CM(cin, channels, 1)
        self.attention = nn.Sequential(
            CM(channels, channels, 1),
            nn.Conv2d(channels, mh * mw, 1, bias=False))
        self.reduce_p = CM(cin, channels, 1)
        self.attention_p = nn.Sequential(
            CM(channels, channels, 1),
            nn.Conv2d(channels, mh * mw, 1, bias=False))
        self.proj = CM(channels * 2, cin, 1, pad=1)
        self.bottleneck = CM(cin * 2, channels, 3)
        self.conv_seg = nn.Conv2d(channels, num_classes, 1)

    def forward(self, x):
        identity = x
        x_col = self.reduce(x)
        x_dis = self.reduce_p(x)
        n, c, h, w = x_col.shape
        shrink = 2
        if h % shrink and w % shrink:
            h, w = (h - 1) // shrink + 1, (w - 1) // shrink + 1
            ac = True
        else:
            h, w = h // shrink, w // shrink
            ac = False
        x_col = F.interpolate(x_col, size=(h, w), mode="bilinear",
                              align_corners=ac)
        x_dis = F.interpolate(x_dis, size=(h, w), mode="bilinear",
                              align_corners=ac)
        y_col = torch.from_numpy(_psamask(
            self.attention(x_col).detach().numpy(), self.mask, "collect"))
        y_dis = torch.from_numpy(_psamask(
            self.attention_p(x_dis).detach().numpy(), self.mask,
            "distribute"))
        y_col = F.softmax(y_col, dim=1)
        y_dis = F.softmax(y_dis, dim=1)
        x_col = torch.bmm(x_col.view(n, c, h * w),
                          y_col.view(n, h * w, h * w)).view(n, c, h, w)
        x_dis = torch.bmm(x_dis.view(n, c, h * w),
                          y_dis.view(n, h * w, h * w)).view(n, c, h, w)
        out = torch.cat([x_col, x_dis], 1)
        out = self.proj(out)
        out = F.interpolate(out, size=identity.shape[2:], mode="bilinear",
                            align_corners=ac)
        out = self.bottleneck(torch.cat((identity, out), dim=1))
        return self.conv_seg(out)


@pytest.mark.parametrize("hw", [8, 7], ids=["even", "odd-ac-quirk"])
def test_psa_head_torch_parity(hw):
    t = TPSAHead(C_IN, channels=12, num_classes=4, mask=(3, 3))
    _randomize(t, 7)
    t.eval()
    x = np.random.default_rng(8).normal(
        0, 1, (2, C_IN, hw, hw)).astype(np.float32)
    with torch.no_grad():
        want = t(torch.from_numpy(x))

    head = PSAHead(num_classes=4, channels=12, mask_size=(3, 3),
                   psa_type="bi-direction", compact=False, shrink_factor=2)

    def att(seq, name):
        p = {f"{name}_0": cm_params(seq[0]), f"{name}_1": conv_p(seq[1])}
        s = {f"{name}_0": {"bn": bn_s(seq[0].bn)}}
        return p, s

    pc, sc = att(t.attention, "attention_collect")
    pd, sd = att(t.attention_p, "attention_distribute")
    params = {
        "reduce_collect": cm_params(t.reduce),
        "reduce_distribute": cm_params(t.reduce_p),
        **pc, **pd,
        "proj": cm_params(t.proj),
        "bottleneck": cm_params(t.bottleneck),
        "cls": {"conv_seg": conv_p(t.conv_seg)},
    }
    stats = {
        "reduce_collect": {"bn": bn_s(t.reduce.bn)},
        "reduce_distribute": {"bn": bn_s(t.reduce_p.bn)},
        **sc, **sd,
        "proj": {"bn": bn_s(t.proj.bn)},
        "bottleneck": {"bn": bn_s(t.bottleneck.bn)},
    }
    _compare(head, {"params": params, "batch_stats": stats}, want, x,
             atol=5e-4)


# ---------------------------------------------------------------------------
# ANNHead oracle (`ann_head.py`)
# ---------------------------------------------------------------------------

class TSAB(nn.Module):
    """ANN-flavored SelfAttentionBlock: 1-conv ConvModule key/query
    (shared for APNB), plain-conv value, plain zero-init out, PPMConcat
    key/value sampling, matmul_norm."""

    def __init__(self, key_in, query_in, channels, out_channels, share,
                 pools):
        super().__init__()
        self.channels = channels
        self.pools = pools
        self.key_project = CM(key_in, channels, 1)
        self.query_project = self.key_project if share else \
            CM(query_in, channels, 1)
        self.value_project = nn.Conv2d(key_in, channels, 1)
        self.out_project = nn.Conv2d(channels, out_channels, 1)
        nn.init.constant_(self.out_project.weight, 0)
        nn.init.constant_(self.out_project.bias, 0)

    def ppm(self, x):
        outs = [F.adaptive_avg_pool2d(x, s).view(*x.shape[:2], -1)
                for s in self.pools]
        return torch.cat(outs, dim=2)

    def forward(self, query_feats, key_feats):
        n = query_feats.size(0)
        query = self.query_project(query_feats)
        query = query.reshape(*query.shape[:2], -1).permute(0, 2, 1)
        key = self.ppm(self.key_project(key_feats))
        value = self.ppm(self.value_project(key_feats)).permute(0, 2, 1)
        sim = (self.channels ** -0.5) * torch.matmul(query, key)
        attn = sim.softmax(dim=-1)
        ctx = torch.matmul(attn, value).permute(0, 2, 1).reshape(
            n, -1, *query_feats.shape[2:])
        return self.out_project(ctx)


class TANNHead(nn.Module):
    def __init__(self, low_in, high_in, channels, project_channels,
                 num_classes, pools=(1, 3, 6, 8)):
        super().__init__()
        self.afnb = TSAB(low_in, high_in, project_channels, high_in,
                         False, pools)
        self.afnb_bottleneck = CM(high_in * 2, high_in, 1, act=False)
        self.bottleneck = CM(high_in, channels, 3)
        self.apnb = TSAB(channels, channels, project_channels, channels,
                         True, pools)
        self.apnb_bottleneck = CM(channels * 2, channels, 1)
        self.conv_seg = nn.Conv2d(channels, num_classes, 1)

    def forward(self, low, high):
        ctx = self.afnb(high, low)
        out = self.afnb_bottleneck(torch.cat([ctx, high], 1))
        out = self.bottleneck(out)
        ctx = self.apnb(out, out)
        out = self.apnb_bottleneck(torch.cat([ctx, out], 1))
        return self.conv_seg(out)


def test_ann_head_torch_parity():
    t = TANNHead(low_in=24, high_in=C_IN, channels=16, project_channels=8,
                 num_classes=4)
    _randomize(t, 9)
    # the reference zero-inits out_project (constant_init) — override with
    # nonzero constants so the parity test actually exercises the context
    # path instead of comparing zeros
    nn.init.constant_(t.afnb.out_project.weight, 0.05)
    nn.init.constant_(t.afnb.out_project.bias, 0.01)
    nn.init.constant_(t.apnb.out_project.weight, -0.03)
    nn.init.constant_(t.apnb.out_project.bias, 0.02)
    t.eval()
    rng = np.random.default_rng(10)
    low = rng.normal(0, 1, (2, 24, 16, 16)).astype(np.float32)
    high = rng.normal(0, 1, (2, C_IN, 8, 8)).astype(np.float32)
    with torch.no_grad():
        want = t(torch.from_numpy(low), torch.from_numpy(high))

    head = ANNHead(num_classes=4, channels=16, project_channels=8,
                   in_index=(0, 1))

    def sab(m, name):
        p = {"key_project_0": cm_params(m.key_project),
             "value_project_0": conv_p(m.value_project),
             "out_project_0": conv_p(m.out_project)}
        s = {"key_project_0": {"bn": bn_s(m.key_project.bn)}}
        if m.query_project is not m.key_project:
            p["query_project_0"] = cm_params(m.query_project)
            s["query_project_0"] = {"bn": bn_s(m.query_project.bn)}
        return {name: p}, {name: s}

    p0, s0 = sab(t.afnb, "afnb_0")
    p1, s1 = sab(t.apnb, "apnb_0")
    params = {
        **p0, **p1,
        "afnb_bottleneck": cm_params(t.afnb_bottleneck),
        "bottleneck": cm_params(t.bottleneck),
        "apnb_bottleneck": cm_params(t.apnb_bottleneck),
        "cls": {"conv_seg": conv_p(t.conv_seg)},
    }
    stats = {
        **s0, **s1,
        "afnb_bottleneck": {"bn": bn_s(t.afnb_bottleneck.bn)},
        "bottleneck": {"bn": bn_s(t.bottleneck.bn)},
        "apnb_bottleneck": {"bn": bn_s(t.apnb_bottleneck.bn)},
    }
    v = {"params": params, "batch_stats": stats}
    got = head.apply(
        v, [jnp.asarray(np.transpose(low, (0, 2, 3, 1))),
            jnp.asarray(np.transpose(high, (0, 2, 3, 1)))], train=False)
    np.testing.assert_allclose(
        np.asarray(got, np.float32),
        np.transpose(want.detach().numpy(), (0, 2, 3, 1)),
        rtol=1e-3, atol=5e-4)
