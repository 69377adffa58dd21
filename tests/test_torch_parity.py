"""Numeric parity: flax MobileNetV2Encoder vs a torch reference.

torchvision isn't in this image, so the torchvision MobileNetV2 module
layout (state_dict key structure `features.N...`) is reconstructed here in
plain torch with random weights, converted via
tools/convert_torch_weights.py, and the two forwards compared. This
validates the converter's key mapping AND the encoder's conv padding,
stride, dilation (smp make_dilated output-stride 16) and BN semantics —
so a real ImageNet `mobilenet_v2.pth` dropped on disk converts correctly.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp
from torch import nn

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from aadg_tpu.models.mobilenetv2 import MobileNetV2Encoder, _SETTINGS
from tools.convert_torch_weights import convert


class _ConvBNReLU(nn.Sequential):
    def __init__(self, inp, oup, kernel=3, stride=1, groups=1, dilation=1):
        pad = (kernel - 1) // 2 * dilation
        super().__init__(
            nn.Conv2d(inp, oup, kernel, stride, pad, groups=groups,
                      dilation=dilation, bias=False),
            nn.BatchNorm2d(oup),
            nn.ReLU6(inplace=True))


class _InvertedResidual(nn.Module):
    def __init__(self, inp, oup, stride, expand_ratio, dilation=1):
        super().__init__()
        hidden = int(round(inp * expand_ratio))
        self.use_res = stride == 1 and inp == oup
        layers = []
        if expand_ratio != 1:
            layers.append(_ConvBNReLU(inp, hidden, kernel=1))
        layers.extend([
            _ConvBNReLU(hidden, hidden, stride=stride, groups=hidden,
                        dilation=dilation),
            nn.Conv2d(hidden, oup, 1, 1, 0, bias=False),
            nn.BatchNorm2d(oup)])
        self.conv = nn.Sequential(*layers)

    def forward(self, x):
        return x + self.conv(x) if self.use_res else self.conv(x)


def _torch_mobilenet_v2(output_stride=16):
    """torchvision-style MobileNetV2 features with the flax encoder's
    stride→dilation schedule (smp make_dilated, output stride 16)."""
    features = [_ConvBNReLU(3, 32, stride=2)]
    in_ch = 32
    current_stride, dilation = 2, 1
    for t, c, n, s in _SETTINGS:
        for i in range(n):
            stride = s if i == 0 else 1
            if stride == 2 and current_stride >= output_stride:
                dilation *= 2
                stride = 1
            features.append(_InvertedResidual(
                in_ch, c, stride, t,
                dilation=dilation if stride == 1 else 1))
            if stride == 2:
                current_stride *= 2
            in_ch = c
    features.append(_ConvBNReLU(in_ch, 1280, kernel=1))
    return nn.Sequential(*features)


def test_encoder_matches_torch_reference():
    torch.manual_seed(0)
    tm = _torch_mobilenet_v2()
    tm.eval()
    # randomize BN running stats so the test can't pass with identity stats
    for m in tm.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.uniform_(-0.5, 0.5)
            m.running_var.uniform_(0.5, 1.5)

    sd = {f"features.{k}": v for k, v in tm.state_dict().items()}
    params, stats = convert(sd)

    enc = MobileNetV2Encoder()
    x_np = np.random.default_rng(1).uniform(-1, 1, (2, 64, 64, 3)).astype(
        np.float32)
    variables = {"params": params, "batch_stats": stats}
    low, high = enc.apply(variables, jnp.asarray(x_np), train=False)

    with torch.no_grad():
        xt = torch.from_numpy(np.transpose(x_np, (0, 3, 1, 2)))
        y = xt
        feats = []
        for i, m in enumerate(tm):
            y = m(y)
            feats.append(y)
        t_low = feats[3]    # after the 24-ch stage (features.3)
        t_high = feats[18]  # final 1280-ch features

    np.testing.assert_allclose(
        np.asarray(low), np.transpose(t_low.numpy(), (0, 2, 3, 1)),
        rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(high), np.transpose(t_high.numpy(), (0, 2, 3, 1)),
        rtol=2e-4, atol=2e-4)


def test_controller_evaluate_matches_torch_lstm():
    """The controller's LSTM-cell math, tanh-squash softmax and
    teacher-forced scoring agree with a torch LSTMCell implementation of
    the reference controller (`models/controller.py:9-145`)."""
    from aadg_tpu.models import controller as ctrl

    spec = ctrl.ControllerSpec(num_ops=10)
    params = ctrl.init_params(jax.random.PRNGKey(0), spec)
    rng = np.random.default_rng(2)
    b = 3
    actions = np.zeros((b, spec.Q * spec.L * 2), np.int64)
    for s in range(spec.Q * spec.L * 2):
        n = spec.num_ops if s % 2 == 0 else spec.num_mags
        actions[:, s] = rng.integers(0, n, b)

    jax_lp = np.asarray(ctrl.evaluate(params, spec,
                                      jnp.asarray(actions, jnp.int32)))

    cell = nn.LSTMCell(spec.embedding_dim, spec.hidden_dim)
    with torch.no_grad():
        cell.weight_ih.copy_(torch.from_numpy(
            np.asarray(params["lstm"]["w_ih"])))
        cell.weight_hh.copy_(torch.from_numpy(
            np.asarray(params["lstm"]["w_hh"])))
        cell.bias_ih.copy_(torch.from_numpy(
            np.asarray(params["lstm"]["b_ih"])))
        cell.bias_hh.copy_(torch.from_numpy(
            np.asarray(params["lstm"]["b_hh"])))
        emb = torch.from_numpy(np.asarray(params["embedding"]))
        heads = {k: (torch.from_numpy(np.asarray(params[k]["w"])),
                     torch.from_numpy(np.asarray(params[k]["b"])))
                 for k in ("outop", "outmag")}

        lp_sum = torch.zeros(b, dtype=torch.float64)
        step = 0
        for _ in range(spec.Q):
            inp = torch.zeros(b, spec.embedding_dim)
            hx = torch.zeros(b, spec.hidden_dim)
            cx = torch.zeros(b, spec.hidden_dim)
            for _ in range(spec.L):
                for head, offset in (("outop", 0),
                                     ("outmag", spec.num_ops)):
                    hx, cx = cell(inp, (hx, cx))
                    w, bias = heads[head]
                    logits = hx @ w.T + bias
                    z = spec.C * torch.tanh(logits) / spec.T
                    logp = torch.log_softmax(z, dim=-1)
                    act = torch.from_numpy(actions[:, step])
                    lp_sum += logp.gather(1, act[:, None])[:, 0].double()
                    inp = emb[act + offset]
                    step += 1

    np.testing.assert_allclose(jax_lp, lp_sum.numpy(), rtol=1e-5,
                               atol=1e-5)
