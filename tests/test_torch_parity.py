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


class _TorchController(nn.Module):
    """Reference-shaped torch Controller (`models/controller.py:9-145`):
    nn.Embedding(NUM_OPS+NUM_MAGS, 32) + nn.LSTMCell(32, 100) + two Linear
    heads; per-sub-policy zero state reset (`create_static`,
    controller.py:48-53,81,122); logits squashed softmax(C*tanh/T)
    (`calculate`, controller.py:55-62); op embedding indexed at `action`,
    mag embedding at `NUM_OPS + action` (controller.py:93,105).
    `sample_forced` is the reference `sample` (controller.py:73-116) with
    the multinomial draw replaced by given actions so the jax sample path
    can be compared token for token."""

    def __init__(self, num_ops, num_mags, Q, L, T, C,
                 embedding_dim=32, hidden_dim=100):
        super().__init__()
        self.NUM_OPS, self.NUM_MAGS = num_ops, num_mags
        self.Q, self.L, self.T, self.C = Q, L, T, C
        self.embedding_dim, self.hidden_dim = embedding_dim, hidden_dim
        self.embedding = nn.Embedding(num_ops + num_mags, embedding_dim)
        self.lstm = nn.LSTMCell(embedding_dim, hidden_dim)
        self.outop = nn.Linear(hidden_dim, num_ops)
        self.outmag = nn.Linear(hidden_dim, num_mags)

    def _static(self, b):
        return (torch.zeros(b, self.embedding_dim),
                torch.zeros(b, self.hidden_dim),
                torch.zeros(b, self.hidden_dim))

    def _calculate(self, logits, action):
        z = self.C * torch.tanh(logits) / self.T
        probs = torch.softmax(z, dim=-1)
        log_prob = torch.log_softmax(z, dim=-1)
        entropy = -(log_prob * probs).sum(1)
        sel = log_prob.gather(1, action[:, None])[:, 0]
        return entropy, probs, sel

    def sample_forced(self, actions):
        b = actions.shape[0]
        policies, entropies, log_probs, op_probs, mag_probs = \
            [], [], [], [], []
        step = 0
        for _ in range(self.Q):
            inp, hx, cx = self._static(b)
            for _ in range(self.L):
                hx, cx = self.lstm(inp, (hx, cx))
                ent, prob, lp = self._calculate(self.outop(hx),
                                                actions[:, step])
                entropies.append(ent); log_probs.append(lp)
                policies.append(actions[:, step]); op_probs.append(prob)
                inp = self.embedding(actions[:, step])
                step += 1

                hx, cx = self.lstm(inp, (hx, cx))
                ent, prob, lp = self._calculate(self.outmag(hx),
                                                actions[:, step])
                entropies.append(ent); log_probs.append(lp)
                policies.append(actions[:, step]); mag_probs.append(prob)
                inp = self.embedding(self.NUM_OPS + actions[:, step])
                step += 1

        # reference stacking: (B, n, Q*L) -> permute -> reshape(-1, n)
        # -> mean over dim 0 (controller.py:111-116)
        op_probs = torch.stack(op_probs, dim=-1).permute(0, 2, 1) \
            .reshape(-1, self.NUM_OPS).mean(dim=0)
        mag_probs = torch.stack(mag_probs, dim=-1).permute(0, 2, 1) \
            .reshape(-1, self.NUM_MAGS).mean(dim=0)
        return (torch.stack(policies, dim=-1),
                op_probs, mag_probs,
                torch.stack(log_probs, dim=-1).sum(dim=-1),
                torch.stack(entropies, dim=-1).sum(dim=-1))

    def evaluate(self, policies, batch_size):
        # controller.py:118-145
        log_probs = []
        for i in range(self.Q):
            inp, hx, cx = self._static(batch_size)
            for j in range(self.L):
                s = i * self.L * 2 + j * 2
                hx, cx = self.lstm(inp, (hx, cx))
                z = self.C * torch.tanh(self.outop(hx)) / self.T
                log_probs.append(torch.log_softmax(z, dim=-1)
                                 .gather(1, policies[:, s, None])[:, 0])
                inp = self.embedding(policies[:, s])
                hx, cx = self.lstm(inp, (hx, cx))
                z = self.C * torch.tanh(self.outmag(hx)) / self.T
                log_probs.append(torch.log_softmax(z, dim=-1)
                                 .gather(1, policies[:, s + 1, None])[:, 0])
                inp = self.embedding(self.NUM_OPS + policies[:, s + 1])
        return torch.stack(log_probs, dim=-1).sum(dim=-1)


def test_full_controller_matches_torch_reference():
    """End-to-end Controller parity on loaded weights: teacher-forced
    sample (log_probs, entropies, op/mag prob vectors) AND evaluate over
    all 5 sub-policies x 2 (op, mag) pairs agree with the reference-shaped
    torch Controller (VERDICT r3 #7)."""
    from aadg_tpu.models import controller as ctrl

    spec = ctrl.ControllerSpec(num_ops=9)   # reference optic space size
    params = ctrl.init_params(jax.random.PRNGKey(7), spec)

    tm = _TorchController(spec.num_ops, spec.num_mags, spec.Q, spec.L,
                          spec.T, spec.C)
    with torch.no_grad():
        tm.embedding.weight.copy_(torch.from_numpy(
            np.asarray(params["embedding"])))
        tm.lstm.weight_ih.copy_(torch.from_numpy(
            np.asarray(params["lstm"]["w_ih"])))
        tm.lstm.weight_hh.copy_(torch.from_numpy(
            np.asarray(params["lstm"]["w_hh"])))
        tm.lstm.bias_ih.copy_(torch.from_numpy(
            np.asarray(params["lstm"]["b_ih"])))
        tm.lstm.bias_hh.copy_(torch.from_numpy(
            np.asarray(params["lstm"]["b_hh"])))
        for name in ("outop", "outmag"):
            getattr(tm, name).weight.copy_(torch.from_numpy(
                np.asarray(params[name]["w"])))
            getattr(tm, name).bias.copy_(torch.from_numpy(
                np.asarray(params[name]["b"])))

    rng = np.random.default_rng(11)
    b = 6
    actions = np.zeros((b, spec.Q * spec.L * 2), np.int64)
    for s in range(actions.shape[1]):
        n = spec.num_ops if s % 2 == 0 else spec.num_mags
        actions[:, s] = rng.integers(0, n, b)

    pol_j, op_j, mag_j, lp_j, ent_j = ctrl.sample(
        params, spec, jax.random.PRNGKey(0), b,
        forced_actions=jnp.asarray(actions, jnp.int32))
    with torch.no_grad():
        pol_t, op_t, mag_t, lp_t, ent_t = tm.sample_forced(
            torch.from_numpy(actions))
        ev_t = tm.evaluate(torch.from_numpy(actions), b)

    np.testing.assert_array_equal(np.asarray(pol_j), pol_t.numpy())
    np.testing.assert_allclose(np.asarray(op_j), op_t.numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(mag_j), mag_t.numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(lp_j), lp_t.numpy(),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ent_j), ent_t.numpy(),
                               rtol=1e-5, atol=1e-5)

    ev_j = np.asarray(ctrl.evaluate(params, spec,
                                    jnp.asarray(actions, jnp.int32)))
    np.testing.assert_allclose(ev_j, ev_t.numpy(), rtol=1e-5, atol=1e-5)
    # sample-path and evaluate-path scoring must agree with each other
    np.testing.assert_allclose(ev_j, np.asarray(lp_j), rtol=1e-5,
                               atol=1e-5)
