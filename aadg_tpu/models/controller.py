"""LSTM augmentation-policy controller (functional JAX).

Re-design of the reference's torch Controller
(`/root/reference/models/controller.py:9-145`): a shared LSTMCell(32->100)
emits, for each of Q=5 sub-policies (state reset between sub-policies), L=2
alternating (operation, magnitude) tokens; logits are squashed
``softmax(C * tanh(logits) / T)``; ``sample`` draws tokens, ``evaluate``
re-scores stored tokens for PPO ratios (`controller.py:118-145`).

Implemented as a pure-functional module (explicit params pytree) so both
``sample`` and ``evaluate`` trace cleanly under jit/grad: the 20-step token
loop is unrolled at trace time (Q, L are small static ints).

Init matches the reference (`controller.py:31-36`): every parameter
uniform(-0.1, 0.1), output-head biases zero.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp


class ControllerSpec(NamedTuple):
    num_ops: int
    num_mags: int = 10
    Q: int = 5           # sub-policies per policy
    L: int = 2           # (op, mag) pairs per sub-policy
    T: float = 2.0       # softmax temperature
    C: float = 2.5       # tanh squash scale
    embedding_dim: int = 32
    hidden_dim: int = 100

    @property
    def tokens_per_policy(self) -> int:
        return self.Q * self.L * 2


def spec_from_config(cfg, num_ops: int) -> ControllerSpec:
    return ControllerSpec(
        num_ops=num_ops,
        num_mags=cfg.CONTROLLER.NUM_MAGS,
        L=cfg.CONTROLLER.L,
        T=float(cfg.CONTROLLER.T),
        C=float(cfg.CONTROLLER.C),
    )


def init_params(key: jax.Array, spec: ControllerSpec) -> Dict:
    e, h = spec.embedding_dim, spec.hidden_dim
    n_tokens = spec.num_ops + spec.num_mags
    ks = jax.random.split(key, 7)
    u = lambda k, shape: jax.random.uniform(k, shape, jnp.float32, -0.1, 0.1)
    return {
        "embedding": u(ks[0], (n_tokens, e)),
        "lstm": {
            # torch LSTMCell layout: gates [i, f, g, o] stacked
            "w_ih": u(ks[1], (4 * h, e)),
            "w_hh": u(ks[2], (4 * h, h)),
            "b_ih": u(ks[3], (4 * h,)),
            "b_hh": u(ks[4], (4 * h,)),
        },
        "outop": {"w": u(ks[5], (spec.num_ops, h)),
                  "b": jnp.zeros((spec.num_ops,))},
        "outmag": {"w": u(ks[6], (spec.num_mags, h)),
                   "b": jnp.zeros((spec.num_mags,))},
    }


def _lstm_cell(p: Dict, x: jnp.ndarray, h: jnp.ndarray, c: jnp.ndarray
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    gates = x @ p["w_ih"].T + p["b_ih"] + h @ p["w_hh"].T + p["b_hh"]
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    return h_new, c_new


def _squashed_logits(spec: ControllerSpec, logits: jnp.ndarray) -> jnp.ndarray:
    """`controller.py:56`: C * tanh(logits) / T."""
    return spec.C * jnp.tanh(logits) / spec.T


def sample(params: Dict, spec: ControllerSpec, key: jax.Array,
           batch_size: int, forced_actions: jnp.ndarray | None = None):
    """Draw ``batch_size`` policies (the M of the search loop).

    Returns (policies, op_probs, mag_probs, log_probs, entropies) with the
    reference shapes (`controller.py:108-116`): policies (B, Q*L*2) int32;
    op_probs (num_ops,) / mag_probs (num_mags,) — token-probability vectors
    averaged over batch and steps; log_probs (B,) and entropies (B,) summed
    over the token sequence.

    ``forced_actions`` (B, Q*L*2) replaces the categorical draws with given
    tokens (teacher forcing) — used by the torch-oracle parity tests to pin
    the sample path's probs/entropies deterministically.
    """
    b = batch_size
    e, hd = spec.embedding_dim, spec.hidden_dim

    policies, log_probs, entropies = [], [], []
    op_probs, mag_probs = [], []
    keys = iter(jax.random.split(key, spec.Q * spec.L * 2))
    step = 0

    for _ in range(spec.Q):
        inp = jnp.zeros((b, e))
        h = jnp.zeros((b, hd))
        c = jnp.zeros((b, hd))
        for _ in range(spec.L):
            for head, n_out, probs_acc, offset in (
                    ("outop", spec.num_ops, op_probs, 0),
                    ("outmag", spec.num_mags, mag_probs, spec.num_ops)):
                h, c = _lstm_cell(params["lstm"], inp, h, c)
                logits = h @ params[head]["w"].T + params[head]["b"]
                z = _squashed_logits(spec, logits)
                logp = jax.nn.log_softmax(z, axis=-1)
                p = jnp.exp(logp)
                entropy = -jnp.sum(logp * p, axis=-1)
                if forced_actions is None:
                    action = jax.random.categorical(next(keys), z, axis=-1)
                else:
                    action = forced_actions[:, step]
                sel_logp = jnp.take_along_axis(
                    logp, action[:, None], axis=1)[:, 0]

                policies.append(action)
                log_probs.append(sel_logp)
                entropies.append(entropy)
                probs_acc.append(p)

                inp = params["embedding"][action + offset]
                step += 1

    policies = jnp.stack(policies, axis=-1).astype(jnp.int32)  # (B, Q*L*2)
    log_probs = jnp.sum(jnp.stack(log_probs, axis=-1), axis=-1)
    entropies = jnp.sum(jnp.stack(entropies, axis=-1), axis=-1)
    op_probs = jnp.mean(jnp.stack(op_probs, axis=0), axis=(0, 1))
    mag_probs = jnp.mean(jnp.stack(mag_probs, axis=0), axis=(0, 1))
    return policies, op_probs, mag_probs, log_probs, entropies


def evaluate(params: Dict, spec: ControllerSpec,
             policies: jnp.ndarray) -> jnp.ndarray:
    """Teacher-forced re-scoring of stored actions: summed log-probs (B,)
    (`controller.py:118-145`). Differentiable w.r.t. params."""
    b = policies.shape[0]
    e, hd = spec.embedding_dim, spec.hidden_dim
    log_probs = []
    step = 0
    for _ in range(spec.Q):
        inp = jnp.zeros((b, e))
        h = jnp.zeros((b, hd))
        c = jnp.zeros((b, hd))
        for _ in range(spec.L):
            for head, offset in (("outop", 0), ("outmag", spec.num_ops)):
                h, c = _lstm_cell(params["lstm"], inp, h, c)
                logits = h @ params[head]["w"].T + params[head]["b"]
                logp = jax.nn.log_softmax(
                    _squashed_logits(spec, logits), axis=-1)
                action = policies[:, step]
                log_probs.append(jnp.take_along_axis(
                    logp, action[:, None], axis=1)[:, 0])
                inp = params["embedding"][action + offset]
                step += 1
    return jnp.sum(jnp.stack(log_probs, axis=-1), axis=-1)


def policies_to_tensor(policies: jnp.ndarray, spec: ControllerSpec
                       ) -> jnp.ndarray:
    """Reshape flat token sequences (B, Q*L*2) into the (B, Q, L, 2)
    (op_idx, mag_idx) tensor consumed by the augmentation engine
    (the tensor-input equivalent of ``parse_policies``,
    `data/policy.py:64-97`)."""
    b = policies.shape[0]
    return policies.reshape(b, spec.Q, spec.L, 2)
