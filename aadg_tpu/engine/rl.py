"""Controller RL updates (REINFORCE / PPO) as jitted pure functions.

The reference's loss modules own and step the optimizer internally
(`/root/reference/losses.py:96-157`); here the update is a pure
``(ctrl_state, policies, log_probs, entropies, rewards) -> (ctrl_state,
stats)`` function. PPO's 5 inner epochs (`losses.py:132-151`) run as a
``lax.scan`` sharing one traced evaluate graph.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..losses import ppo_surrogate_loss, reinforce_loss
from ..models import controller as ctrl_mod
from .state import CtrlState, Entities


def make_controller_update(ent: Entities, loss_name: str, penalty: float,
                           clip: float = 0.2, n_inner: int = 5):
    spec = ent.ctrl_spec

    def reinforce_update(cs: CtrlState, policies, log_probs, entropies,
                         rewards):
        """`losses.py:96-114`: one step on -log_prob * reward - penalty*H.

        The reference backprops through the stored sample-time log-probs;
        we recompute them via teacher-forced evaluate (identical values and
        gradients)."""
        def loss_fn(params):
            lp = ctrl_mod.evaluate(params, spec, policies)
            loss, score, ent_pen = reinforce_loss(lp, entropies, rewards,
                                                  penalty)
            return loss, (score, ent_pen)

        (loss, (score, ent_pen)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(cs.params)
        upd, opt = ent.ctrl_tx.update(grads, cs.opt, cs.params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, cs.params, upd)
        return CtrlState(params, opt), {
            "controller_loss": loss, "score_loss": score,
            "entropy_penalty": ent_pen}

    def ppo_update(cs: CtrlState, policies, log_probs, entropies, rewards):
        """`losses.py:117-157`: 5 clipped-surrogate steps with ratios
        against the sample-time log-probs."""
        prev_lp = jax.lax.stop_gradient(log_probs)

        def inner(carry, _):
            params, opt = carry

            def loss_fn(p):
                lp = ctrl_mod.evaluate(p, spec, policies)
                return ppo_surrogate_loss(lp, prev_lp, rewards, clip)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            upd, opt = ent.ctrl_tx.update(grads, opt, params)
            params = jax.tree_util.tree_map(lambda a, u: a + u, params, upd)
            return (params, opt), loss

        (params, opt), losses = jax.lax.scan(
            inner, (cs.params, cs.opt), None, length=n_inner)
        mean_loss = jnp.mean(losses)
        return CtrlState(params, opt), {
            "controller_loss": mean_loss, "score_loss": mean_loss,
            "entropy_penalty": jnp.mean(entropies)}

    if loss_name == "reinforce":
        return reinforce_update
    if loss_name == "ppo":
        return ppo_update
    raise NotImplementedError(f"{loss_name} is unavailable")
