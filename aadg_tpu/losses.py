"""Loss library (pure jnp functions).

Functional re-design of the reference's loss modules
(`/root/reference/losses.py:21-216`). Unlike the reference, RL losses do NOT
own or step an optimizer (`losses.py:101-112` has the loss module call
``optimizer.step()`` internally); here they are pure scalar functions and the
trainer owns optax updates — the idiomatic JAX split.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Task losses
# ---------------------------------------------------------------------------

def bce_loss(probs: jnp.ndarray, targets: jnp.ndarray,
             eps: float = 1e-7) -> jnp.ndarray:
    """Binary cross entropy on probabilities (torch ``BCELoss`` semantics,
    mean reduction; `losses.py:21-25` applies it to ``sigmoid(seg_output)``).
    """
    p = jnp.clip(probs, eps, 1.0 - eps)
    return -jnp.mean(targets * jnp.log(p) + (1.0 - targets) * jnp.log1p(-p))


def task_loss(dataset_name: str):
    if dataset_name in ("optic", "rvs"):
        return bce_loss
    raise NotImplementedError(
        f"Task loss is unavailable for {dataset_name}")


def soft_cross_entropy(logits: jnp.ndarray, soft_targets: jnp.ndarray,
                       reduction: str = "mean") -> jnp.ndarray:
    """Cross entropy against soft targets (`losses.py:52-68`): targets are a
    (soft) distribution over classes, e.g. the soft domain labels."""
    log_probs = jax.nn.log_softmax(logits, axis=1)
    loss = -soft_targets * log_probs
    summed = jnp.sum(loss, axis=1)
    if reduction in ("avg", "mean"):
        return jnp.mean(summed)
    if reduction == "sum":
        return jnp.sum(summed)
    return summed


def cross_entropy_label_smooth(logits: jnp.ndarray, labels: jnp.ndarray,
                               num_classes: int, epsilon: float = 0.0,
                               reduction: str = "mean") -> jnp.ndarray:
    """`losses.py:28-49`: one-hot targets with optional label smoothing."""
    onehot = jax.nn.one_hot(labels, num_classes)
    if epsilon > 0.0:
        onehot = (1 - epsilon) * onehot + epsilon / num_classes
    return soft_cross_entropy(logits, onehot, reduction)


def generalized_dice(logits: jnp.ndarray, target_labels: jnp.ndarray,
                     idc, num_classes: int = 3) -> jnp.ndarray:
    """Generalized Dice loss (`losses.py:71-93`): softmax probs vs one-hot
    labels, class weights 1/|class|^2, restricted to classes ``idc``.

    logits: (B, C, H, W); target_labels: (B, H, W) int."""
    probs = jax.nn.softmax(logits, axis=1)
    target = jax.nn.one_hot(target_labels, num_classes, axis=1)
    pc = probs[:, jnp.asarray(idc)]
    tc = target[:, jnp.asarray(idc)]
    w = 1.0 / (jnp.einsum("bcwh->bc", tc) + 1e-10) ** 2
    intersection = w * jnp.einsum("bcwh,bcwh->bc", pc, tc)
    union = w * (jnp.einsum("bcwh->bc", pc) + jnp.einsum("bcwh->bc", tc))
    divided = 1 - 2 * (jnp.sum(intersection, axis=1) + 1e-10) / (
        jnp.sum(union, axis=1) + 1e-10)
    return jnp.mean(divided)


# ---------------------------------------------------------------------------
# Adversarial / distribution-matching losses
# ---------------------------------------------------------------------------

def lsgan_loss(source: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """`losses.py:160-170`: MSE vs ones for source, zeros for target."""
    real = jnp.mean((source - 1.0) ** 2)
    fake = jnp.mean(target ** 2)
    return 0.5 * (real + fake)


def dg_lsgan_loss(pred_logits: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """`losses.py:173-181`: MSE between softmax(pred) and (soft) domain gt."""
    return jnp.mean((jax.nn.softmax(pred_logits, axis=-1) - gt) ** 2)


def mmd_loss(source: jnp.ndarray, target: jnp.ndarray,
             kernel_mul: float = 2.0, kernel_num: int = 5) -> jnp.ndarray:
    """Multi-kernel MMD (`losses.py:184-216`). source/target: (N, D), (M, D)
    with N == M (the reference indexes square blocks)."""
    n_s = source.shape[0]
    total = jnp.concatenate([source, target], axis=0)
    n = total.shape[0]
    sq = jnp.sum((total[None, :, :] - total[:, None, :]) ** 2, axis=2)
    bandwidth = jnp.sum(sq) / (n * n - n)
    bandwidth = bandwidth / kernel_mul ** (kernel_num // 2)
    kernels = sum(jnp.exp(-sq / (bandwidth * kernel_mul ** i))
                  for i in range(kernel_num))
    xx = kernels[:n_s, :n_s]
    yy = kernels[n_s:, n_s:]
    xy = kernels[:n_s, n_s:]
    yx = kernels[n_s:, :n_s]
    return jnp.mean(xx + yy - xy - yx)


# ---------------------------------------------------------------------------
# RL objectives (pure; the search engine owns the optimizer)
# ---------------------------------------------------------------------------

def reinforce_loss(log_probs: jnp.ndarray, entropies: jnp.ndarray,
                   reward: jnp.ndarray, penalty: float):
    """REINFORCE with entropy bonus (`losses.py:96-114`).

    Returns (loss, score_loss, entropy_penalty)."""
    score_loss = jnp.mean(-log_probs * reward)
    entropy_penalty = jnp.mean(entropies)
    return score_loss - penalty * entropy_penalty, score_loss, entropy_penalty


def ppo_surrogate_loss(curr_log_probs: jnp.ndarray,
                       prev_log_probs: jnp.ndarray,
                       reward: jnp.ndarray,
                       clip: float = 0.2) -> jnp.ndarray:
    """One PPO clipped-surrogate evaluation (`losses.py:132-146`)."""
    ratios = jnp.exp(curr_log_probs - jax.lax.stop_gradient(prev_log_probs))
    surr1 = ratios * reward
    surr2 = jnp.clip(ratios, 1.0 - clip, 1.0 + clip) * reward
    return jnp.mean(-jnp.minimum(surr1, surr2))


def normalize_rewards(rewards: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Per-epoch reward normalization (`search_dg.py:214`)."""
    return (rewards - jnp.mean(rewards)) / (jnp.std(rewards) + eps)
