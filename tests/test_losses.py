import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from aadg_tpu import losses as L


def test_bce_matches_torch(rng):
    p = rng.random((4, 2, 8, 8)).astype(np.float32)
    t = rng.integers(0, 2, (4, 2, 8, 8)).astype(np.float32)
    ours = float(L.bce_loss(jnp.asarray(p), jnp.asarray(t)))
    ref = float(torch.nn.BCELoss()(torch.tensor(p), torch.tensor(t)))
    assert ours == pytest.approx(ref, rel=1e-5)


def test_soft_cross_entropy_matches_torch(rng):
    logits = rng.normal(size=(6, 3)).astype(np.float32)
    targets = rng.random((6, 3)).astype(np.float32)
    targets /= targets.sum(1, keepdims=True)
    ours = float(L.soft_cross_entropy(jnp.asarray(logits), jnp.asarray(targets)))
    lp = F.log_softmax(torch.tensor(logits), dim=1)
    ref = float(torch.mean(torch.sum(-torch.tensor(targets) * lp, dim=1)))
    assert ours == pytest.approx(ref, rel=1e-5)


def test_label_smooth_reduces_confidence_penalty(rng):
    logits = jnp.asarray(rng.normal(size=(5, 4)).astype(np.float32)) * 3
    labels = jnp.asarray(rng.integers(0, 4, 5))
    plain = L.cross_entropy_label_smooth(logits, labels, 4, epsilon=0.0)
    onehot = jax.nn.one_hot(labels, 4)
    ref = L.soft_cross_entropy(logits, onehot)
    assert float(plain) == pytest.approx(float(ref), rel=1e-6)


def test_generalized_dice_zero_for_perfect(rng):
    labels = jnp.asarray(rng.integers(0, 3, (2, 8, 8)))
    # near-one-hot logits
    logits = jax.nn.one_hot(labels, 3, axis=1) * 50.0
    loss = L.generalized_dice(logits, labels, idc=[1, 2])
    assert float(loss) == pytest.approx(0.0, abs=1e-4)


def test_dg_lsgan_matches_torch(rng):
    pred = rng.normal(size=(6, 3)).astype(np.float32)
    gt = rng.random((6, 3)).astype(np.float32)
    ours = float(L.dg_lsgan_loss(jnp.asarray(pred), jnp.asarray(gt)))
    ref = float(torch.nn.MSELoss()(F.softmax(torch.tensor(pred), dim=-1),
                                   torch.tensor(gt)))
    assert ours == pytest.approx(ref, rel=1e-5)


def test_mmd_zero_for_identical(rng):
    x = jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32))
    assert float(L.mmd_loss(x, x)) == pytest.approx(0.0, abs=1e-5)
    y = jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32) + 3.0)
    assert float(L.mmd_loss(x, y)) > 0.1


def test_reinforce_loss_semantics():
    log_probs = jnp.array([-1.0, -2.0])
    entropies = jnp.array([0.5, 0.7])
    reward = jnp.array([1.0, -1.0])
    loss, score, ent = L.reinforce_loss(log_probs, entropies, reward, 0.1)
    assert float(score) == pytest.approx(np.mean([1.0, -2.0]))
    assert float(ent) == pytest.approx(0.6)
    assert float(loss) == pytest.approx(float(score) - 0.1 * 0.6)


def test_ppo_clip_behavior():
    prev = jnp.log(jnp.array([0.5]))
    # ratio = 2.0 > 1+clip -> clipped surrogate used for positive reward
    curr = jnp.log(jnp.array([1.0]))
    reward = jnp.array([1.0])
    loss = L.ppo_surrogate_loss(curr, prev, reward, clip=0.2)
    assert float(loss) == pytest.approx(-1.2, rel=1e-6)


def test_normalize_rewards():
    r = jnp.array([1.0, 2.0, 3.0])
    out = L.normalize_rewards(r)
    assert float(jnp.mean(out)) == pytest.approx(0.0, abs=1e-6)
