"""System-level learning proof (VERDICT r3 #1): the policy search
OPTIMIZES its objective.

Everything else in the suite pins mechanism (steps, losses, oracles); this
file pins the claim the mechanism exists for (`search_dg.py:150-162`
reward -> `losses.py:96-157` PPO -> `controller.py:73-116` distribution
shift): on a testbed whose diversity-maximizing op is known by
construction (domains identical except a photometric offset; Brightness
amplifies it multiplicatively, AutoContrast/Equalize erase it — see
tools/prove_learning.py), the controller must actually learn.

Testbed (see tools/prove_learning.py for the construction + the measured
TPU landscape): domains differ ONLY by a chroma tint under pure-luma
noise; in the 4-op space {AutoContrast, Invert, Equalize, Color}, Color at
high magnitude amplifies the tint's SNR (measured reward 0.88 vs identity
~0.02 — a ~40x raise), Color at low magnitude desaturates it away
(0.0002), and the histogram ops erase it (~0.01-0.10).

Tiering: the calibration check is `slow` (one warmup + probe, a few
compiles); the two full 150-epoch search reproductions are `proof` —
OPT-IN (`pytest -m proof`): at ~160 s/epoch on this 1-core CPU host
each takes ~7 h, while the SAME proofs run in ~15-25 min on the real
TPU via `python tools/prove_learning.py [--full-space]` (measured
numbers + raw logs: RESULTS.md rounds 4-5, artifacts/).
"""

import numpy as np
import pytest

import jax

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools import prove_learning as pl


@pytest.mark.slow
def test_testbed_reward_landscape():
    """Calibration: through the production search step on a warmup-trained
    state, Color at max magnitude (saturation x1.9, the tint-SNR
    amplifier) tops the reward landscape, beats its own min magnitude
    (desaturation erases the tint — dose-response within one op), and the
    histogram-normalizing ops sit well below it."""
    cfg = pl.testbed_config(warmup=3, steps=3, batch=4, M=4)
    names, mags, r = pl.measure_op_mag_rewards(cfg, mag_indices=(0, 9),
                                               n_batches=3)
    idx = {n: i for i, n in enumerate(names)}
    color_hi = r[idx["Color"], 1]   # mag index 9: v = 1.9
    color_lo = r[idx["Color"], 0]   # mag index 0: v = 0.1
    assert np.all(np.isfinite(r)), r
    # the informative op at the informative magnitude wins the landscape
    assert color_hi == r.max(), (names, r)
    assert color_hi > 2 * color_lo, (names, r)
    for other in ("AutoContrast", "Equalize", "Invert"):
        assert color_hi > 2 * r[idx[other]].max(), (names, r)


@pytest.mark.proof
def test_search_learns_diversity_objective(tmp_path):
    """The full `run_search` at the reference's PPO budget (120 controller
    updates, `search_dg.py:328-347`): (a) mean per-epoch raw reward rises,
    (b) the op distribution converges decisively AND onto the op that the
    final-state landscape measures as argmax (the objective is
    non-stationary — the seg/dis co-train adversarially — so the claim is
    tracking, not stationarity), (c) the learned controller's policies
    out-reward the epoch-0 controller's on the same frozen
    state/batches/keys.

    Budget/assertion margins validated on the real TPU (RESULTS.md round 4
    learning-proof section): reward +79%, mass 0.25 -> 0.76, learned/random
    2.57x at the full shape; this test runs the smaller TPU-validated
    recipe."""
    cfg = pl.testbed_config(end_epoch=150, warmup=30, steps=2, batch=4,
                            M=8, out_dir=str(tmp_path / "run"))

    from aadg_tpu.engine.search import run_search
    _, out_dir = run_search(cfg, "test_learning.yaml")

    ana = pl.analyze_trajectory(out_dir, pl.TESTBED_SPACE, tail=10)
    series = ana["reward_series"]
    assert len(series) == 150 - 30  # one raw-reward point per search epoch

    # (a) the epoch-mean raw reward rises: last-third mean > first-third
    third = len(series) // 3
    early, late = np.mean(series[:third]), np.mean(series[-third:])
    assert late > 1.15 * early, (early, late)

    # (b) decisive convergence away from the uniform init...
    first = np.asarray(ana["first"])
    tail = np.asarray(ana["tail_mean"])
    names = ana["op_names"]
    assert first.max() < 0.30, first          # init is near-uniform (1/4)
    assert tail.max() > 0.45, (names, tail)
    # ...onto the op the FINAL-state landscape measures as argmax
    lnames, rf = pl.measure_final_landscape(cfg, out_dir)
    converged_op = names[int(np.argmax(tail - first))]
    landscape_op = lnames[int(np.argmax(rf.max(axis=1)))]
    assert converged_op == landscape_op, (names, tail, lnames, rf)

    # (c) learned controller beats the epoch-0 controller on the same
    # frozen final state, batches and augmentation keys
    ab, rounds = pl.learned_vs_random(cfg, out_dir)
    assert ab["learned"] > 1.2 * ab["random"], (ab, rounds)


@pytest.mark.proof
def test_search_learns_at_full_breadth(tmp_path):
    """VERDICT r4 #5: the same learning claim at the PRODUCTION 10-op
    search breadth (`data/basic.py:231-251`, no EXCLUDE_OPS narrowing).

    Recipe + margins validated on the real TPU (RESULTS.md round-5
    full-breadth section; raw logs artifacts/r5_prove_full.log): at both
    the full shape (steps 6/batch 8) and THIS smaller recipe the
    controller moves 0.82-0.87 of its op mass onto the final-landscape's
    top ops, suppresses the landscape's bottom three (AutoContrast/
    Equalize/Brightness, measured tail mass 0.09), and its policies
    out-reward the epoch-0 controller's 1.51-1.61x on the same frozen
    state/batches/keys. The raw-reward SERIES is not asserted at this
    budget: at full breadth the uniform controller already mixes
    informative ops and the adversarial seg/dis adapt faster than the
    mix improves, so the series is non-monotone here (measured 4.03 ->
    2.95 at this recipe, +24% at the full shape) — the set-wise
    convergence and learned-vs-random margins are the budget-robust
    assertions."""
    cfg = pl.testbed_config(end_epoch=150, warmup=30, steps=2, batch=4,
                            M=8, out_dir=str(tmp_path / "run"),
                            full_space=True)

    from aadg_tpu.engine.search import run_search
    from aadg_tpu.ops.augment import augment_list
    _, out_dir = run_search(cfg, "test_learning_full.yaml")

    names = list(augment_list())
    ana = pl.analyze_trajectory(out_dir, names, tail=10)
    first = np.asarray(ana["first"])
    tail = np.asarray(ana["tail_mean"])
    assert first.max() < 0.15, first  # near-uniform init (1/10)

    # rank ops by their best constant-policy reward on the FINAL state
    lnames, rf = pl.measure_final_landscape(cfg, out_dir)
    assert lnames == names
    best = rf.max(axis=1)
    order = np.argsort(-best)
    top6, bottom3 = set(order[:6]), set(order[-3:])
    # mass concentrates set-wise: onto the landscape's top ops, off its
    # bottom ops (measured 0.87 / 0.09 on TPU at this recipe)
    assert tail[list(top6)].sum() > 0.60, (names, tail, best)
    assert tail[list(bottom3)].sum() < 0.15, (names, tail, best)

    # learned controller beats the epoch-0 controller (measured 1.51x)
    ab, rounds = pl.learned_vs_random(cfg, out_dir)
    assert ab["learned"] > 1.2 * ab["random"], (ab, rounds)
