"""Multi-device (8 virtual CPU chips) data-parallel tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.heavy  # whole-epoch DP programs: minutes-to-hours cold

from aadg_tpu.config import load_config
from aadg_tpu.data.datasets import SyntheticDataset, load_train_arrays
from aadg_tpu.data.stores import make_train_store, sample_train_batch
from aadg_tpu.engine.state import build_entities, init_state
from aadg_tpu.engine.steps import make_pretrain_step, make_search_step
from aadg_tpu.models import controller as ctrl_mod
from aadg_tpu.parallel.mesh import make_mesh
from aadg_tpu.parallel.dp import make_dp_train_step, make_dp_search_epoch

import os
FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.fixture(scope="module")
def setup():
    cfg = load_config(os.path.join(FIXTURES, "synthetic_optic.yaml"))
    cfg.TPU.CROP_SIZE = 32
    ds = SyntheticDataset("optic", n_domains=3, n_per_domain=4, size=32)
    store = make_train_store(*load_train_arrays(ds))
    ent = build_entities(cfg, "search", steps_per_epoch=1,
                         axis_name="data")
    sd, cs = init_state(ent, jax.random.PRNGKey(0))
    return cfg, store, ent, sd, cs


def test_eight_devices_visible():
    assert len(jax.devices()) == 8


def test_dp_pretrain_step_runs_and_syncs(setup):
    cfg, store, ent, sd, cs = setup
    mesh = make_mesh(8)
    step = make_pretrain_step(ent, axis_name="data", n_shards=8)
    dp_step = make_dp_train_step(step, mesh, global_batch=8)
    with mesh:
        new_sd, metrics = dp_step(sd, store, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["seg_loss"]))
    # params are replicated: a single consistent value per leaf
    w = jax.tree_util.tree_leaves(new_sd.seg_params)[0]
    assert np.all(np.isfinite(np.asarray(w)))


def test_dp_search_epoch_rewards(setup):
    cfg, store, ent, sd, cs = setup
    mesh = make_mesh(8)
    M = 2
    step = make_search_step(ent, M, axis_name="data", n_shards=8)
    epoch = make_dp_search_epoch(step, mesh, global_batch=8, steps=2)
    policies, *_ = ctrl_mod.sample(cs.params, ent.ctrl_spec,
                                   jax.random.PRNGKey(2), M)
    ptens = ctrl_mod.policies_to_tensor(policies, ent.ctrl_spec)
    with mesh:
        new_sd, metrics, rewards = epoch(sd, store, ptens,
                                         jax.random.PRNGKey(3))
    rewards = np.asarray(rewards)
    assert rewards.shape == (M,)
    assert np.all(np.isfinite(rewards))
    # normalized rewards: zero mean
    assert rewards.mean() == pytest.approx(0.0, abs=1e-4)


def test_dp_search_epoch_matches_single_device(setup):
    """The headline DP contract: the 8-shard epoch computes the SAME
    rewards (global-batch Sinkhorn on all_gathered features, shard-window
    per-sample keys, global index draws) as the single-chip epoch run on
    the identical global batch with the identical seed — to f32 tolerance
    (VERDICT r1 item 1; reference semantics: `search_dg.py:150-162` at
    global batch size)."""
    cfg, store, _, _, _ = setup
    from aadg_tpu.losses import normalize_rewards

    M, B, steps = 2, 8, 2
    key = jax.random.PRNGKey(42)

    # --- single-chip program ---
    ent1 = build_entities(cfg, "search", steps_per_epoch=1)
    sd1, cs1 = init_state(ent1, jax.random.PRNGKey(0))
    step1 = make_search_step(ent1, M)

    @jax.jit
    def sc_epoch(ts, store, policies, ekey):
        def body(carry, k):
            kb, ks = jax.random.split(k)
            batch = sample_train_batch(store, kb, B)
            carry, m, r = step1(carry, batch, policies, ks)
            return carry, (m, r)
        keys = jax.random.split(ekey, steps)
        ts, (ms, rs) = jax.lax.scan(body, ts, keys)
        return ts, jax.tree_util.tree_map(jnp.mean, ms), \
            normalize_rewards(jnp.sum(rs, axis=0))

    policies, *_ = ctrl_mod.sample(cs1.params, ent1.ctrl_spec,
                                   jax.random.PRNGKey(2), M)
    ptens = ctrl_mod.policies_to_tensor(policies, ent1.ctrl_spec)
    sd1_out, ms1, r1 = sc_epoch(sd1, store, ptens, key)

    # --- 8-shard DP program, same seed ---
    ent8 = build_entities(cfg, "search", steps_per_epoch=1,
                          axis_name="data")
    sd8, _ = init_state(ent8, jax.random.PRNGKey(0))
    step8 = make_search_step(ent8, M, axis_name="data", n_shards=8)
    mesh = make_mesh(8)
    epoch8 = make_dp_search_epoch(step8, mesh, global_batch=B,
                                  steps=steps)
    with mesh:
        sd8_out, ms8, r8 = epoch8(sd8, store, ptens, key)

    np.testing.assert_allclose(np.asarray(r8), np.asarray(r1),
                               rtol=1e-4, atol=1e-5)
    assert float(ms8["seg_loss"]) == pytest.approx(
        float(ms1["seg_loss"]), rel=1e-4)
    # and the trained parameters agree. pmean-of-shard-means equals the
    # global-batch mean only up to f32 summation order; Adam turns a
    # low-order-bit sign flip of a NEAR-ZERO gradient into a full ±lr
    # first-step update (m/sqrt(v) is scale-invariant), so per-element
    # agreement is bounded by ~2*lr=2e-3 absolute, not relative.
    l1 = jax.tree_util.tree_leaves(sd1_out.seg_params)
    l8 = jax.tree_util.tree_leaves(sd8_out.seg_params)
    for a, b in zip(l1, l8):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=0, atol=2.5e-3)


def test_dp_global_batch_sampling_windows(setup):
    """sample_train_batch with (n_shards, shard_index) returns exactly the
    shard's contiguous row window of the single-chip draw."""
    _, store, _, _, _ = setup
    key = jax.random.PRNGKey(9)
    full = sample_train_batch(store, key, 8)
    for s in range(4):
        imgs, masks, dcs = sample_train_batch(store, key, 8, n_shards=4,
                                              shard_index=jnp.int32(s))
        np.testing.assert_array_equal(np.asarray(imgs),
                                      np.asarray(full[0][2 * s:2 * s + 2]))
        np.testing.assert_array_equal(np.asarray(masks),
                                      np.asarray(full[1][2 * s:2 * s + 2]))
        np.testing.assert_array_equal(np.asarray(dcs),
                                      np.asarray(full[2][2 * s:2 * s + 2]))


def test_dryrun_multichip_entrypoint():
    import sys
    sys.path.insert(0, os.path.dirname(FIXTURES).rsplit("/tests", 1)[0])
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_graft_entry_compiles():
    import __graft_entry__ as g
    fn, args = g.entry()
    lowered = jax.jit(fn).lower(*args)
    assert lowered is not None
