"""Multi-device (8 virtual CPU chips) data-parallel tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aadg_tpu.config import load_config
from aadg_tpu.data.datasets import SyntheticDataset, load_train_arrays
from aadg_tpu.data.stores import make_train_store
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
    step = make_pretrain_step(ent, axis_name="data")
    dp_step = make_dp_train_step(step, mesh, local_batch=1)
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
    step = make_search_step(ent, M, axis_name="data")
    epoch = make_dp_search_epoch(step, mesh, local_batch=1, steps=2)
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
