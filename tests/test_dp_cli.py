"""End-to-end data-parallel search through the orchestrator (8 virtual
CPU devices): the CLI's ``--data_parallel`` path."""

import json
import os

import numpy as np
import pytest

from aadg_tpu.config import load_config

pytestmark = pytest.mark.heavy  # DP e2e through the CLI orchestrator

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def test_run_search_data_parallel(tmp_path):
    from aadg_tpu.engine.search import run_search

    cfg = load_config(os.path.join(FIXTURES, "synthetic_optic.yaml"))
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    cfg.LOG_DIR = str(tmp_path / "log")
    cfg.TPU.DATA_PARALLEL = 8
    cfg.TRAIN.BATCH_SIZE = 8  # 1 per shard
    cfg.TRAIN.WARMUP_EPOCH = 1
    cfg.TRAIN.END_EPOCH = 2

    best, out_dir = run_search(cfg, "synthetic_optic.yaml")
    with open(os.path.join(out_dir, "final_result.json")) as f:
        result = json.load(f)
    assert np.isfinite(result["avg_dsc"])
    traj = np.load(os.path.join(out_dir, "op_probs_trajectory.npy"))
    assert traj.shape == (1, 10)


def test_run_train_data_parallel(tmp_path):
    """DP through train mode (VERDICT r1 item 2; reference: DDP wraps all
    modes, `models/__init__.py:37-44` + `train_dg.py:134-204`)."""
    from aadg_tpu.engine.train import run_train
    from aadg_tpu.utils import load_checkpoint

    cfg = load_config(os.path.join(FIXTURES, "synthetic_optic.yaml"))
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    cfg.LOG_DIR = str(tmp_path / "log")
    cfg.TPU.DATA_PARALLEL = 8
    cfg.TRAIN.BATCH_SIZE = 8  # 1 per shard
    cfg.TRAIN.END_EPOCH = 2

    best, out_dir = run_train(cfg, "synthetic_optic.yaml")
    with open(os.path.join(out_dir, "final_result.json")) as f:
        result = json.load(f)
    assert np.isfinite(result["avg_dsc"])
    state = load_checkpoint(os.path.join(out_dir, "final_state.msgpack"))
    import jax
    for leaf in jax.tree_util.tree_leaves(state):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_run_train_data_parallel_autoaug(tmp_path):
    """DP + the autoaugment train variant (policy-mixed batches at p=0.5,
    `train_dg_2d.py:39-44`) through the orchestrator."""
    from aadg_tpu.engine.train import run_train

    cfg = load_config(os.path.join(FIXTURES, "synthetic_optic.yaml"))
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    cfg.LOG_DIR = str(tmp_path / "log")
    cfg.TPU.DATA_PARALLEL = 8
    cfg.TPU.AUTOAUGMENT = True
    cfg.TRAIN.BATCH_SIZE = 8
    cfg.TRAIN.END_EPOCH = 1

    best, out_dir = run_train(cfg, "synthetic_optic.yaml")
    with open(os.path.join(out_dir, "final_result.json")) as f:
        result = json.load(f)
    assert np.isfinite(result["avg_dsc"])


def test_cli_accepts_reference_distributed_flags():
    """A reference command line (`/root/reference/run.py:16-36` flag
    surface) parses unchanged; `--gpus N` maps onto the data mesh."""
    import run as cli

    args = cli.parse_args([
        "--cfg", os.path.join(FIXTURES, "synthetic_optic.yaml"),
        "--mode", "search", "--multiprocessing_distributed",
        "--world_size", "1", "--rank", "0", "--gpu", "0", "--gpus", "4",
        "-j", "4", "--dist_url", "tcp://localhost:10001",
        "--dist_backend", "nccl", "--seed", "7",
        "TRAIN.BATCH_SIZE", "8"])
    assert args.data_parallel == 4  # --gpus 4 → 4-way data mesh
    assert args.seed == 7
    assert args.opts == ["TRAIN.BATCH_SIZE", "8"]
    # single-gpu flags leave the auto default alone
    args = cli.parse_args(["--cfg", "x.yaml", "--gpus", "1"])
    assert args.data_parallel == -1


def test_resolve_data_parallel_auto_and_strict():
    from aadg_tpu.parallel.mesh import resolve_data_parallel
    import pytest

    # auto (-1): largest visible count dividing the batch
    assert resolve_data_parallel(-1, 8) == 8
    assert resolve_data_parallel(-1, 6) == 6
    assert resolve_data_parallel(-1, 12) == 6
    assert resolve_data_parallel(-1, 2) == 2
    assert resolve_data_parallel(-1, 13) == 1  # prime > n_devices
    # explicit: strict divisibility
    assert resolve_data_parallel(4, 8) == 4
    with pytest.raises(ValueError):
        resolve_data_parallel(8, 12)
