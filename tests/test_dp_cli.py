"""End-to-end data-parallel search through the orchestrator (8 virtual
CPU devices): the CLI's ``--data_parallel`` path."""

import json
import os

import numpy as np

from aadg_tpu.config import load_config

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
