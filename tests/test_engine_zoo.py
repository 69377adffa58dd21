"""E2E: a zoo segmentor (MODEL.NAME from ZOO_ARCHS) through the real
search engine on synthetic data — proves the engine is model-agnostic."""

import json
import os

import pytest

from aadg_tpu.config import load_config

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.mark.heavy
def test_zoo_model_search_end_to_end(tmp_path):
    from aadg_tpu.engine.search import run_search
    cfg = load_config(os.path.join(FIXTURES, "synthetic_optic.yaml"))
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    cfg.LOG_DIR = str(tmp_path / "log")
    cfg.MODEL.NAME = "lraspp"
    cfg.MODEL.BACKBONE = "mobilenet_v3_small"
    best, out_dir = run_search(cfg, "synthetic_optic.yaml")
    assert os.path.exists(os.path.join(out_dir, "final_result.json"))
    with open(os.path.join(out_dir, "final_result.json")) as f:
        result = json.load(f)
    assert 0.0 <= result["avg_dsc"] <= 1.0
