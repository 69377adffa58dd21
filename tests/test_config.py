import os

import pytest

from aadg_tpu.config import default_config, load_config


REF_OPTIC_YAML = """\
PRINT_FREQ: 10
DATASET:
  NAME: optic
  ROOT: './dataset/Fundus/'
  DG:
    TRAIN: [1, 2, 3]
    TEST: [4]
MODEL:
  NAME: deeplabv3+
  BACKBONE: mobilenet_v2
CONTROLLER:
  LOSS: ppo
  M: 6
  T: 2
  C: 2.5
DISCRIMINATOR:
  NAME: momentum_feature
TRAIN:
  LR: 0.001
  WD: 0.0
  BATCH_SIZE: 8
  WARMUP_EPOCH: 30
  END_EPOCH: 150
"""


def test_defaults_match_reference_schema():
    cfg = default_config()
    assert cfg.CONTROLLER.M == 6
    assert cfg.CONTROLLER.NUM_MAGS == 10
    assert cfg.DATASET.DG.TRAIN == [1, 2, 3]
    assert cfg.TRAIN.BATCH_SIZE == 8


def test_merge_reference_yaml(tmp_path):
    p = tmp_path / "diversity.yaml"
    p.write_text(REF_OPTIC_YAML)
    cfg = load_config(str(p))
    assert cfg.DATASET.NAME == "optic"
    assert cfg.TRAIN.WARMUP_EPOCH == 30
    assert cfg.TRAIN.END_EPOCH == 150
    assert cfg.CONTROLLER.LOSS == "ppo"
    assert cfg.CONTROLLER.C == 2.5
    # untouched defaults survive
    assert cfg.CONTROLLER.NUM_MAGS == 10


def test_freeze_blocks_writes():
    cfg = default_config()
    cfg.freeze()
    with pytest.raises(AttributeError):
        cfg.SEED = 5
    with pytest.raises(AttributeError):
        cfg.TRAIN.LR = 0.5
    cfg.defrost()
    cfg.SEED = 5
    assert cfg.SEED == 5


def test_merge_from_list_coerces_types():
    cfg = default_config()
    cfg.merge_from_list(["TRAIN.LR", "0.01", "TRAIN.BATCH_SIZE", "16",
                         "DATASET.NAME", "rvs"])
    assert cfg.TRAIN.LR == 0.01 and isinstance(cfg.TRAIN.LR, float)
    assert cfg.TRAIN.BATCH_SIZE == 16
    assert cfg.DATASET.NAME == "rvs"


def test_unknown_key_rejected(tmp_path):
    p = tmp_path / "bad.yaml"
    p.write_text("NO_SUCH_KEY: 1\n")
    with pytest.raises(KeyError):
        load_config(str(p))


def test_real_experiment_yamls_load():
    exp_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "experiments")
    count = 0
    for root, _, files in os.walk(exp_dir):
        for f in files:
            if f.endswith(".yaml"):
                load_config(os.path.join(root, f))
                count += 1
    assert count >= 8  # 4 optic + 4 rvs leave-one-out configs
