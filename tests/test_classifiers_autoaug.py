import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # CIFAR classifiers + autoaug e2e: ~110 s
import jax
import jax.numpy as jnp

from aadg_tpu.models.classifiers import ResNetCIFAR, WideResNet

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def test_resnet_cifar_forward():
    model = ResNetCIFAR(depth=20, num_classes=10)
    x = jnp.zeros((2, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (2, 10)


def test_wideresnet_forward():
    model = WideResNet(depth=10, widen_factor=2, num_classes=10)
    x = jnp.zeros((2, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (2, 10)


def test_autoaug_train_step():
    from aadg_tpu.config import load_config
    from aadg_tpu.engine.state import build_entities, init_state
    from aadg_tpu.engine.steps import make_autoaug_train_step
    from aadg_tpu.data.datasets import SyntheticDataset, load_train_arrays
    from aadg_tpu.data.stores import make_train_store, sample_train_batch

    cfg = load_config(os.path.join(FIXTURES, "synthetic_rvs.yaml"))
    ds = SyntheticDataset("rvs", 3, 4, 64)
    store = make_train_store(*load_train_arrays(ds))
    ent = build_entities(cfg, "train", 1)
    sd, cs = init_state(ent, jax.random.PRNGKey(0))
    step = jax.jit(make_autoaug_train_step(ent))
    batch = sample_train_batch(store, jax.random.PRNGKey(1), 2)
    ptens = jnp.zeros((1, 5, 2, 2), jnp.int32)
    new_sd, metrics = step(sd, batch, ptens, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["seg_loss"]))


def test_autoaug_train_mode_end_to_end(tmp_path):
    from aadg_tpu.config import load_config
    from aadg_tpu.engine.train import run_train

    cfg = load_config(os.path.join(FIXTURES, "synthetic_rvs.yaml"))
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    cfg.LOG_DIR = str(tmp_path / "log")
    cfg.TRAIN.END_EPOCH = 1
    cfg.TPU.AUTOAUGMENT = True
    best, out_dir = run_train(cfg, "synthetic_rvs.yaml")
    assert os.path.exists(os.path.join(out_dir, "final_result.json"))
