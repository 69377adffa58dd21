"""AOT serving export (`aadg_tpu/models/zoo/export.py`): the serialized
StableHLO artifact reproduces live inference, serves a SYMBOLIC batch
dimension, and round-trips through bytes with no model code involved."""

import numpy as np
import pytest

from aadg_tpu.models.zoo.api import inference_segmentor, init_segmentor
from aadg_tpu.models.zoo.export import (export_segmentor, load_serving_fn,
                                        make_serving_fn)


@pytest.mark.slow
def test_export_roundtrip_matches_live_inference(rng):
    model, variables = init_segmentor("fcn", "cgnet", num_classes=4,
                                      input_size=32)
    blob = export_segmentor(model, variables, 32, platforms=("cpu",))
    assert isinstance(blob, bytes) and len(blob) > 0

    fn, exp = load_serving_fn(blob)
    assert "cpu" in [p.lower() for p in exp.platforms]

    # symbolic batch: one artifact, several batch sizes
    for n in (1, 3):
        imgs = rng.integers(0, 256, size=(n, 32, 32, 3), dtype=np.uint8)
        preds = np.asarray(fn(imgs))
        assert preds.shape == (n, 32, 32) and preds.dtype == np.int32
        live = inference_segmentor(model, variables, imgs)
        np.testing.assert_array_equal(preds, np.stack(live))


@pytest.mark.slow
def test_export_slide_and_bf16(rng):
    model, variables = init_segmentor("fcn", "cgnet", num_classes=3,
                                      input_size=16)
    blob = export_segmentor(model, variables, 32, platforms=("cpu",),
                            mode="slide", crop=(16, 16), stride=(8, 8),
                            dtype="bfloat16")
    fn, _ = load_serving_fn(blob)
    imgs = rng.integers(0, 256, size=(2, 32, 32, 3), dtype=np.uint8)
    preds = np.asarray(fn(imgs))
    assert preds.shape == (2, 32, 32)
    # bf16 serving ≈ f32 live path: argmax maps mostly agree (random-init
    # logits are near-tie, so allow bf16 rounding to flip a minority)
    live = np.stack(inference_segmentor(
        model, variables, imgs, mode="slide", crop=(16, 16),
        stride=(8, 8)))
    assert (preds == live).mean() > 0.7


@pytest.mark.slow
def test_serving_fn_bakes_weights(rng):
    """The serving fn closes over variables: same input -> same output
    irrespective of any later variables object mutation."""
    import jax

    model, variables = init_segmentor("fcn", "cgnet", num_classes=3,
                                      input_size=16)
    serve = jax.jit(make_serving_fn(model, variables))
    imgs = rng.integers(0, 256, size=(1, 16, 16, 3), dtype=np.uint8)
    a = np.asarray(serve(imgs))
    b = np.asarray(serve(imgs))
    np.testing.assert_array_equal(a, b)
