"""AOT serving export: serialize the whole normalize->forward->argmax
program as portable StableHLO via ``jax.export``.

A production capability the reference has no analogue of (its serving
story is "load the torch pickle and run eager modules"): here the
compiled inference program — preprocessing, the segmentor forward (whole
or sliding-window), and the argmax — is exported ONCE with a **symbolic
batch dimension** and can be deserialized and executed by any JAX
process (or a C++ PjRT runtime via the StableHLO module) without the
model's Python code, flax, or retracing. Weights are baked into the
artifact as constants, so the artifact is the complete serving unit.

Usage::

    blob = export_segmentor(model, variables, input_size=512)
    open("seg.jaxexp", "wb").write(blob)
    # ... later, anywhere (no aadg_tpu import needed):
    from jax import export
    fn = export.deserialize(blob).call
    preds = fn(raw_uint8_images)          # any batch size

CLI: ``python tools/export_serving.py --arch fcn --backbone cgnet ...``.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .api import IMAGENET_MEAN, IMAGENET_STD, _num_classes, cast_variables
from .segmentor import segmentor_slide_inference


def make_serving_fn(model, variables, mode: str = "whole",
                    crop: Optional[Tuple[int, int]] = None,
                    stride: Optional[Tuple[int, int]] = None,
                    mean: Sequence[float] = IMAGENET_MEAN,
                    std: Sequence[float] = IMAGENET_STD,
                    dtype: Optional[str] = None):
    """The full serving program as one pure fn of the raw input batch:
    uint8/f32 NHWC RGB -> (N, H, W) int32 label maps. ``variables`` are
    closure-baked (they become constants of the exported artifact).
    ``dtype="bfloat16"`` casts params+activations at the boundary for
    MXU-native serving (argmax outputs only flip on near-tie pixels)."""
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    if mode == "slide":
        # fail at build time with a clear message, not an unpack TypeError
        # inside slide_inference at trace time (mirrors api._runner's guard)
        assert crop is not None and stride is not None, \
            "mode='slide' requires crop=(h, w) and stride=(h, w)"
    if dtype is not None:
        variables = cast_variables(variables, dtype)

    def serve(images):
        x = (images.astype(jnp.float32) - mean) / std
        if dtype is not None:
            x = x.astype(dtype)
        if mode == "slide":
            logits = segmentor_slide_inference(
                lambda w: model.apply(variables, w, train=False), x,
                crop, stride, _num_classes(model))
        elif mode == "whole":
            logits, _ = model.apply(variables, x, train=False)
        else:
            raise ValueError(mode)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    return serve


def export_segmentor(model, variables, input_size,
                     batch: Optional[str] = "b",
                     platforms: Optional[Sequence[str]] = None,
                     input_dtype=jnp.uint8, **serve_kw) -> bytes:
    """Export the serving program to serialized-``jax.export`` bytes.

    ``input_size``: int or (H, W) — spatial dims are static (XLA tiling
    wants static shapes; export one artifact per serving resolution).
    ``batch``: symbolic-dimension name for the leading axis (one artifact
    serves ANY batch size), or None to pin batch=1.
    ``platforms``: lowering targets, e.g. ``("tpu", "cpu")``; defaults to
    the current backend.
    """
    from jax import export as jexport

    if isinstance(input_size, int):
        input_size = (input_size, input_size)
    h, w = input_size
    if batch is not None:
        (b,) = jexport.symbolic_shape(batch)
    else:
        b = 1
    spec = jax.ShapeDtypeStruct((b, h, w, 3), input_dtype)
    serve = jax.jit(make_serving_fn(model, variables, **serve_kw))
    exp = jexport.export(
        serve,
        platforms=tuple(platforms) if platforms else None)(spec)
    return bytes(exp.serialize())


def load_serving_fn(blob: bytes):
    """Deserialize an exported artifact into a callable (and return the
    ``Exported`` alongside for introspection)."""
    from jax import export as jexport

    exp = jexport.deserialize(blob)
    return exp.call, exp
