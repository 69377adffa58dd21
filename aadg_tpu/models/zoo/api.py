"""User-facing zoo inference API.

Equivalent of mmseg's ``apis/inference.py``
(`/root/reference/models/mmseg/apis/inference.py:11-127`):
``init_segmentor`` builds a zoo segmentor and optionally loads a msgpack
checkpoint, ``inference_segmentor`` runs normalize -> forward (whole or
slide) -> argmax on raw uint8 images, and ``show_result`` palette-blends a
prediction over the input (`segmentors/base.py` ``show_result``
semantics: ``img*(1-opacity) + color_seg*opacity``).

TPU-first: a jitted batched forward instead of the reference's
per-image pipeline + ``torch.no_grad`` loop; preprocessing is one
vectorized normalize (the mmseg test pipelines live in
`aadg_tpu/data/pipeline.py` for dataset-level evaluation).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .builder import build_segmentor
from .segmentor import segmentor_slide_inference

# mmseg img_norm_cfg defaults (ImageNet mean/std, RGB order)
IMAGENET_MEAN = (123.675, 116.28, 103.53)
IMAGENET_STD = (58.395, 57.12, 57.375)


def init_segmentor(arch: str, backbone: str, num_classes: int,
                   checkpoint: Optional[str] = None,
                   input_size: int = 64, seed: int = 0):
    """Build a zoo segmentor and its variables (`inference.py:11-41`).

    ``checkpoint`` is a flax-msgpack file holding the model's variable
    dict (as written by ``save_segmentor``). Returns (model, variables).
    """
    from flax import serialization

    model, _ = build_segmentor(arch, backbone, num_classes)
    x = jnp.zeros((1, input_size, input_size, 3), jnp.float32)
    # jitted: eager init dispatches per-op (a tunnel round trip each on
    # remote-attached TPUs); conv/BN params are input-size-independent
    variables = jax.jit(lambda k: model.init(k, x, train=False))(
        jax.random.PRNGKey(seed))
    if checkpoint:
        with open(checkpoint, "rb") as f:
            variables = serialization.from_bytes(variables, f.read())
    return model, variables


def save_segmentor(variables, path: str) -> None:
    """Write variables as flax msgpack (the ``init_segmentor`` format)."""
    from flax import serialization

    with open(path, "wb") as f:
        f.write(serialization.to_bytes(variables))


def inference_segmentor(model, variables, imgs,
                        mode: str = "whole",
                        crop: Optional[Tuple[int, int]] = None,
                        stride: Optional[Tuple[int, int]] = None,
                        mean: Sequence[float] = IMAGENET_MEAN,
                        std: Sequence[float] = IMAGENET_STD,
                        mesh=None,
                        dtype: Optional[str] = None):
    """Segment raw image(s) (`inference.py:69-98`).

    ``imgs``: one HWC array or a NHWC batch (uint8 or float, RGB).
    Returns a list of (H, W) int32 label maps, one per image — the
    reference's return shape.

    ``dtype``: serving compute dtype, e.g. ``"bfloat16"`` — f32 params
    and inputs are cast at the boundary so every conv/matmul runs on the
    MXU's native bf16 path (flax layers inherit the promoted input/param
    dtype). Predictions are argmax maps, so the ~3-decimal-digit bf16
    rounding only flips near-tie pixels.

    ``mesh``: a `jax.sharding.Mesh` — the TPU-native equivalent of
    mmseg's ``apis/test.py`` ``multi_gpu_test`` (per-rank model copies +
    cross-rank result collection): the batch is sharded over the mesh's
    first axis, params are replicated, and XLA runs the replicas in
    parallel over ICI. Predictions are bit-identical to single-device
    inference (eval-mode BN has no cross-sample coupling).
    """
    arr = np.asarray(imgs)
    single = arr.ndim == 3
    if single:
        arr = arr[None]
    x = (arr.astype(np.float32) - np.asarray(mean, np.float32)) \
        / np.asarray(std, np.float32)
    x = jnp.asarray(x)
    if dtype is not None:
        x = x.astype(dtype)
        variables = cast_variables(variables, dtype)
    n_orig = x.shape[0]
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        n_dev = int(np.prod(list(mesh.shape.values())))
        pad = (-n_orig) % n_dev
        if pad:  # pad to an even shard split, dropped after the forward
            x = jnp.concatenate([x, jnp.repeat(x[-1:], pad, axis=0)])
        x = jax.device_put(x, NamedSharding(mesh, P(mesh.axis_names[0])))
        variables = jax.device_put(variables, NamedSharding(mesh, P()))
    logits = _runner(model, mode, crop, stride)(variables, x)
    pred = np.asarray(jnp.argmax(logits, axis=-1).astype(jnp.int32))
    return [p for p in pred[:n_orig]]


def aug_test_segmentor(model, variables, img, *,
                       img_ratios=(0.5, 0.75, 1.0, 1.25, 1.5, 1.75),
                       flip: bool = True,
                       flip_direction: str = "horizontal",
                       mode: str = "whole",
                       crop: Optional[Tuple[int, int]] = None,
                       stride: Optional[Tuple[int, int]] = None,
                       mean: Sequence[float] = IMAGENET_MEAN,
                       std: Sequence[float] = IMAGENET_STD,
                       dtype: Optional[str] = None):
    """mmseg test-time augmentation: ``MultiScaleFlipAug`` views ->
    ``EncoderDecoder.aug_test`` averaging
    (`segmentors/encoder_decoder.py:228-294` via
    `pipelines/test_time_aug.py`): each (scale, flip) view is forwarded,
    its logits bilinear-rescaled to the original shape, softmaxed,
    un-flipped, and the mean over views is argmaxed. ``img_ratios`` +
    ``flip`` default to the standard mmseg TTA sweep.

    ``img``: one raw HWC image (uint8 or float, RGB). Returns an (H, W)
    int32 label map. Each distinct view shape compiles once (static
    shapes); repeat calls at the same image size reuse the programs.
    """
    from ...data.pipeline import (MultiScaleFlipAug, Normalize, RandomFlip,
                                  Resize)
    from .layers import resize as _resize

    img = np.asarray(img)
    h, w = img.shape[:2]
    # mmseg test-config shape: the TTA wrapper presets scale/flip per
    # view and the inner transforms do the work (`test_time_aug.py`)
    tta = MultiScaleFlipAug(
        transforms=[Resize(keep_ratio=True), RandomFlip(),
                    Normalize(mean, std)],
        img_scale=None, img_ratios=list(img_ratios), flip=flip,
        flip_direction=flip_direction)
    views = tta({"img": img})
    if dtype is not None:
        variables = cast_variables(variables, dtype)
    run = _runner(model, mode, crop, stride)
    acc = None
    for x_np, flipped, direction in zip(
            views["img"], views["flip"], views["flip_direction"]):
        x = jnp.asarray(x_np[None])
        if dtype is not None:
            x = x.astype(dtype)
        logits = run(variables, x)
        # rescale logits to ori_shape, THEN softmax, THEN un-flip —
        # the reference's exact order (`encoder_decoder.py:216-261`)
        logits = _resize(logits.astype(jnp.float32), (h, w))
        prob = jax.nn.softmax(logits, axis=-1)
        if flipped:
            axis = 2 if direction == "horizontal" else 1
            prob = jnp.flip(prob, axis=axis)
        acc = prob if acc is None else acc + prob
    return np.asarray(jnp.argmax(acc[0], axis=-1).astype(jnp.int32))


def cast_variables(variables, dtype):
    """Cast every f32 leaf (params AND batch_stats) to ``dtype``; integer
    and non-f32 leaves pass through."""
    import jax.numpy as _jnp

    def leaf(a):
        if hasattr(a, "dtype") and a.dtype == _jnp.float32:
            return a.astype(dtype)
        return a
    return jax.tree_util.tree_map(leaf, variables)


_RUNNERS: dict = {}


def _runner(model, mode: str, crop, stride):
    """Jitted forward for (model, mode, crop, stride), cached so repeat
    ``inference_segmentor`` calls reuse the compiled program (flax modules
    hash structurally, so equal configs share one entry).

    Variables ride as a jit ARGUMENT: closure-captured params become
    program constants re-shipped every call on remote-attached backends.
    """
    key = (model, mode, crop, stride)
    try:
        run = _RUNNERS.get(key)
    except TypeError:  # unhashable field in the module config — uncached
        key = None
        run = None
    if run is not None:
        return run
    if mode == "slide":
        assert crop is not None and stride is not None
        num_classes = _num_classes(model)

        @jax.jit
        def run(v, images):
            return segmentor_slide_inference(
                lambda w: model.apply(v, w, train=False), images,
                crop, stride, num_classes)
    elif mode == "whole":
        @jax.jit
        def run(v, images):
            logits, _ = model.apply(v, images, train=False)
            return logits
    else:
        raise ValueError(mode)
    if key is not None:
        while len(_RUNNERS) >= 16:  # bound: drop oldest compiled program
            _RUNNERS.pop(next(iter(_RUNNERS)))
        _RUNNERS[key] = run
    return run


def _num_classes(model) -> int:
    head = getattr(model, "cascade_heads", None)
    if head:
        return head[-1].num_classes
    return model.decode_head.num_classes


def default_palette(num_classes: int) -> np.ndarray:
    """mmseg's fallback random palette (`base.py show_result`): seeded
    state, uint8 RGB triples."""
    state = np.random.RandomState(42)
    return state.randint(0, 255, size=(num_classes, 3), dtype=np.uint8)


def show_result(img, seg, palette=None, opacity: float = 0.5):
    """Blend a label map over the image; returns uint8 HWC
    (`base.py show_result`: color_seg per class, 50/50 blend)."""
    assert 0.0 < opacity <= 1.0
    img = np.asarray(img).astype(np.float32)
    seg = np.asarray(seg)
    n = int(seg.max()) + 1 if palette is None else len(palette)
    pal = default_palette(n) if palette is None \
        else np.asarray(palette, np.uint8)
    color = pal[np.clip(seg, 0, len(pal) - 1)].astype(np.float32)
    out = img * (1.0 - opacity) + color * opacity
    return out.astype(np.uint8)
