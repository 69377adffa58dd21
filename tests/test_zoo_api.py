"""Zoo inference API: init/save/load round-trip, whole+slide inference,
palette blending (mmseg `apis/inference.py` surface)."""

import numpy as np
import pytest

from aadg_tpu.models.zoo.api import (default_palette, inference_segmentor,
                                     init_segmentor, save_segmentor,
                                     show_result)


@pytest.mark.slow
def test_init_inference_roundtrip(tmp_path, rng):
    model, variables = init_segmentor("fcn", "cgnet", num_classes=4,
                                      input_size=32)
    img = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    out = inference_segmentor(model, variables, img)
    assert len(out) == 1 and out[0].shape == (32, 32)
    assert out[0].dtype == np.int32 and set(np.unique(out[0])) <= set(range(4))

    # save -> reload -> identical prediction
    ckpt = str(tmp_path / "seg.msgpack")
    save_segmentor(variables, ckpt)
    _, v2 = init_segmentor("fcn", "cgnet", num_classes=4,
                           checkpoint=ckpt, input_size=32, seed=7)
    out2 = inference_segmentor(model, v2, img)
    np.testing.assert_array_equal(out[0], out2[0])

    # batched input -> list of per-image maps
    batch = rng.integers(0, 256, size=(2, 32, 32, 3), dtype=np.uint8)
    outs = inference_segmentor(model, variables, batch)
    assert len(outs) == 2


@pytest.mark.slow
def test_slide_inference_mode(rng):
    model, variables = init_segmentor("fcn", "cgnet", num_classes=3,
                                      input_size=16)
    img = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    out = inference_segmentor(model, variables, img, mode="slide",
                              crop=(16, 16), stride=(8, 8))
    assert out[0].shape == (32, 32)


@pytest.mark.slow
def test_mesh_sharded_inference_matches_single_device(rng):
    """`apis/test.py` multi_gpu_test equivalent: batch sharded over the
    mesh + replicated params gives the single-device predictions (with
    ragged batches padded up to the device count)."""
    from aadg_tpu.parallel.mesh import make_mesh

    model, variables = init_segmentor("fcn", "cgnet", num_classes=3,
                                      input_size=16)
    batch = rng.integers(0, 256, size=(5, 16, 16, 3), dtype=np.uint8)
    single = inference_segmentor(model, variables, batch)
    sharded = inference_segmentor(model, variables, batch,
                                  mesh=make_mesh(8))
    assert len(sharded) == len(single) == 5
    for a, b in zip(single, sharded):
        np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_bf16_serving_dtype_agrees_with_f32(rng):
    """dtype='bfloat16' casts params+inputs at the boundary; argmax maps
    should agree with f32 except at near-tie pixels."""
    model, variables = init_segmentor("fcn", "cgnet", num_classes=3,
                                      input_size=16)
    img = rng.integers(0, 256, size=(2, 16, 16, 3), dtype=np.uint8)
    f32 = inference_segmentor(model, variables, img)
    bf16 = inference_segmentor(model, variables, img, dtype="bfloat16")
    agree = np.mean([np.mean(a == b) for a, b in zip(f32, bf16)])
    assert agree > 0.9, agree


def test_show_result_blend(rng):
    img = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    seg = rng.integers(0, 3, size=(8, 8))
    pal = default_palette(3)
    out = show_result(img, seg, palette=pal, opacity=0.5)
    assert out.shape == (8, 8, 3) and out.dtype == np.uint8
    exp = (img.astype(np.float32) * 0.5
           + pal[seg].astype(np.float32) * 0.5).astype(np.uint8)
    np.testing.assert_array_equal(out, exp)


@pytest.mark.slow  # 12-view TTA compile: 48 s warm (r5 tiering)
def test_aug_test_tta_matches_reference_math(rng):
    """aug_test_segmentor == hand-rolled mmseg aug_test: per-view forward
    -> logits resized to ori_shape -> softmax -> un-flip -> mean -> argmax
    (`encoder_decoder.py:216-294`), with the views built by the SAME
    MultiScaleFlipAug pipeline the reference's test config uses."""
    import jax
    import jax.numpy as jnp
    from aadg_tpu.models.zoo.api import aug_test_segmentor
    from aadg_tpu.models.zoo.layers import resize
    from aadg_tpu.data.pipeline import (MultiScaleFlipAug, Normalize,
                                        RandomFlip, Resize)
    from aadg_tpu.models.zoo.api import IMAGENET_MEAN, IMAGENET_STD

    model, variables = init_segmentor("fcn", "cgnet", num_classes=4,
                                      input_size=32)
    img = rng.integers(0, 256, size=(33, 47, 3), dtype=np.uint8)

    # identity TTA reduces to plain whole inference
    plain = inference_segmentor(model, variables, img)[0]
    ident = aug_test_segmentor(model, variables, img, img_ratios=(1.0,),
                               flip=False)
    np.testing.assert_array_equal(ident, plain)

    # full sweep vs independent reconstruction of the reference math
    ratios, h, w = (0.5, 1.0, 1.5), img.shape[0], img.shape[1]
    got = aug_test_segmentor(model, variables, img, img_ratios=ratios,
                             flip=True)
    views = MultiScaleFlipAug(
        transforms=[Resize(keep_ratio=True), RandomFlip(),
                    Normalize(IMAGENET_MEAN, IMAGENET_STD)],
        img_scale=None, img_ratios=list(ratios),
        flip=True)({"img": img})
    assert len(views["img"]) == 6  # 3 scales x (no-flip, flip)
    acc = None
    for x_np, flipped in zip(views["img"], views["flip"]):
        logits, _ = model.apply(variables, jnp.asarray(x_np[None]),
                                train=False)
        prob = jax.nn.softmax(resize(logits, (h, w)), axis=-1)
        if flipped:
            prob = jnp.flip(prob, axis=2)
        acc = prob if acc is None else acc + prob
    want = np.asarray(jnp.argmax(acc[0], -1))
    np.testing.assert_array_equal(got, want)
