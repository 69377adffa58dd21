"""mmseg dataset surface: the 6 general datasets, AlignedResize,
MaillaryHack, the registry builder, and a zoo segmentor training through
``pipeline.py`` data end-to-end (VERDICT r1 item 5; reference:
`/root/reference/models/mmseg/datasets/{ade,voc,pascal_context,
cityscapes,cocostuff,mapillary}.py` + `pipelines/transforms.py`)."""

import os

import numpy as np
import pytest
from PIL import Image

from aadg_tpu.data.pipeline import (ADE20KDataset, AlignedResize,
                                    CityscapesDataset, CocoStuffDataset,
                                    MaillaryHack, MapillaryDataset,
                                    Normalize, Pad, PascalContextDataset,
                                    PascalVOCDataset, RandomCrop,
                                    RandomFlip, Resize,
                                    build_pipeline_dataset)

RNG = np.random.default_rng(3)


def _tree(tmp_path, img_suffix, seg_suffix, n=2, size=40, n_classes=8,
          stems=None):
    img_dir = tmp_path / "images"
    ann_dir = tmp_path / "annotations"
    img_dir.mkdir(exist_ok=True)
    ann_dir.mkdir(exist_ok=True)
    stems = stems or [f"s{i}" for i in range(n)]
    for stem in stems:
        Image.fromarray(
            RNG.integers(0, 256, (size, size, 3), dtype=np.uint8)).save(
            img_dir / f"{stem}{img_suffix}")
        Image.fromarray(
            RNG.integers(0, n_classes, (size, size)).astype(np.uint8)).save(
            ann_dir / f"{stem}{seg_suffix}")
    return str(img_dir), str(ann_dir), stems


class TestDatasetClasses:
    def test_ade20k_reduce_zero_label(self, tmp_path):
        img_dir, ann_dir, _ = _tree(tmp_path, ".jpg", ".png")
        ds = ADE20KDataset(pipeline=[], img_dir=img_dir, ann_dir=ann_dir)
        assert len(ds.CLASSES) == 150 and len(ds.PALETTE) == 150
        assert ds.reduce_zero_label is True
        sample = ds[0]
        seg = sample["gt_semantic_seg"]
        # label 0 -> 255 ignore, k -> k-1
        assert set(np.unique(seg)) <= set(range(7)) | {255}
        assert sample["img"].shape == (40, 40, 3)

    def test_voc_and_context_require_split(self, tmp_path):
        img_dir, ann_dir, stems = _tree(tmp_path, ".jpg", ".png", n=3)
        split = tmp_path / "train.txt"
        split.write_text("\n".join(stems[:2]) + "\n")
        ds = PascalVOCDataset(split=str(split), pipeline=[],
                              img_dir=img_dir, ann_dir=ann_dir)
        assert len(ds) == 2 and len(ds.CLASSES) == 21
        ctx = PascalContextDataset(split=str(split), pipeline=[],
                                   img_dir=img_dir, ann_dir=ann_dir)
        assert len(ctx.CLASSES) == 60
        assert ctx.reduce_zero_label is False

    def test_cityscapes_suffixes_and_eval(self, tmp_path):
        img_dir, ann_dir, _ = _tree(
            tmp_path, "_leftImg8bit.png", "_gtFine_labelTrainIds.png",
            n_classes=19)
        ds = CityscapesDataset(pipeline=[], img_dir=img_dir,
                               ann_dir=ann_dir)
        assert len(ds.CLASSES) == 19
        res = ds.evaluate(ds.get_gt_seg_maps(), metric="mIoU")
        assert len(res["mIoU"]) == 19
        # perfect predictions -> IoU 1 on present classes
        present = np.asarray(res["mIoU"])
        assert np.nanmax(present) == pytest.approx(1.0)

    def test_cityscapes_format_results(self, tmp_path):
        img_dir, ann_dir, stems = _tree(
            tmp_path, "_leftImg8bit.png", "_gtFine_labelTrainIds.png",
            n_classes=19)
        ds = CityscapesDataset(pipeline=[], img_dir=img_dir,
                               ann_dir=ann_dir)
        preds = [np.full((40, 40), t, np.uint8)
                 for t in range(len(ds))]
        files, tmp_dir = ds.format_results(
            preds, imgfile_prefix=str(tmp_path / "sub"))
        assert tmp_dir is None and len(files) == len(ds)
        out = np.asarray(Image.open(files[0]))  # P-mode: raw indices
        # trainId 0 (road) -> labelId 7 in the submission png
        assert set(np.unique(out)) == {7}
        assert Image.open(files[1]).mode == "P"

    def test_cocostuff_and_mapillary_metadata(self, tmp_path):
        img_dir, ann_dir, _ = _tree(tmp_path, ".jpg", ".png")
        cs = CocoStuffDataset(pipeline=[], img_dir=img_dir,
                              ann_dir=ann_dir)
        assert len(cs.CLASSES) == 182 == len(cs.PALETTE)
        mv = MapillaryDataset(pipeline=[], img_dir=img_dir,
                              ann_dir=ann_dir)
        assert len(mv.CLASSES) == 66 == len(mv.PALETTE)
        assert mv[0]["img"].shape == (40, 40, 3)


class TestNewTransforms:
    def test_aligned_resize_divisible(self):
        img = RNG.integers(0, 256, (37, 53, 3), dtype=np.uint8)
        seg = RNG.integers(0, 5, (37, 53)).astype(np.int64)
        r = AlignedResize(img_scale=(100, 70), keep_ratio=True,
                          size_divisor=32)
        out = r(dict(img=img, gt_semantic_seg=seg))
        h, w = out["img"].shape[:2]
        assert h % 32 == 0 and w % 32 == 0
        assert out["gt_semantic_seg"].shape == (h, w)
        # seg resampled nearest: no new label values invented
        assert set(np.unique(out["gt_semantic_seg"])) <= set(range(5))

    def test_maillary_hack_lut(self):
        seg = np.array([[13, 24, 41, 2], [15, 17, 52, 0],
                        [65, 55, 61, 30]], np.int64)
        out = MaillaryHack()(dict(gt_semantic_seg=seg))["gt_semantic_seg"]
        expect = np.array([[0, 0, 0, 1], [1, 2, 18, 255],
                           [255, 13, 14, 8]], np.int64)
        np.testing.assert_array_equal(out, expect)


class TestBuilder:
    def test_build_from_mmseg_style_dicts(self, tmp_path):
        img_dir, ann_dir, _ = _tree(tmp_path, ".jpg", ".png")
        cfg = dict(
            type="RepeatDataset", times=3,
            dataset=dict(
                type="ADE20KDataset", img_dir=img_dir, ann_dir=ann_dir,
                pipeline=[
                    dict(type="LoadImageFromFile"),
                    dict(type="LoadAnnotations", reduce_zero_label=True),
                    dict(type="Resize", img_scale=(48, 48),
                         keep_ratio=False),
                    dict(type="RandomFlip", prob=0.5),
                    dict(type="Normalize", mean=[123.675, 116.28, 103.53],
                         std=[58.395, 57.12, 57.375], to_rgb=True),
                    dict(type="Pad", size=(64, 64)),
                ]))
        ds = build_pipeline_dataset(cfg)
        assert len(ds) == 6
        s = ds[4]
        assert s["img"].shape == (64, 64, 3)
        assert s["gt_semantic_seg"].shape == (64, 64)
        # pad fills seg with ignore
        assert (s["gt_semantic_seg"][:, 50:] == 255).all()

    def test_load_annotations_reduce_zero_label_plumbed(self, tmp_path):
        # mmseg configs put reduce_zero_label on the LoadAnnotations
        # step (`pipelines/loading.py:105`); the builder must forward
        # it to the dataset instead of silently dropping the loader dict
        img_dir, ann_dir, _ = _tree(tmp_path, ".jpg", ".png")
        ds = build_pipeline_dataset(dict(
            type="CustomDataset", img_dir=img_dir, ann_dir=ann_dir,
            img_suffix=".jpg",
            pipeline=[
                dict(type="LoadImageFromFile"),
                dict(type="LoadAnnotations", reduce_zero_label=True),
            ]))
        assert ds.reduce_zero_label is True
        seg = ds[0]["gt_semantic_seg"]
        assert set(np.unique(seg)) <= set(range(7)) | {255}
        # an explicit dataset-level flag wins over the loader step's
        ds2 = build_pipeline_dataset(dict(
            type="CustomDataset", img_dir=img_dir, ann_dir=ann_dir,
            img_suffix=".jpg", reduce_zero_label=False,
            pipeline=[dict(type="LoadAnnotations",
                           reduce_zero_label=True)]))
        assert ds2.reduce_zero_label is False

    def test_builder_rejects_unknown_kwarg(self, tmp_path):
        img_dir, ann_dir, _ = _tree(tmp_path, ".jpg", ".png")
        with pytest.raises(KeyError):
            build_pipeline_dataset(dict(type="NopeDataset",
                                        img_dir=img_dir, pipeline=[]))


@pytest.mark.slow
def test_zoo_segmentor_trains_through_pipeline_data(tmp_path):
    """End-to-end: CityscapesDataset tree -> mmseg-style train pipeline ->
    batched jax arrays -> supervised steps on a zoo segmentor
    (fcn / mobilenet_v3_small): losses finite and decreasing-ish."""
    import jax
    import jax.numpy as jnp
    import optax
    from aadg_tpu.models.zoo.builder import build_segmentor
    from aadg_tpu.models.zoo.losses import cross_entropy

    img_dir, ann_dir, _ = _tree(
        tmp_path, "_leftImg8bit.png", "_gtFine_labelTrainIds.png",
        n=4, size=72, n_classes=19)
    rng = np.random.default_rng(0)
    cfg = dict(
        type="CityscapesDataset", img_dir=img_dir, ann_dir=ann_dir,
        pipeline=[
            Resize(img_scale=(64, 64), keep_ratio=False, rng=rng),
            RandomCrop(crop_size=(64, 64), rng=rng),
            RandomFlip(prob=0.5, rng=rng),
            Normalize(mean=[123.675, 116.28, 103.53],
                      std=[58.395, 57.12, 57.375]),
        ])
    ds = build_pipeline_dataset(cfg)

    def batch(idxs):
        samples = [ds[i] for i in idxs]
        return (jnp.stack([s["img"] for s in samples]).astype(jnp.float32),
                jnp.stack([s["gt_semantic_seg"] for s in samples]))

    model, _ = build_segmentor("fcn", "mobilenet_v3_small", 19)
    x0, _ = batch([0, 1])
    variables = model.init(jax.random.PRNGKey(0), x0, train=True)
    params, stats = variables["params"], variables.get("batch_stats", {})
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, stats, opt, x, y, key):
        def loss_fn(p):
            (logits, _), new = model.apply(
                {"params": p, "batch_stats": stats}, x, train=True,
                mutable=["batch_stats"], rngs={"dropout": key})
            return cross_entropy(logits, y, ignore_index=255), \
                new["batch_stats"]
        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        upd, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, upd), new_stats, opt, loss

    losses = []
    for i in range(4):
        x, y = batch([(2 * i) % 4, (2 * i + 1) % 4])
        params, stats, opt, loss = step(params, stats, opt, x, y,
                                        jax.random.PRNGKey(i + 1))
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0] * 1.5  # training, not diverging


def test_get_classes_get_palette_registry():
    """`core/evaluation/class_names.py:121-155` alias lookup."""
    from aadg_tpu.data.dataset_meta import get_classes, get_palette
    import pytest as _pytest
    assert len(get_classes("ade20k")) == 150
    assert len(get_classes("ade")) == 150
    assert len(get_classes("cityscapes")) == 19
    assert len(get_palette("cityscapes")) == 19
    assert len(get_classes("voc")) == 21
    assert len(get_classes("cocostuff")) == len(get_palette("coco-stuff"))
    assert len(get_classes("mapillary")) == 66
    with _pytest.raises(ValueError):
        get_classes("imagenet")


@pytest.mark.slow
def test_train_segmentor_api_with_ohem_and_eval(tmp_path):
    """mmseg `apis/train.py::train_segmentor` equivalent: pipeline data ->
    jitted supervised steps with the OHEM sampler, EvalHook-style periodic
    dataset.evaluate, and aux-head deep supervision."""
    import jax
    from aadg_tpu.models.zoo.builder import build_backbone
    from aadg_tpu.models.zoo.heads import FCNHead
    from aadg_tpu.models.zoo.segmentor import EncoderDecoder
    from aadg_tpu.models.zoo.train_api import (evaluate_segmentor,
                                               train_segmentor)

    img_dir, ann_dir, _ = _tree(tmp_path, ".jpg", ".png", n=4, size=32,
                                n_classes=4)
    rng = np.random.default_rng(0)
    cfg = dict(
        type="CustomDataset", img_dir=img_dir, ann_dir=ann_dir,
        img_suffix=".jpg", seg_map_suffix=".png",
        pipeline=[RandomFlip(prob=0.5, rng=rng),
                  Normalize(mean=[127.5] * 3, std=[127.5] * 3)])
    ds = build_pipeline_dataset(cfg)

    bb, feat_ch = build_backbone("cgnet")
    model = EncoderDecoder(
        backbone=bb,
        decode_head=FCNHead(num_classes=4, channels=32, num_convs=1,
                            concat_input=False),
        auxiliary_heads=(FCNHead(num_classes=4, channels=16, num_convs=1,
                                 concat_input=False, in_index=1),),
        feat_ch=feat_ch)

    logs = []
    variables, hist = train_segmentor(
        model, ds, max_iters=6, batch_size=2, lr=1e-2,
        sampler=dict(type="OHEMPixelSampler", thresh=0.7, min_kept=200),
        eval_dataset=ds, eval_interval=3, log_fn=logs.append)
    assert len(hist["loss"]) == 6 and all(np.isfinite(hist["loss"]))
    assert len(hist["eval"]) == 2
    for ev in hist["eval"]:
        assert "mIoU" in ev and "aAcc" in ev
        assert np.isfinite(ev["aAcc"])
    assert logs  # EvalHook-style logging fired

    final = evaluate_segmentor(model, variables, ds)
    assert 0.0 <= final["aAcc"] <= 1.0


class TestLoaderArgPlumbing:
    def test_to_float32_plumbed_and_unknown_args_rejected(self, tmp_path):
        img_dir, ann_dir, _ = _tree(tmp_path, ".jpg", ".png")
        ds = build_pipeline_dataset(dict(
            type="CustomDataset", img_dir=img_dir, ann_dir=ann_dir,
            img_suffix=".jpg",
            pipeline=[dict(type="LoadImageFromFile", to_float32=True),
                      dict(type="LoadAnnotations")]))
        assert ds[0]["img"].dtype == np.float32
        with pytest.raises(AssertionError):
            build_pipeline_dataset(dict(
                type="CustomDataset", img_dir=img_dir, img_suffix=".jpg",
                pipeline=[dict(type="LoadImageFromFile",
                               imdecode_backend="turbojpeg")]))


@pytest.mark.slow  # eval spill e2e: 21 s warm (r5 tiering)
def test_efficient_test_paths_equal_in_memory(tmp_path):
    """efficient_test spills predictions to .npy paths; eval must be
    IDENTICAL to the in-memory path (`apis/test.py` np2tmp +
    `metrics.py:31-36` lazy load)."""
    import jax
    from aadg_tpu.models.zoo.builder import build_backbone
    from aadg_tpu.models.zoo.heads import FCNHead
    from aadg_tpu.models.zoo.segmentor import EncoderDecoder
    from aadg_tpu.models.zoo.train_api import evaluate_segmentor

    img_dir, ann_dir, _ = _tree(tmp_path, ".jpg", ".png", n=4, size=32,
                                n_classes=4)
    ds = build_pipeline_dataset(dict(
        type="CustomDataset", img_dir=img_dir, ann_dir=ann_dir,
        img_suffix=".jpg", seg_map_suffix=".png",
        pipeline=[Normalize(mean=[127.5] * 3, std=[127.5] * 3)]))
    bb, _ = build_backbone("cgnet")
    model = EncoderDecoder(
        backbone=bb, decode_head=FCNHead(num_classes=4, channels=8,
                                         num_convs=1, concat_input=False))
    import jax.numpy as jnp
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, 3)), train=False)
    a = evaluate_segmentor(model, variables, ds)
    b = evaluate_segmentor(model, variables, ds, efficient_test=True)
    np.testing.assert_allclose(np.asarray(a["mIoU"], np.float64),
                               np.asarray(b["mIoU"], np.float64))
    assert a["aAcc"] == b["aAcc"]
