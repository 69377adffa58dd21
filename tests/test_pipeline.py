"""Generic dataset + pipeline transforms (mmseg-semantics, host-side)."""

import numpy as np
import pytest
from PIL import Image

from aadg_tpu.data.pipeline import (CLAHE, AdjustGamma, CenterCrop, Compose,
                                    ConcatDataset, CustomDataset,
                                    DRIVEDataset, MultiScaleFlipAug,
                                    Normalize, Pad, PhotoMetricDistortion,
                                    RandomCrop, RandomFlip, RandomRotate,
                                    RepeatDataset, Rerange, Resize,
                                    RGB2Gray, SegRescale)


def sample(h=20, w=30):
    rng = np.random.default_rng(0)
    return dict(img=rng.integers(0, 256, (h, w, 3)).astype(np.uint8),
                gt_semantic_seg=rng.integers(0, 3, (h, w)).astype(np.int64),
                ori_shape=(h, w), img_shape=(h, w))


def test_resize_keep_ratio():
    r = Resize(img_scale=(40, 60), keep_ratio=True)(sample())
    assert r["img"].shape == (40, 60, 3)
    assert r["gt_semantic_seg"].shape == (40, 60)
    # non-keep-ratio scale is an mmcv (w, h) size (`transforms.py:416`)
    r2 = Resize(img_scale=(50, 35), keep_ratio=False)(sample())
    assert r2["img"].shape == (35, 50, 3)


def test_resize_ratio_range_deterministic():
    rng = np.random.default_rng(1)
    r = Resize(img_scale=(20, 30), ratio_range=(2.0, 2.0), rng=rng)(sample())
    assert r["img"].shape == (40, 60, 3)
    # mmseg convention: scale_factor = [w_scale, h_scale, w_scale, h_scale]
    np.testing.assert_allclose(r["scale_factor"], [2.0, 2.0, 2.0, 2.0])


def test_resize_multiscale_modes():
    # mode 4 ('value'): pick one of the candidate scales
    rng = np.random.default_rng(0)
    shapes = set()
    for _ in range(8):
        r = Resize(img_scale=[(40, 60), (20, 30)],
                   multiscale_mode="value", rng=rng)(sample())
        shapes.add(r["img"].shape[:2])
    assert shapes == {(40, 60), (20, 30)}
    # mode 3 ('range'): sampled long/short edges stay inside the bounds
    for _ in range(8):
        r = Resize(img_scale=[(40, 60), (20, 30)],
                   multiscale_mode="range", rng=rng)(sample())
        h, w = r["img"].shape[:2]
        assert 20 <= h <= 40 and 30 <= w <= 60


def test_random_flip_respects_preset():
    s = sample()
    r = RandomFlip(prob=0.0)(dict(s, flip=True))
    np.testing.assert_array_equal(r["img"], s["img"][:, ::-1])
    r2 = RandomFlip(prob=1.0, direction="vertical")(sample())
    np.testing.assert_array_equal(r2["img"], sample()["img"][::-1])


def test_pad_divisor_and_seg_255():
    r = Pad(size_divisor=16)(sample())
    assert r["img"].shape == (32, 32, 3)
    assert (r["gt_semantic_seg"][20:] == 255).all()
    assert (r["img"][20:] == 0).all()


def test_normalize():
    s = sample()
    r = Normalize(mean=[10, 20, 30], std=[2, 4, 8])(dict(s))
    exp = (s["img"].astype(np.float32) - [10, 20, 30]) / [2, 4, 8]
    np.testing.assert_allclose(r["img"], exp, rtol=1e-6)


def test_rerange():
    r = Rerange(0, 1)(sample())
    assert r["img"].min() == 0 and r["img"].max() == 1


def test_random_crop_cat_max_ratio():
    s = sample(40, 40)
    s["gt_semantic_seg"][:, :] = 0
    s["gt_semantic_seg"][:, 20:] = 1  # two classes split in half
    r = RandomCrop((16, 16), cat_max_ratio=0.75,
                   rng=np.random.default_rng(3))(s)
    labels, cnt = np.unique(r["gt_semantic_seg"], return_counts=True)
    assert r["img"].shape == (16, 16, 3)
    # the re-draw loop should usually find a mixed crop
    assert len(labels) > 1


def test_center_crop():
    r = CenterCrop((10, 10))(sample())
    assert r["img"].shape == (10, 10, 3)


def test_random_rotate_fill():
    r = RandomRotate(prob=1.0, degree=45, seg_pad_val=255,
                     rng=np.random.default_rng(0))(sample(32, 32))
    assert 255 in r["gt_semantic_seg"]  # corners filled with ignore
    assert r["img"].shape == (32, 32, 3)


def test_rgb2gray_and_gamma():
    r = RGB2Gray()(sample())
    assert r["img"].shape == (20, 30, 3)
    assert np.ptp(r["img"], axis=-1).max() == 0  # all channels equal
    g = AdjustGamma(gamma=2.0)(sample())
    lut_check = ((128 / 255.0) ** 0.5) * 255
    s = sample()
    s["img"][:] = 128
    g2 = AdjustGamma(gamma=2.0)(s)
    assert abs(int(g2["img"][0, 0, 0]) - int(lut_check)) <= 1


def test_seg_rescale():
    r = SegRescale(0.5)(sample(20, 30))
    assert r["gt_semantic_seg"].shape == (10, 15)
    assert r["img"].shape == (20, 30, 3)  # image untouched


def test_photometric_distortion_valid_uint8():
    r = PhotoMetricDistortion(rng=np.random.default_rng(7))(sample())
    assert r["img"].dtype == np.uint8
    assert r["img"].shape == (20, 30, 3)


def test_clahe_increases_local_contrast():
    # low-contrast ramp image: CLAHE should expand the value range
    img = np.tile(np.linspace(100, 140, 64, dtype=np.uint8), (64, 1))
    s = dict(img=np.stack([img] * 3, -1))
    r = CLAHE(clip_limit=40, tile_grid_size=(4, 4))(s)
    assert np.ptp(r["img"]) > np.ptp(img) * 1.5
    assert r["img"].dtype == np.uint8


def test_multi_scale_flip_aug():
    # reference contract: Resize/RandomFlip live in the inner transforms,
    # driven by preset scale/flip; the output is a dict of lists
    tta = MultiScaleFlipAug(
        transforms=[Resize(keep_ratio=True), RandomFlip(),
                    Normalize([0] * 3, [1] * 3)],
        img_scale=None, img_ratios=[1.0, 2.0], flip=True)
    outs = tta(sample())
    assert len(outs["img"]) == 4  # 2 scales x (no-flip, flip)
    assert outs["img"][2].shape == (40, 60, 3)
    assert outs["flip"] == [False, True, False, True]
    # flipped view = un-flipped view mirrored
    np.testing.assert_allclose(outs["img"][3], outs["img"][2][:, ::-1])


@pytest.fixture
def dataset_tree(tmp_path):
    img_dir = tmp_path / "images"
    ann_dir = tmp_path / "annotations"
    img_dir.mkdir()
    ann_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(4):
        Image.fromarray(rng.integers(0, 256, (16, 16, 3)).astype(
            np.uint8)).save(img_dir / f"im{i}.png")
        Image.fromarray(rng.integers(0, 2, (16, 16)).astype(
            np.uint8)).save(ann_dir / f"im{i}.png")
    return str(img_dir), str(ann_dir)


def test_custom_dataset_scan_and_evaluate(dataset_tree):
    img_dir, ann_dir = dataset_tree
    ds = CustomDataset(pipeline=[], img_dir=img_dir, img_suffix=".png",
                       ann_dir=ann_dir, seg_map_suffix=".png")
    assert len(ds) == 4
    s = ds[0]
    assert s["img"].shape == (16, 16, 3)
    assert s["gt_semantic_seg"].shape == (16, 16)
    # perfect predictions -> IoU 1
    res = ds.evaluate(ds.get_gt_seg_maps(), metric="mIoU")
    np.testing.assert_allclose(res["mIoU"], 1.0)
    assert res["aAcc"] == 1.0

    rep = RepeatDataset(ds, 3)
    assert len(rep) == 12
    cat = ConcatDataset([ds, ds])
    assert len(cat) == 8
    np.testing.assert_array_equal(cat[5]["img"], ds[1]["img"])


def test_drive_dataset_suffixes(tmp_path):
    img_dir = tmp_path / "img"
    ann_dir = tmp_path / "ann"
    img_dir.mkdir()
    ann_dir.mkdir()
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(
        img_dir / "01.png")
    Image.fromarray(np.zeros((8, 8), np.uint8)).save(
        ann_dir / "01_manual1.png")
    ds = DRIVEDataset(pipeline=[], img_dir=str(img_dir),
                      ann_dir=str(ann_dir))
    assert len(ds) == 1 and ds.CLASSES == ("background", "vessel")
    assert ds[0]["gt_semantic_seg"].shape == (8, 8)


def test_reduce_zero_label_ignore_semantics(tmp_path):
    """mmseg custom.py: with reduce_zero_label, label 0 -> 255 (ignore),
    k -> k-1, and ORIGINAL ignore-255 pixels stay 255 (not 254)."""
    img_dir = tmp_path / "images"
    ann_dir = tmp_path / "annotations"
    img_dir.mkdir(); ann_dir.mkdir()
    Image.fromarray(np.zeros((4, 4, 3), np.uint8)).save(
        img_dir / "a.png")
    ann = np.array([[0, 1, 2, 255]] * 4, np.uint8)
    Image.fromarray(ann).save(ann_dir / "a.png")
    ds = CustomDataset(pipeline=[], img_dir=str(img_dir),
                       img_suffix=".png", ann_dir=str(ann_dir),
                       seg_map_suffix=".png", reduce_zero_label=True)
    seg = ds[0]["gt_semantic_seg"]
    np.testing.assert_array_equal(seg[0], [255, 0, 1, 255])


def test_evaluate_infers_num_classes_excluding_ignore(tmp_path):
    """CLASSES=None num_classes inference must skip the 255 ignore label
    (otherwise per-class arrays balloon to 256 mostly-NaN entries)."""
    img_dir = tmp_path / "images"
    ann_dir = tmp_path / "annotations"
    img_dir.mkdir(); ann_dir.mkdir()
    Image.fromarray(np.zeros((4, 4, 3), np.uint8)).save(img_dir / "a.png")
    ann = np.array([[0, 1, 2, 255]] * 4, np.uint8)
    Image.fromarray(ann).save(ann_dir / "a.png")
    ds = CustomDataset(pipeline=[], img_dir=str(img_dir),
                       img_suffix=".png", ann_dir=str(ann_dir),
                       seg_map_suffix=".png")
    res = ds.evaluate(ds.get_gt_seg_maps(), metric="mIoU")
    assert len(res["mIoU"]) == 3  # classes 0..2, NOT 256
    np.testing.assert_allclose(np.asarray(res["mIoU"], np.float64), 1.0)
