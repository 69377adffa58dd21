"""cv2/mmcv-semantics oracles for the mmseg pipeline transforms.

The reference pipeline (`models/mmseg/datasets/pipelines/transforms.py`)
rides mmcv, whose image ops are thin cv2 wrappers. These tests pin our
transforms against independent transcriptions of the mmcv call pattern
(direct cv2 calls + mmcv's documented size math), so the host-side data
path is bit-faithful to what the reference actually computes:

- imresize/imrescale = cv2.resize with (w, h) sizes, INTER_LINEAR
  images / INTER_NEAREST segs, mmcv's ``int(x * factor + 0.5)`` size
  rounding (`mmcv/image/geometric.py` semantics);
- the int64-seg nearest fallback must equal cv2's INTER_NEAREST
  (``floor(dst * src/dst)``) exactly;
- imrotate = getRotationMatrix2D((w-1)/2, (h-1)/2, -angle) + warpAffine;
- CLAHE = cv2.createCLAHE per channel on uint8;
- PhotoMetricDistortion = the reference's uint8 flow (clip-to-uint8
  ``convert`` between steps, cv2 integer HSV, hue add mod 180, contrast
  second [mode 1] or last [mode 0]) — `transforms.py:1099-1216`.
"""

import cv2
import numpy as np
import pytest

from aadg_tpu.data.pipeline import (CLAHE, AdjustGamma, AlignedResize,
                                    Normalize, PhotoMetricDistortion,
                                    RandomRotate, Resize, SegRescale,
                                    _imrescale, _imresize,
                                    _nearest_resize_any, _rescale_size)

RNG = np.random.default_rng(42)


def _img(h=37, w=53, c=3):
    return RNG.integers(0, 256, (h, w, c) if c else (h, w),
                        dtype=np.uint8)


# ---------------------------------------------------------------------------
# resize primitives
# ---------------------------------------------------------------------------

def test_rescale_size_matches_mmcv_math():
    # mmcv.rescale_size: factor = min(long/max, short/min); +0.5 rounding
    for (w, h), scale in [((53, 37), (100, 70)), ((30, 20), (40, 60)),
                          ((512, 512), (2048, 1024)), ((31, 97), 0.5)]:
        if isinstance(scale, tuple):
            f = min(max(scale) / max(h, w), min(scale) / min(h, w))
        else:
            f = scale
        want = (int(w * f + 0.5), int(h * f + 0.5))
        assert _rescale_size((w, h), scale) == want


@pytest.mark.parametrize("size_wh", [(26, 18), (106, 74), (53, 37)])
def test_imresize_bilinear_is_cv2(size_wh):
    img = _img()
    got = _imresize(img, size_wh)
    want = cv2.resize(img, size_wh, interpolation=cv2.INTER_LINEAR)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("size_wh", [(26, 18), (106, 74), (7, 61)])
def test_nearest_fallback_bitexact_vs_cv2(size_wh):
    """The int64 seg path must reproduce cv2 INTER_NEAREST exactly."""
    seg8 = _img(c=0)
    want = cv2.resize(seg8, size_wh, interpolation=cv2.INTER_NEAREST)
    got8 = _nearest_resize_any(seg8, size_wh)
    np.testing.assert_array_equal(got8, want)
    got64 = _imresize(seg8.astype(np.int64), size_wh,
                      interpolation="nearest")
    assert got64.dtype == np.int64
    np.testing.assert_array_equal(got64.astype(np.uint8), want)


def test_imrescale_keep_ratio_is_cv2_at_mmcv_size():
    img = _img()
    got = _imrescale(img, (100, 70))
    new_wh = _rescale_size((53, 37), (100, 70))
    want = cv2.resize(img, new_wh, interpolation=cv2.INTER_LINEAR)
    np.testing.assert_array_equal(got, want)


# ---------------------------------------------------------------------------
# Resize / AlignedResize transforms
# ---------------------------------------------------------------------------

def test_resize_transform_keys_and_values():
    img = _img()
    seg = RNG.integers(0, 5, (37, 53)).astype(np.int64)
    r = Resize(img_scale=(100, 70), keep_ratio=True)(
        dict(img=img, gt_semantic_seg=seg))
    new_wh = _rescale_size((53, 37), (100, 70))
    np.testing.assert_array_equal(
        r["img"], cv2.resize(img, new_wh,
                             interpolation=cv2.INTER_LINEAR))
    np.testing.assert_array_equal(
        r["gt_semantic_seg"].astype(np.uint8),
        cv2.resize(seg.astype(np.uint8), new_wh,
                   interpolation=cv2.INTER_NEAREST))
    assert r["keep_ratio"] is True
    assert r["img_shape"] == r["img"].shape == r["pad_shape"]
    w_scale, h_scale = new_wh[0] / 53, new_wh[1] / 37
    np.testing.assert_allclose(
        r["scale_factor"], [w_scale, h_scale, w_scale, h_scale],
        rtol=1e-6)


def test_resize_preset_scale_wins():
    # MultiScaleFlipAug drives Resize through results['scale']
    r = Resize(img_scale=(999, 999), keep_ratio=False)(
        dict(img=_img(), scale=(26, 18)))
    assert r["img"].shape == (18, 26, 3)  # (w, h) size convention


def test_aligned_resize_matches_transcription():
    img = _img()
    out = AlignedResize(img_scale=(100, 70), keep_ratio=True,
                        size_divisor=32)(dict(img=img))["img"]
    step1 = cv2.resize(img, _rescale_size((53, 37), (100, 70)),
                       interpolation=cv2.INTER_LINEAR)
    ah = int(np.ceil(step1.shape[0] / 32)) * 32
    aw = int(np.ceil(step1.shape[1] / 32)) * 32
    want = cv2.resize(step1, (aw, ah), interpolation=cv2.INTER_LINEAR)
    np.testing.assert_array_equal(out, want)


def test_seg_rescale_is_cv2_nearest():
    seg = RNG.integers(0, 7, (20, 30)).astype(np.int64)
    out = SegRescale(0.5)(dict(gt_semantic_seg=seg))["gt_semantic_seg"]
    want = cv2.resize(seg.astype(np.uint8),
                      _rescale_size((30, 20), 0.5),
                      interpolation=cv2.INTER_NEAREST)
    np.testing.assert_array_equal(out.astype(np.uint8), want)


# ---------------------------------------------------------------------------
# rotate
# ---------------------------------------------------------------------------

def test_random_rotate_matches_mmcv_imrotate():
    img = _img(32, 32)
    seg = RNG.integers(0, 4, (32, 32)).astype(np.int64)
    rng = np.random.default_rng(5)
    out = RandomRotate(prob=1.0, degree=(30.0, 30.0), seg_pad_val=255,
                       rng=rng)(dict(img=img, gt_semantic_seg=seg))
    # transcription: mmcv.imrotate(img, 30) = warpAffine with
    # getRotationMatrix2D(((w-1)/2, (h-1)/2), -30, 1.0)
    m = cv2.getRotationMatrix2D((15.5, 15.5), -30.0, 1.0)
    want_img = cv2.warpAffine(img, m, (32, 32),
                              flags=cv2.INTER_LINEAR, borderValue=0)
    want_seg = cv2.warpAffine(seg.astype(np.float64), m, (32, 32),
                              flags=cv2.INTER_NEAREST, borderValue=255.0)
    np.testing.assert_array_equal(out["img"], want_img)
    np.testing.assert_array_equal(out["gt_semantic_seg"],
                                  want_seg.astype(np.int64))
    assert 255 in out["gt_semantic_seg"]  # corners filled with ignore


def test_random_rotate_auto_bound_grows_canvas():
    out = RandomRotate(prob=1.0, degree=(45.0, 45.0), auto_bound=True,
                       rng=np.random.default_rng(0))(dict(img=_img(20, 40)))
    h, w = out["img"].shape[:2]
    assert h > 20 and w > 40  # rotated bbox of a 20x40 canvas


# ---------------------------------------------------------------------------
# CLAHE / gamma / normalize
# ---------------------------------------------------------------------------

def test_clahe_is_cv2_per_channel():
    img = _img(64, 48)
    out = CLAHE(clip_limit=40.0, tile_grid_size=(8, 8))(
        dict(img=img))["img"]
    cl = cv2.createCLAHE(40.0, (8, 8))
    want = np.stack([cl.apply(img[:, :, i]) for i in range(3)], axis=-1)
    np.testing.assert_array_equal(out, want)
    # dtype of the incoming image is preserved (reference assigns the
    # uint8 result back into the existing array)
    outf = CLAHE()(dict(img=img.astype(np.float32)))["img"]
    assert outf.dtype == np.float32


def test_adjust_gamma_matches_cv2_lut():
    img = _img()
    table = np.array([(i / 255.0) ** (1.0 / 2.2) * 255
                      for i in np.arange(256)]).astype("uint8")
    want = cv2.LUT(img, table)
    out = AdjustGamma(gamma=2.2)(dict(img=img))["img"]
    np.testing.assert_array_equal(out, want)


def test_normalize_matches_imnormalize_numerics():
    img = _img().astype(np.float32)
    mean = np.array([123.675, 116.28, 103.53], np.float32)
    std = np.array([58.395, 57.12, 57.375], np.float32)
    out = Normalize(mean, std)(dict(img=img.copy()))["img"]
    # mmcv.imnormalize: f32 subtract, then MULTIPLY by the f64-computed
    # reciprocal of std
    want = (img - np.float32(np.float64(mean))) \
        * np.float32(1.0 / np.float64(std))
    np.testing.assert_array_equal(out, want)
    assert out.dtype == np.float32


# ---------------------------------------------------------------------------
# PhotoMetricDistortion
# ---------------------------------------------------------------------------

def _pmd_transcription(img, rng, brightness_delta=32,
                       contrast_range=(0.5, 1.5),
                       saturation_range=(0.5, 1.5), hue_delta=18):
    """Independent transcription of the reference flow
    (`transforms.py:1130-1205`), consuming ``rng`` in the same order."""

    def convert(a, alpha=1, beta=0):
        return np.clip(a.astype(np.float32) * alpha + beta,
                       0, 255).astype(np.uint8)

    if rng.integers(2):  # brightness
        img = convert(img, beta=rng.uniform(-brightness_delta,
                                            brightness_delta))
    mode = int(rng.integers(2))
    if mode == 1 and rng.integers(2):  # contrast second
        img = convert(img, alpha=rng.uniform(*contrast_range))
    if rng.integers(2):  # saturation (cv2 integer HSV)
        hsv = cv2.cvtColor(img, cv2.COLOR_RGB2HSV)
        hsv[:, :, 1] = convert(hsv[:, :, 1],
                               alpha=rng.uniform(*saturation_range))
        img = cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB)
    if rng.integers(2):  # hue: integer add mod 180 on H
        hsv = cv2.cvtColor(img, cv2.COLOR_RGB2HSV)
        hsv[:, :, 0] = (hsv[:, :, 0].astype(int) + int(
            rng.integers(-hue_delta, hue_delta))) % 180
        img = cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB)
    if mode == 0 and rng.integers(2):  # contrast last
        img = convert(img, alpha=rng.uniform(*contrast_range))
    return img


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 11, 23])
def test_photometric_distortion_matches_reference_flow(seed):
    img = _img()
    got = PhotoMetricDistortion(rng=np.random.default_rng(seed))(
        dict(img=img.copy()))["img"]
    want = _pmd_transcription(img.copy(), np.random.default_rng(seed))
    np.testing.assert_array_equal(got, want)
    assert got.dtype == np.uint8


def test_photometric_contrast_mode_draw_order():
    """The mode draw happens between brightness and saturation even when
    no contrast is applied — RNG stream parity with the reference."""
    # With these two seeds the transforms differ iff the mode draw is
    # consumed at the right point; the transcription already encodes the
    # reference order, so equality on many seeds is the real assertion.
    for seed in range(16):
        img = _img(9, 11)
        got = PhotoMetricDistortion(rng=np.random.default_rng(seed))(
            dict(img=img.copy()))["img"]
        want = _pmd_transcription(img.copy(), np.random.default_rng(seed))
        np.testing.assert_array_equal(got, want)
