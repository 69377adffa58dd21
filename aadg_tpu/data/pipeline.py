"""Generic segmentation dataset + transform pipeline.

Capability match for the reference's vendored mmseg dataset layer
(`/root/reference/models/mmseg/datasets/**`, SURVEY.md §2.2): the
``CustomDataset`` protocol (img_dir/ann_dir scanning, optional split
file, ``reduce_zero_label``), the results-dict transform pipeline
(`datasets/pipelines/transforms.py`), and multi-scale/flip test-time
augmentation (`pipelines/test_time_aug.py`).

Design: these run host-side in numpy exactly where the reference runs
them (DataLoader workers) — they prepare static-shape batches that are
then shipped to the TPU once. The *hot* training path does NOT use this
module; it uses the fused on-device augmentation engine
(`aadg_tpu/ops/augment.py`, `aadg_tpu/data/transforms.py`). Keeping the
generic pipeline on host preserves mmseg's exact uint8/border semantics
without paying per-sample device round-trips.

Every transform takes and returns a ``results`` dict with keys
``img`` (H, W, 3 float32 or uint8), ``gt_semantic_seg`` (H, W int),
plus bookkeeping (``img_shape``, ``scale_factor``, ``flip`` ...), the
same protocol as the reference (`pipelines/transforms.py:209-236`).
"""

from __future__ import annotations

import os
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

try:  # PIL is the reference's decode path too (`data/optic.py`)
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None


# ---------------------------------------------------------------------------
# mmcv-semantics image helpers (cv2 backend — the reference's mmcv image
# ops are thin cv2 wrappers, so matching them exactly means calling cv2
# with mmcv's conventions: sizes are (w, h), bilinear = INTER_LINEAR with
# no antialias, nearest = floor(dst * src/dst))
# ---------------------------------------------------------------------------

import cv2

_CV2_INTERP = {
    "nearest": cv2.INTER_NEAREST,
    "bilinear": cv2.INTER_LINEAR,
    "bicubic": cv2.INTER_CUBIC,
    "area": cv2.INTER_AREA,
    "lanczos": cv2.INTER_LANCZOS4,
}


def _nearest_resize_any(img: np.ndarray, size_wh: Tuple[int, int]):
    """cv2 INTER_NEAREST for dtypes cv2 rejects (e.g. int64 seg maps):
    ``src = floor(dst * src_size/dst_size)`` computed in float64, clipped
    — bit-identical to cv2 (oracle-tested on uint8)."""
    w, h = size_wh
    sh, sw = img.shape[:2]
    ys = np.minimum(np.floor(np.arange(h) * (sh / h)).astype(int), sh - 1)
    xs = np.minimum(np.floor(np.arange(w) * (sw / w)).astype(int), sw - 1)
    return img[ys[:, None], xs[None, :]]


def _imresize(img: np.ndarray, size_wh: Tuple[int, int],
              interpolation: str = "bilinear") -> np.ndarray:
    """``mmcv.imresize``: cv2.resize to ``(w, h)``."""
    if img.shape[:2] == (size_wh[1], size_wh[0]):
        return img
    if interpolation == "nearest" and img.dtype not in (
            np.uint8, np.int16, np.uint16, np.float32, np.float64):
        return _nearest_resize_any(img, size_wh)
    return cv2.resize(img, tuple(size_wh),
                      interpolation=_CV2_INTERP[interpolation])


def _rescale_size(old_wh: Tuple[int, int], scale):
    """``mmcv.rescale_size``: new (w, h) after scaling, factor-preserving
    (tuple scale = fit (long, short) bounds; int/float = direct factor);
    rounds with +0.5 like mmcv's ``_scale_size``."""
    w, h = old_wh
    if isinstance(scale, (float, int)):
        scale_factor = scale
    else:
        max_long_edge, max_short_edge = max(scale), min(scale)
        scale_factor = min(max_long_edge / max(h, w),
                           max_short_edge / min(h, w))
    return (int(w * scale_factor + 0.5), int(h * scale_factor + 0.5))


def _imrescale(img: np.ndarray, scale,
               interpolation: str = "bilinear") -> np.ndarray:
    """``mmcv.imrescale``: resize keeping aspect ratio."""
    h, w = img.shape[:2]
    return _imresize(img, _rescale_size((w, h), scale), interpolation)


def _imrotate(img: np.ndarray, angle: float, center=None,
              border_value=0, interpolation: str = "bilinear",
              auto_bound: bool = False) -> np.ndarray:
    """``mmcv.imrotate``: positive angle = clockwise, default center
    ``((w-1)/2, (h-1)/2)``, cv2.warpAffine sampling."""
    if center is not None and auto_bound:
        raise ValueError("`auto_bound` conflicts with `center`")
    h, w = img.shape[:2]
    if center is None:
        center = ((w - 1) * 0.5, (h - 1) * 0.5)
    matrix = cv2.getRotationMatrix2D(center, -angle, 1.0)
    if auto_bound:
        cos = np.abs(matrix[0, 0])
        sin = np.abs(matrix[0, 1])
        new_w = h * sin + w * cos
        new_h = h * cos + w * sin
        matrix[0, 2] += (new_w - w) * 0.5
        matrix[1, 2] += (new_h - h) * 0.5
        w, h = int(np.round(new_w)), int(np.round(new_h))
    dtype = img.dtype
    if dtype not in (np.uint8, np.int16, np.uint16, np.float32,
                     np.float64) and interpolation == "nearest":
        out = cv2.warpAffine(img.astype(np.float64), matrix, (w, h),
                             flags=_CV2_INTERP[interpolation],
                             borderValue=float(border_value))
        return out.astype(dtype)
    return cv2.warpAffine(img, matrix, (w, h),
                          flags=_CV2_INTERP[interpolation],
                          borderValue=border_value)


def _seg_keys(results) -> list:
    """The reference iterates ``results['seg_fields']``; standalone users
    of single transforms may not set it, so fall back to the standard
    key when present."""
    keys = results.get("seg_fields")
    if keys is None:
        keys = ["gt_semantic_seg"] if "gt_semantic_seg" in results else []
    return keys


# ---------------------------------------------------------------------------
# Pipeline transforms
# ---------------------------------------------------------------------------

class Compose:
    """`pipelines/compose.py`."""

    def __init__(self, transforms: Sequence[Callable]):
        self.transforms = list(transforms)

    def __call__(self, results):
        for t in self.transforms:
            results = t(results)
            if results is None:
                return None
        return results


class Resize:
    """`transforms.py:237-463`. The reference's four sampling modes:
    ``ratio_range`` with ``img_scale=None`` (jitter the image's own
    (w, h)) or a single scale; else ``multiscale_mode='range'`` (sample
    long/short edges between two scales) or ``'value'`` (pick one of the
    list). A pre-set ``results['scale']`` wins (that is how
    ``MultiScaleFlipAug`` drives it). ``keep_ratio`` resizes via
    mmcv.imrescale (fit (long, short) bounds); otherwise the scale tuple
    is an mmcv ``(w, h)`` size. Images resize cv2-bilinear, seg maps
    cv2-nearest; adds ``img_shape``/``pad_shape``/``scale_factor``
    (``[w_scale, h_scale, w_scale, h_scale]``)/``keep_ratio`` keys."""

    def __init__(self, img_scale=None, multiscale_mode: str = "range",
                 ratio_range: Optional[Tuple[float, float]] = None,
                 keep_ratio: bool = True,
                 rng: Optional[np.random.Generator] = None):
        if img_scale is None:
            self.img_scale = None
        else:
            self.img_scale = img_scale if isinstance(img_scale, list) \
                else [img_scale]
            assert all(isinstance(s, tuple) for s in self.img_scale)
        if ratio_range is not None:
            assert self.img_scale is None or len(self.img_scale) == 1
        else:
            assert multiscale_mode in ("value", "range")
        self.multiscale_mode = multiscale_mode
        self.ratio_range = ratio_range
        self.keep_ratio = keep_ratio
        self.rng = rng or np.random.default_rng()

    # --- scale sampling (`transforms.py:296-404`) ---
    def _random_sample_ratio(self, img_scale):
        min_ratio, max_ratio = self.ratio_range
        ratio = self.rng.random() * (max_ratio - min_ratio) + min_ratio
        return int(img_scale[0] * ratio), int(img_scale[1] * ratio)

    def _random_scale(self, results):
        if self.ratio_range is not None:
            if self.img_scale is None:
                h, w = results["img"].shape[:2]
                scale, idx = self._random_sample_ratio((w, h)), None
            else:
                scale, idx = self._random_sample_ratio(self.img_scale[0]), \
                    None
        elif len(self.img_scale) == 1:
            scale, idx = self.img_scale[0], 0
        elif self.multiscale_mode == "range":
            longs = [max(s) for s in self.img_scale]
            shorts = [min(s) for s in self.img_scale]
            scale = (int(self.rng.integers(min(longs), max(longs) + 1)),
                     int(self.rng.integers(min(shorts), max(shorts) + 1)))
            idx = None
        else:  # 'value'
            idx = int(self.rng.integers(len(self.img_scale)))
            scale = self.img_scale[idx]
        results["scale"] = scale
        results["scale_idx"] = idx

    def _resize_img(self, results):
        if self.keep_ratio:
            img = _imrescale(results["img"], results["scale"])
            # mmcv note kept: w_scale/h_scale recomputed from shapes
            new_h, new_w = img.shape[:2]
            h, w = results["img"].shape[:2]
            w_scale, h_scale = new_w / w, new_h / h
        else:
            new_w, new_h = results["scale"]
            img = _imresize(results["img"], (new_w, new_h))
            h, w = results["img"].shape[:2]
            w_scale, h_scale = new_w / w, new_h / h
        results["img"] = img
        results["img_shape"] = img.shape
        results["pad_shape"] = img.shape  # in case there is no padding
        results["scale_factor"] = np.array(
            [w_scale, h_scale, w_scale, h_scale], dtype=np.float32)
        results["keep_ratio"] = self.keep_ratio

    def _resize_seg(self, results):
        for key in _seg_keys(results):
            if self.keep_ratio:
                results[key] = _imrescale(results[key], results["scale"],
                                          interpolation="nearest")
            else:
                results[key] = _imresize(results[key], results["scale"],
                                         interpolation="nearest")

    def __call__(self, results):
        if "scale" not in results:
            self._random_scale(results)
        self._resize_img(results)
        self._resize_seg(results)
        return results


class AlignedResize(Resize):
    """`transforms.py:10-236` AlignedResize (the SegFormer eval resize):
    ``Resize`` whose keep-ratio output is then resized (not padded) UP to
    the next multiple of ``size_divisor`` on both sides (img bilinear,
    seg nearest) — so whole-image inference never needs padding; the
    non-keep-ratio path instead asserts the target is already aligned."""

    def __init__(self, img_scale=None, multiscale_mode: str = "range",
                 ratio_range=None, keep_ratio: bool = True,
                 size_divisor: int = 32, rng=None):
        super().__init__(img_scale=img_scale, multiscale_mode=multiscale_mode,
                         ratio_range=ratio_range, keep_ratio=keep_ratio,
                         rng=rng)
        self.size_divisor = size_divisor

    def _align(self, img, interpolation="bilinear"):
        d = self.size_divisor
        ah = int(np.ceil(img.shape[0] / d)) * d
        aw = int(np.ceil(img.shape[1] / d)) * d
        return _imresize(img, (aw, ah), interpolation)

    def _resize_img(self, results):
        h, w = results["img"].shape[:2]
        if self.keep_ratio:
            img = _imrescale(results["img"], results["scale"])
            img = self._align(img)
            new_h, new_w = img.shape[:2]
            w_scale, h_scale = new_w / w, new_h / h
        else:
            new_w, new_h = results["scale"]
            img = _imresize(results["img"], (new_w, new_h))
            d = self.size_divisor
            assert new_h % d == 0 and new_w % d == 0, \
                f"img size not align. h:{new_h} w:{new_w}"
            w_scale, h_scale = new_w / w, new_h / h
        results["img"] = img
        results["img_shape"] = img.shape
        results["pad_shape"] = img.shape
        results["scale_factor"] = np.array(
            [w_scale, h_scale, w_scale, h_scale], dtype=np.float32)
        results["keep_ratio"] = self.keep_ratio

    def _resize_seg(self, results):
        for key in _seg_keys(results):
            if self.keep_ratio:
                seg = _imrescale(results[key], results["scale"],
                                 interpolation="nearest")
                seg = self._align(seg, interpolation="nearest")
            else:
                seg = _imresize(results[key], results["scale"],
                                interpolation="nearest")
            results[key] = seg


class MaillaryHack:
    """`transforms.py:1028-1065`: remap Mapillary Vistas' 66 labels onto
    the 19 Cityscapes train classes (all unmapped labels -> 255 ignore).
    One vectorized LUT pass instead of the reference's sequential
    per-value in-place loops. Intentional divergence (reference bug, not
    replicated): the reference remaps value 6 -> train id 3 and THEN
    remaps value 3 -> 4, so pixels originally labeled 6 (its 'wall'
    source class) end up as train id 4 instead of 3; the LUT applies the
    intended map atomically (6 -> 3, 3 -> 4)."""

    _MAP = [[13, 24, 41], [2, 15], [17], [6], [3], [45, 47], [48], [50],
            [30], [29], [27], [19], [20, 21, 22], [55], [61], [54], [58],
            [57], [52]]

    def __init__(self):
        lut = np.full(256, 255, np.int64)
        for train_id, values in enumerate(self._MAP):
            for v in values:
                lut[v] = train_id
        self._lut = lut

    def __call__(self, results):
        seg = results["gt_semantic_seg"]
        results["gt_semantic_seg"] = self._lut[np.clip(seg, 0, 255)]
        return results


class RandomFlip:
    """`transforms.py:465-518`: horizontal (or vertical) flip with prob."""

    def __init__(self, prob: float = 0.5, direction: str = "horizontal",
                 rng=None):
        self.prob = prob
        self.direction = direction
        self.rng = rng or np.random.default_rng()

    def __call__(self, results):
        # preset flip/flip_direction win (how MultiScaleFlipAug drives it)
        if "flip" not in results:
            results["flip"] = bool(self.rng.random() < self.prob)
        if "flip_direction" not in results:
            results["flip_direction"] = self.direction
        if results["flip"]:
            axis = 1 if results["flip_direction"] == "horizontal" else 0
            results["img"] = np.flip(results["img"], axis=axis).copy()
            for key in _seg_keys(results):
                results[key] = np.flip(results[key], axis=axis).copy()
        return results


class Pad:
    """`transforms.py:520-589`: pad to fixed size or size_divisor;
    seg padded with 255 (ignore)."""

    def __init__(self, size: Optional[Tuple[int, int]] = None,
                 size_divisor: Optional[int] = None, pad_val: float = 0,
                 seg_pad_val: int = 255):
        self.size = size
        self.size_divisor = size_divisor
        self.pad_val = pad_val
        self.seg_pad_val = seg_pad_val

    def __call__(self, results):
        img = results["img"]
        h, w = img.shape[:2]
        if self.size is not None:
            th, tw = self.size
        else:
            d = self.size_divisor
            th, tw = -(-h // d) * d, -(-w // d) * d
        ph, pw = max(0, th - h), max(0, tw - w)
        if ph or pw:
            results["img"] = np.pad(
                img, ((0, ph), (0, pw), (0, 0)), constant_values=self.pad_val)
            for key in _seg_keys(results):
                results[key] = np.pad(
                    results[key], ((0, ph), (0, pw)),
                    constant_values=self.seg_pad_val)
        results["pad_shape"] = results["img"].shape
        results["pad_fixed_size"] = self.size
        results["pad_size_divisor"] = self.size_divisor
        return results


class Normalize:
    """`transforms.py:591-631`: (img - mean) / std, optional BGR->RGB
    (images here are already RGB; to_rgb kept for config parity)."""

    def __init__(self, mean, std, to_rgb: bool = True):
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)
        self.to_rgb = to_rgb

    def __call__(self, results):
        # mmcv.imnormalize numerics: f32 image, f64 mean subtracted, then
        # MULTIPLY by the f64-computed reciprocal of std (not divide)
        img = results["img"].astype(np.float32)
        img = img - np.float32(np.float64(self.mean))
        img = img * np.float32(1.0 / np.float64(self.std))
        results["img"] = img
        results["img_norm_cfg"] = dict(mean=self.mean, std=self.std,
                                       to_rgb=self.to_rgb)
        return results


class Rerange:
    """`transforms.py:633-677`: linearly rescale intensities to
    [min_value, max_value]."""

    def __init__(self, min_value: float = 0, max_value: float = 255):
        self.min_value = min_value
        self.max_value = max_value

    def __call__(self, results):
        img = results["img"]
        lo, hi = np.min(img), np.max(img)
        assert lo < hi  # reference precondition (`transforms.py:659`)
        img = (img - lo) / (hi - lo)
        results["img"] = img * (self.max_value - self.min_value) \
            + self.min_value
        return results


class CLAHE:
    """`transforms.py:679-722`: contrast-limited adaptive histogram
    equalization. The reference's ``mmcv.clahe`` is
    ``cv2.createCLAHE(clip_limit, tile_grid_size).apply`` per channel,
    each channel cast to uint8 first and assigned back into the existing
    image array (preserving its dtype) — reproduced bit-for-bit here
    (on a copy: the reference mutates the caller's array in place)."""

    def __init__(self, clip_limit: float = 40.0,
                 tile_grid_size: Tuple[int, int] = (8, 8)):
        self.clip_limit = clip_limit
        self.tile_grid_size = tuple(tile_grid_size)

    def __call__(self, results):
        img = results["img"].copy()
        clahe = cv2.createCLAHE(self.clip_limit, self.tile_grid_size)
        for i in range(img.shape[2]):
            img[:, :, i] = clahe.apply(
                np.array(img[:, :, i], dtype=np.uint8))
        results["img"] = img
        return results


class RandomCrop:
    """`transforms.py:724-794`: random crop; with ``cat_max_ratio`` re-draw
    up to 10 times until no class exceeds the ratio."""

    def __init__(self, crop_size: Tuple[int, int],
                 cat_max_ratio: float = 1.0, ignore_index: int = 255,
                 rng=None):
        self.crop_size = crop_size
        self.cat_max_ratio = cat_max_ratio
        self.ignore_index = ignore_index
        self.rng = rng or np.random.default_rng()

    def _bbox(self, img):
        mh = max(img.shape[0] - self.crop_size[0], 0)
        mw = max(img.shape[1] - self.crop_size[1], 0)
        y = int(self.rng.integers(0, mh + 1))
        x = int(self.rng.integers(0, mw + 1))
        return y, x

    def __call__(self, results):
        img = results["img"]
        seg = results.get("gt_semantic_seg")
        y, x = self._bbox(img)
        if self.cat_max_ratio < 1.0 and seg is not None:
            for _ in range(10):
                patch = seg[y:y + self.crop_size[0], x:x + self.crop_size[1]]
                labels, cnt = np.unique(patch, return_counts=True)
                cnt = cnt[labels != self.ignore_index]
                if len(cnt) > 1 and cnt.max() / cnt.sum() \
                        < self.cat_max_ratio:
                    break
                y, x = self._bbox(img)
        results["img"] = img[y:y + self.crop_size[0],
                             x:x + self.crop_size[1]]
        results["img_shape"] = results["img"].shape
        for key in _seg_keys(results):
            results[key] = results[key][y:y + self.crop_size[0],
                                        x:x + self.crop_size[1]]
        return results


class CenterCrop:
    """`transforms.py:796-853`."""

    def __init__(self, crop_size: Tuple[int, int]):
        self.crop_size = crop_size

    def __call__(self, results):
        img = results["img"]
        y = max((img.shape[0] - self.crop_size[0]) // 2, 0)
        x = max((img.shape[1] - self.crop_size[1]) // 2, 0)
        results["img"] = img[y:y + self.crop_size[0],
                             x:x + self.crop_size[1]]
        results["img_shape"] = results["img"].shape
        for key in _seg_keys(results):
            results[key] = results[key][y:y + self.crop_size[0],
                                        x:x + self.crop_size[1]]
        return results


class RandomRotate:
    """`transforms.py:855-936`: rotate by a uniform angle with prob via
    ``mmcv.imrotate`` (cv2.warpAffine, positive angle clockwise, center
    ``((w-1)/2, (h-1)/2)``); bilinear for img, nearest for seg, borders
    filled with the pad values. The reference draws the angle even when
    the prob gate fails (stream parity kept)."""

    def __init__(self, prob: float, degree, pad_val: float = 0,
                 seg_pad_val: int = 255, center=None,
                 auto_bound: bool = False, rng=None):
        self.prob = prob
        self.degree = (-degree, degree) if np.isscalar(degree) \
            else tuple(degree)
        assert len(self.degree) == 2
        self.pad_val = pad_val
        self.seg_pad_val = seg_pad_val
        self.center = center
        self.auto_bound = auto_bound
        self.rng = rng or np.random.default_rng()

    def __call__(self, results):
        rotate = self.rng.random() < self.prob
        angle = float(self.rng.uniform(min(*self.degree),
                                       max(*self.degree)))
        if rotate:
            results["img"] = _imrotate(
                results["img"], angle, center=self.center,
                border_value=self.pad_val, auto_bound=self.auto_bound)
            for key in _seg_keys(results):
                results[key] = _imrotate(
                    results[key], angle, center=self.center,
                    border_value=self.seg_pad_val,
                    auto_bound=self.auto_bound, interpolation="nearest")
        return results


class RGB2Gray:
    """`transforms.py:938-991`: weighted grayscale, broadcast back to
    out_channels."""

    def __init__(self, out_channels: Optional[int] = None,
                 weights=(0.299, 0.587, 0.114)):
        self.out_channels = out_channels
        self.weights = np.asarray(weights)  # float64, reference math

    def __call__(self, results):
        img = results["img"]
        assert img.ndim == 3 and img.shape[2] == len(self.weights)
        # float64 result like the reference (uint8 * float list)
        gray = (img * self.weights.reshape(1, 1, -1)).sum(2, keepdims=True)
        n = self.out_channels or len(self.weights)
        results["img"] = gray.repeat(n, axis=2)
        results["img_shape"] = results["img"].shape
        return results


class AdjustGamma:
    """`transforms.py:993-1026`: uint8 gamma LUT."""

    def __init__(self, gamma: float = 1.0):
        self.gamma = gamma
        inv = 1.0 / gamma
        self.lut = np.array([(i / 255.0) ** inv * 255
                             for i in range(256)]).astype(np.uint8)

    def __call__(self, results):
        results["img"] = self.lut[results["img"].astype(np.uint8)]
        return results


class SegRescale:
    """`transforms.py:1069-1087`: rescale only the seg map (nearest)."""

    def __init__(self, scale_factor: float = 1.0):
        self.scale_factor = scale_factor

    def __call__(self, results):
        for key in _seg_keys(results):
            if self.scale_factor != 1:
                results[key] = _imrescale(results[key], self.scale_factor,
                                          interpolation="nearest")
        return results


class PhotoMetricDistortion:
    """`transforms.py:1099-1216` PhotoMetricDistortion, bit-faithful:
    a uint8 pipeline where every step clips back to uint8 (``convert``),
    saturation/hue work in cv2's integer HSV (H in 0..179, S 0..255), the
    hue shift is an integer add mod 180, and contrast runs either right
    after brightness (mode 1 in the code) or last (mode 0). Images here
    are RGB; cv2's RGB2HSV on RGB equals the reference's BGR2HSV on its
    BGR-loaded images (the conversion is channel-semantic)."""

    def __init__(self, brightness_delta: int = 32,
                 contrast_range=(0.5, 1.5), saturation_range=(0.5, 1.5),
                 hue_delta: int = 18, rng=None):
        self.brightness_delta = brightness_delta
        self.contrast_lower, self.contrast_upper = contrast_range
        self.saturation_lower, self.saturation_upper = saturation_range
        self.hue_delta = hue_delta
        self.rng = rng or np.random.default_rng()

    @staticmethod
    def convert(img, alpha=1, beta=0):
        img = img.astype(np.float32) * alpha + beta
        return np.clip(img, 0, 255).astype(np.uint8)

    def brightness(self, img):
        if self.rng.integers(2):
            return self.convert(
                img, beta=self.rng.uniform(-self.brightness_delta,
                                           self.brightness_delta))
        return img

    def contrast(self, img):
        if self.rng.integers(2):
            return self.convert(
                img, alpha=self.rng.uniform(self.contrast_lower,
                                            self.contrast_upper))
        return img

    def saturation(self, img):
        if self.rng.integers(2):
            hsv = cv2.cvtColor(img, cv2.COLOR_RGB2HSV)
            hsv[:, :, 1] = self.convert(
                hsv[:, :, 1],
                alpha=self.rng.uniform(self.saturation_lower,
                                       self.saturation_upper))
            img = cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB)
        return img

    def hue(self, img):
        if self.rng.integers(2):
            hsv = cv2.cvtColor(img, cv2.COLOR_RGB2HSV)
            hsv[:, :, 0] = (hsv[:, :, 0].astype(int) + int(
                self.rng.integers(-self.hue_delta, self.hue_delta))) % 180
            img = cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB)
        return img

    def __call__(self, results):
        img = results["img"]
        if img.dtype != np.uint8:
            img = np.clip(img, 0, 255).astype(np.uint8)
        img = self.brightness(img)
        mode = int(self.rng.integers(2))
        if mode == 1:
            img = self.contrast(img)
        img = self.saturation(img)
        img = self.hue(img)
        if mode == 0:
            img = self.contrast(img)
        results["img"] = img
        return results


class MultiScaleFlipAug:
    """`pipelines/test_time_aug.py`: expand one sample into the TTA set.
    The reference contract: the inner ``transforms`` list contains the
    ``Resize``/``RandomFlip`` steps (mmseg test-config convention), and
    this wrapper drives them by presetting ``scale``/``flip``/
    ``flip_direction`` per view. Scale modes: ``img_scale=None`` +
    ``img_ratios`` uses the image's own ``(w*r, h*r)``; a single scale +
    ratios multiplies it out; a scale list is taken verbatim.
    ``flip_direction`` may be a list (each direction is its own view).
    Returns the reference's dict-of-lists (one list entry per view)."""

    def __init__(self, transforms: Sequence, img_scale, img_ratios=None,
                 flip: bool = False, flip_direction="horizontal"):
        self.transforms = Compose(transforms)
        if img_ratios is not None and not isinstance(img_ratios, list):
            img_ratios = [img_ratios]
        if img_scale is None:
            self.img_scale = None
            assert img_ratios is not None
        elif isinstance(img_scale, tuple) and img_ratios is not None:
            self.img_scale = [(int(img_scale[0] * r),
                               int(img_scale[1] * r)) for r in img_ratios]
        else:
            self.img_scale = img_scale if isinstance(img_scale, list) \
                else [img_scale]
        self.flip = flip
        self.img_ratios = img_ratios
        self.flip_direction = flip_direction if isinstance(
            flip_direction, list) else [flip_direction]

    def __call__(self, results):
        if self.img_scale is None:
            h, w = results["img"].shape[:2]
            img_scale = [(int(w * r), int(h * r)) for r in self.img_ratios]
        else:
            img_scale = self.img_scale
        aug_data = []
        for scale in img_scale:
            for flip in ([False, True] if self.flip else [False]):
                for direction in self.flip_direction:
                    r = {k: (v.copy() if isinstance(v, np.ndarray) else v)
                         for k, v in results.items()}
                    r["scale"] = scale
                    r["flip"] = flip
                    r["flip_direction"] = direction
                    aug_data.append(self.transforms(r))
        # list of dict -> dict of list (`test_time_aug.py:119-123`)
        out = {key: [] for key in aug_data[0]}
        for data in aug_data:
            for key, val in data.items():
                out[key].append(val)
        return out


# ---------------------------------------------------------------------------
# Datasets
# ---------------------------------------------------------------------------

class CustomDataset:
    """`datasets/custom.py` CustomDataset: scans ``img_dir``/``ann_dir``
    for suffix pairs (optionally via a split file), applies the pipeline,
    and evaluates mIoU/mDice via `aadg_tpu.metrics.eval_metrics`."""

    CLASSES: Optional[Sequence[str]] = None
    PALETTE = None

    def __init__(self, pipeline: Sequence[Callable], img_dir: str,
                 img_suffix: str = ".jpg", ann_dir: Optional[str] = None,
                 seg_map_suffix: str = ".png", split: Optional[str] = None,
                 data_root: Optional[str] = None, test_mode: bool = False,
                 ignore_index: int = 255, reduce_zero_label: bool = False,
                 to_float32: bool = False):
        self.pipeline = Compose(pipeline)
        if data_root is not None:
            img_dir = os.path.join(data_root, img_dir)
            if ann_dir is not None:
                ann_dir = os.path.join(data_root, ann_dir)
            if split is not None:
                split = os.path.join(data_root, split)
        self.img_dir = img_dir
        self.ann_dir = ann_dir
        self.img_suffix = img_suffix
        self.seg_map_suffix = seg_map_suffix
        self.test_mode = test_mode
        self.ignore_index = ignore_index
        self.reduce_zero_label = reduce_zero_label
        # `pipelines/loading.py:44-47` LoadImageFromFile(to_float32=True)
        self.to_float32 = to_float32
        if split is not None:
            with open(split) as f:
                stems = [line.strip() for line in f if line.strip()]
        else:
            stems = sorted(
                fn[: -len(img_suffix)] for fn in os.listdir(img_dir)
                if fn.endswith(img_suffix))
        self.stems = stems

    def __len__(self):
        return len(self.stems)

    def _load(self, idx: int):
        stem = self.stems[idx]
        img = np.asarray(Image.open(
            os.path.join(self.img_dir, stem + self.img_suffix)
        ).convert("RGB"))
        if self.to_float32:
            img = img.astype(np.float32)
        results = dict(img=img, ori_shape=img.shape, img_shape=img.shape,
                       filename=stem, seg_fields=[])
        if self.ann_dir is not None:
            seg = np.asarray(Image.open(os.path.join(
                self.ann_dir, stem + self.seg_map_suffix)))
            seg = seg.astype(np.int64)
            if self.reduce_zero_label:  # `custom.py` semantics
                seg[seg == 0] = 256
                seg = seg - 1
                # original ignore-255 pixels became 254 after the shift;
                # map them back to the ignore index
                seg[seg == 254] = 255
            results["gt_semantic_seg"] = seg
            results["seg_fields"].append("gt_semantic_seg")
        return results

    def __getitem__(self, idx: int):
        return self.pipeline(self._load(idx))

    def get_gt_seg_maps(self):
        return [self._load(i)["gt_semantic_seg"] for i in
                range(len(self))]

    def evaluate(self, results, metric="mIoU"):
        """`custom.py` evaluate: aAcc + per-class acc/IoU(/Dice)."""
        from ..metrics import eval_metrics
        gts = self.get_gt_seg_maps()
        if self.CLASSES:
            num_classes = len(self.CLASSES)
        else:
            # exclude the ignore label (pad/rotate fill, reduce_zero_label
            # remap) when inferring class count — otherwise 255 inflates
            # it to 256 mostly-NaN per-class entries
            valid = [int(g[g != self.ignore_index].max()) for g in gts
                     if (g != self.ignore_index).any()]
            num_classes = (max(valid) + 1) if valid else 1
        vals = eval_metrics(results, gts, num_classes, self.ignore_index,
                            metric)
        names = ["aAcc", "acc"] + ([metric] if isinstance(metric, str)
                                   else list(metric))
        return dict(zip(names, vals))


class RepeatDataset:
    """`datasets/dataset_wrappers.py`."""

    def __init__(self, dataset, times: int):
        self.dataset = dataset
        self.times = times

    def __len__(self):
        return len(self.dataset) * self.times

    def __getitem__(self, idx):
        return self.dataset[idx % len(self.dataset)]


class ConcatDataset:
    """`datasets/dataset_wrappers.py` (mmdet-style concat)."""

    def __init__(self, datasets):
        self.datasets = list(datasets)

    def __len__(self):
        return sum(len(d) for d in self.datasets)

    def __getitem__(self, idx):
        for d in self.datasets:
            if idx < len(d):
                return d[idx]
            idx -= len(d)
        raise IndexError(idx)


class DRIVEDataset(CustomDataset):
    """`datasets/drive.py`: suffixes + binary vessel classes."""
    CLASSES = ("background", "vessel")

    def __init__(self, **kw):
        kw.setdefault("img_suffix", ".png")
        kw.setdefault("seg_map_suffix", "_manual1.png")
        super().__init__(**kw)


class STAREDataset(CustomDataset):
    """`datasets/stare.py`."""
    CLASSES = ("background", "vessel")

    def __init__(self, **kw):
        kw.setdefault("img_suffix", ".png")
        kw.setdefault("seg_map_suffix", ".ah.png")
        super().__init__(**kw)


class ChaseDB1Dataset(CustomDataset):
    """`datasets/chase_db1.py`."""
    CLASSES = ("background", "vessel")

    def __init__(self, **kw):
        kw.setdefault("img_suffix", ".png")
        kw.setdefault("seg_map_suffix", "_1stHO.png")
        super().__init__(**kw)


class HRFDataset(CustomDataset):
    """`datasets/hrf.py`."""
    CLASSES = ("background", "vessel")

    def __init__(self, **kw):
        kw.setdefault("img_suffix", ".png")
        kw.setdefault("seg_map_suffix", ".png")
        super().__init__(**kw)


class ADE20KDataset(CustomDataset):
    """`datasets/ade.py`: 150 classes, 0 is unlabeled background so
    ``reduce_zero_label`` is fixed True; .jpg images / .png labels."""
    from .dataset_meta import ADE20K_CLASSES as CLASSES
    from .dataset_meta import ADE20K_PALETTE as PALETTE

    def __init__(self, **kw):
        kw["img_suffix"] = ".jpg"
        kw["seg_map_suffix"] = ".png"
        kw["reduce_zero_label"] = True
        super().__init__(**kw)


class PascalVOCDataset(CustomDataset):
    """`datasets/voc.py`: 21 classes incl. background; requires a split
    txt file."""
    from .dataset_meta import VOC_CLASSES as CLASSES
    from .dataset_meta import VOC_PALETTE as PALETTE

    def __init__(self, split, **kw):
        kw["img_suffix"] = ".jpg"
        kw["seg_map_suffix"] = ".png"
        super().__init__(split=split, **kw)
        assert os.path.exists(self.img_dir) and split is not None


class PascalContextDataset(CustomDataset):
    """`datasets/pascal_context.py`: 60 classes, background included so
    ``reduce_zero_label`` fixed False; requires a split txt file."""
    from .dataset_meta import PASCAL_CONTEXT_CLASSES as CLASSES
    from .dataset_meta import PASCAL_CONTEXT_PALETTE as PALETTE

    def __init__(self, split, **kw):
        kw["img_suffix"] = ".jpg"
        kw["seg_map_suffix"] = ".png"
        kw["reduce_zero_label"] = False
        super().__init__(split=split, **kw)
        assert os.path.exists(self.img_dir) and split is not None


class CityscapesDataset(CustomDataset):
    """`datasets/cityscapes.py`: 19 train classes on the
    ``_leftImg8bit.png`` / ``_gtFine_labelTrainIds.png`` suffix pair.

    ``format_results``/``results2img`` write submission-ready paletted
    PNGs with trainId->labelId conversion done natively (the standard
    Cityscapes id table) — the reference needs ``cityscapesscripts`` for
    this; the 'cityscapes' *evaluation protocol* still requires that
    package and raises the same ImportError when absent."""
    from .dataset_meta import CITYSCAPES_CLASSES as CLASSES
    from .dataset_meta import CITYSCAPES_PALETTE as PALETTE

    # standard Cityscapes trainId (0..18) -> labelId
    TRAINID_TO_ID = (7, 8, 11, 12, 13, 17, 19, 20, 21, 22, 23, 24, 25,
                     26, 27, 28, 31, 32, 33)

    def __init__(self, **kw):
        kw["img_suffix"] = "_leftImg8bit.png"
        kw["seg_map_suffix"] = "_gtFine_labelTrainIds.png"
        super().__init__(**kw)

    @classmethod
    def _convert_to_label_id(cls, result: np.ndarray) -> np.ndarray:
        lut = np.arange(256, dtype=np.uint8)
        for train_id, label_id in enumerate(cls.TRAINID_TO_ID):
            lut[train_id] = label_id
        return lut[result.astype(np.uint8)]

    def results2img(self, results, imgfile_prefix: str,
                    to_label_id: bool = True):
        os.makedirs(imgfile_prefix, exist_ok=True)
        palette = np.zeros((256, 3), np.uint8)
        for train_id, label_id in enumerate(self.TRAINID_TO_ID):
            palette[label_id] = self.PALETTE[train_id]
        files = []
        for idx in range(len(self)):
            result = np.asarray(results[idx])
            if to_label_id:
                result = self._convert_to_label_id(result)
            png = os.path.join(imgfile_prefix, f"{self.stems[idx]}.png")
            out = Image.fromarray(result.astype(np.uint8)).convert("P")
            out.putpalette(palette.reshape(-1).tolist())
            out.save(png)
            files.append(png)
        return files

    def format_results(self, results, imgfile_prefix: Optional[str] = None,
                       to_label_id: bool = True):
        import tempfile
        tmp_dir = None
        if imgfile_prefix is None:
            tmp_dir = tempfile.TemporaryDirectory()
            imgfile_prefix = tmp_dir.name
        return self.results2img(results, imgfile_prefix, to_label_id), \
            tmp_dir

    def evaluate(self, results, metric="mIoU", imgfile_prefix=None):
        metrics = list(metric) if isinstance(metric, (list, tuple)) \
            else [metric]
        out = {}
        if "cityscapes" in metrics:
            try:
                import cityscapesscripts  # noqa: F401
            except ImportError:
                raise ImportError(
                    'Please run "pip install cityscapesscripts" to '
                    "install cityscapesscripts first.")
            metrics.remove("cityscapes")
        if metrics:
            out.update(super().evaluate(
                results, metrics[0] if len(metrics) == 1 else metrics))
        return out


class CocoStuffDataset(CustomDataset):
    """`datasets/cocostuff.py` CocoStuff: 182 stuff+thing classes on
    .jpg/.png pairs (numeric class names and the reference's fixed
    color table, carried as metadata in ``dataset_meta.py``)."""
    from .dataset_meta import COCOSTUFF_CLASSES as CLASSES
    from .dataset_meta import COCOSTUFF_PALETTE as PALETTE

    def __init__(self, **kw):
        kw["img_suffix"] = ".jpg"
        kw["seg_map_suffix"] = ".png"
        super().__init__(**kw)


class MapillaryDataset(CustomDataset):
    """`datasets/mapillary.py`: 66 Vistas classes (.jpg/.png); usually
    paired with the ``MaillaryHack`` pipeline remap to 19 train classes."""
    from .dataset_meta import MAPILLARY_CLASSES as CLASSES
    from .dataset_meta import MAPILLARY_PALETTE as PALETTE

    def __init__(self, **kw):
        kw["img_suffix"] = ".jpg"
        kw["seg_map_suffix"] = ".png"
        kw["reduce_zero_label"] = False
        super().__init__(**kw)


# ---------------------------------------------------------------------------
# Registry + builder (`datasets/builder.py:60-75`)
# ---------------------------------------------------------------------------

DATASETS = {
    "CustomDataset": CustomDataset,
    "DRIVEDataset": DRIVEDataset,
    "STAREDataset": STAREDataset,
    "ChaseDB1Dataset": ChaseDB1Dataset,
    "HRFDataset": HRFDataset,
    "ADE20KDataset": ADE20KDataset,
    "PascalVOCDataset": PascalVOCDataset,
    "PascalContextDataset": PascalContextDataset,
    "CityscapesDataset": CityscapesDataset,
    "CocoStuff": CocoStuffDataset,
    "CocoStuffDataset": CocoStuffDataset,
    "MapillaryDataset": MapillaryDataset,
}

TRANSFORMS = {
    "Resize": Resize, "AlignedResize": AlignedResize,
    "RandomFlip": RandomFlip, "Pad": Pad, "Normalize": Normalize,
    "Rerange": Rerange, "CLAHE": CLAHE, "RandomCrop": RandomCrop,
    "CenterCrop": CenterCrop, "RandomRotate": RandomRotate,
    "RGB2Gray": RGB2Gray, "AdjustGamma": AdjustGamma,
    "SegRescale": SegRescale,
    "PhotoMetricDistortion": PhotoMetricDistortion,
    "MaillaryHack": MaillaryHack,
    "MultiScaleFlipAug": MultiScaleFlipAug,
}


def build_transform(cfg: dict):
    """One pipeline step from an mmseg-style dict (``type`` + kwargs).
    No-op loader/formatting steps (handled natively by CustomDataset)
    return None and are dropped; loader options the dataset can honor
    (``to_float32``, ``reduce_zero_label``) are plumbed by the builder,
    anything else unrecognized raises instead of silently diverging."""
    cfg = dict(cfg)
    t = cfg.pop("type")
    if t in ("DefaultFormatBundle", "ImageToTensor", "Collect"):
        return None  # tensor formatting is native here (keys are meta)
    if t == "LoadImageFromFile":
        cfg.pop("to_float32", None)  # plumbed by build_pipeline_dataset
        assert not cfg, f"unsupported LoadImageFromFile args {cfg}"
        return None
    if t == "LoadAnnotations":
        cfg.pop("reduce_zero_label", None)  # plumbed by the builder
        assert not cfg, f"unsupported LoadAnnotations args {cfg}"
        return None
    if t == "MultiScaleFlipAug":
        inner = [x for x in (build_transform(c)
                             for c in cfg.pop("transforms")) if x]
        return MultiScaleFlipAug(inner, **cfg)
    return TRANSFORMS[t](**cfg)


def build_pipeline_dataset(cfg, default_args: Optional[dict] = None):
    """mmseg ``build_dataset`` equivalent (`datasets/builder.py:60-75`):
    list -> ConcatDataset, RepeatDataset wrapper, else registry lookup.
    ``pipeline`` entries may be mmseg-style dicts or callables."""
    if isinstance(cfg, (list, tuple)):
        return ConcatDataset([build_pipeline_dataset(c, default_args)
                              for c in cfg])
    cfg = dict(cfg)
    if default_args:
        for k, v in default_args.items():
            cfg.setdefault(k, v)
    if cfg["type"] == "RepeatDataset":
        return RepeatDataset(
            build_pipeline_dataset(cfg["dataset"], default_args),
            cfg["times"])
    cls = DATASETS[cfg.pop("type")]
    raw_pipeline = cfg.get("pipeline", ())
    # mmseg configs may put reduce_zero_label on the LoadAnnotations step
    # (`pipelines/loading.py:105`) rather than the dataset; the loader
    # step itself is a CustomDataset native here, so plumb the flag
    # through to the dataset instead of silently dropping it
    for p in raw_pipeline:
        if isinstance(p, dict) and p.get("type") == "LoadAnnotations" \
                and "reduce_zero_label" in p:
            cfg.setdefault("reduce_zero_label", p["reduce_zero_label"])
        if isinstance(p, dict) and p.get("type") == "LoadImageFromFile" \
                and "to_float32" in p:
            cfg.setdefault("to_float32", p["to_float32"])
    pipeline = [x for x in
                ((build_transform(p) if isinstance(p, dict) else p)
                 for p in raw_pipeline) if x]
    cfg["pipeline"] = pipeline
    return cls(**cfg)
