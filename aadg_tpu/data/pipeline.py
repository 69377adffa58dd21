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
# numpy image helpers (bilinear/nearest resize without cv2)
# ---------------------------------------------------------------------------

def _resize_img(img: np.ndarray, size: Tuple[int, int],
                nearest: bool = False) -> np.ndarray:
    """Resize H,W(,C) array to (h, w). PIL backend, matching the
    reference's pillow default."""
    h, w = size
    if img.shape[:2] == (h, w):
        return img
    if nearest:
        # PIL-NEAREST sampling rule (pixel centers), any dtype
        ys = np.minimum((np.arange(h) + 0.5) * img.shape[0] / h,
                        img.shape[0] - 1).astype(int)
        xs = np.minimum((np.arange(w) + 0.5) * img.shape[1] / w,
                        img.shape[1] - 1).astype(int)
        return img[ys[:, None], xs[None, :]]
    mode = Image.BILINEAR
    if img.ndim == 2:
        out = Image.fromarray(img).resize((w, h), mode)
        return np.asarray(out)
    dtype = img.dtype
    chans = [np.asarray(Image.fromarray(
        img[..., c].astype(np.float32) if dtype != np.uint8 else img[..., c]
    ).resize((w, h), mode)) for c in range(img.shape[-1])]
    return np.stack(chans, -1).astype(dtype)


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
    """`transforms.py:237-463`: img_scale (+ ratio_range for jitter),
    keep_ratio rescales the long edge; the seg map resizes nearest."""

    def __init__(self, img_scale: Optional[Tuple[int, int]] = None,
                 ratio_range: Optional[Tuple[float, float]] = None,
                 keep_ratio: bool = True, rng: Optional[np.random.Generator]
                 = None):
        self.img_scale = img_scale
        self.ratio_range = ratio_range
        self.keep_ratio = keep_ratio
        self.rng = rng or np.random.default_rng()

    def __call__(self, results):
        img = results["img"]
        h, w = img.shape[:2]
        scale = self.img_scale or (h, w)
        if self.ratio_range is not None:
            ratio = self.rng.uniform(*self.ratio_range)
            scale = (int(scale[0] * ratio), int(scale[1] * ratio))
        if self.keep_ratio:
            factor = min(max(scale) / max(h, w), min(scale) / min(h, w))
            new_h, new_w = int(h * factor + 0.5), int(w * factor + 0.5)
        else:
            new_h, new_w = scale
        results["img"] = _resize_img(img, (new_h, new_w))
        if "gt_semantic_seg" in results:
            results["gt_semantic_seg"] = _resize_img(
                results["gt_semantic_seg"], (new_h, new_w), nearest=True)
        results["img_shape"] = (new_h, new_w)
        results["scale_factor"] = (new_h / h, new_w / w)
        return results


class AlignedResize(Resize):
    """`transforms.py:10-236` AlignedResize (the SegFormer eval resize):
    identical to ``Resize`` except both output sides are then aligned UP
    to the next multiple of ``size_divisor`` (img bilinear, seg nearest) —
    so whole-image inference never needs padding."""

    def __init__(self, img_scale=None, ratio_range=None,
                 keep_ratio: bool = True, size_divisor: int = 32, rng=None):
        super().__init__(img_scale=img_scale, ratio_range=ratio_range,
                         keep_ratio=keep_ratio, rng=rng)
        self.size_divisor = size_divisor

    def _aligned(self, h: int, w: int) -> Tuple[int, int]:
        d = self.size_divisor
        return -(-h // d) * d, -(-w // d) * d

    def __call__(self, results):
        results = super().__call__(results)
        h, w = results["img"].shape[:2]
        ah, aw = self._aligned(h, w)
        if (ah, aw) != (h, w):
            results["img"] = _resize_img(results["img"], (ah, aw))
            if "gt_semantic_seg" in results:
                results["gt_semantic_seg"] = _resize_img(
                    results["gt_semantic_seg"], (ah, aw), nearest=True)
            results["img_shape"] = (ah, aw)
        return results


class MaillaryHack:
    """`transforms.py:1028-1065`: remap Mapillary Vistas' 66 labels onto
    the 19 Cityscapes train classes (all unmapped labels -> 255 ignore).
    One vectorized LUT pass instead of the reference's per-value loops."""

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
        flip = results.get("flip")
        if flip is None:
            flip = bool(self.rng.random() < self.prob)
        results["flip"] = flip
        results["flip_direction"] = self.direction
        if flip:
            axis = 1 if self.direction == "horizontal" else 0
            results["img"] = np.flip(results["img"], axis=axis).copy()
            if "gt_semantic_seg" in results:
                results["gt_semantic_seg"] = np.flip(
                    results["gt_semantic_seg"], axis=axis).copy()
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
            if "gt_semantic_seg" in results:
                results["gt_semantic_seg"] = np.pad(
                    results["gt_semantic_seg"], ((0, ph), (0, pw)),
                    constant_values=self.seg_pad_val)
        results["pad_shape"] = (th, tw)
        return results


class Normalize:
    """`transforms.py:591-631`: (img - mean) / std, optional BGR->RGB
    (images here are already RGB; to_rgb kept for config parity)."""

    def __init__(self, mean, std, to_rgb: bool = True):
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)
        self.to_rgb = to_rgb

    def __call__(self, results):
        img = results["img"].astype(np.float32)
        results["img"] = (img - self.mean) / self.std
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
        img = results["img"].astype(np.float32)
        lo, hi = img.min(), img.max()
        img = (img - lo) / max(hi - lo, 1e-12)
        results["img"] = img * (self.max_value - self.min_value) \
            + self.min_value
        return results


class CLAHE:
    """`transforms.py:679-722`: contrast-limited adaptive histogram
    equalization (numpy re-implementation of the classic tiled algorithm;
    the reference calls mmcv.clahe/OpenCV)."""

    def __init__(self, clip_limit: float = 40.0,
                 tile_grid_size: Tuple[int, int] = (8, 8)):
        self.clip_limit = clip_limit
        self.tile_grid_size = tile_grid_size

    def _tile_lut(self, tile: np.ndarray) -> np.ndarray:
        hist = np.bincount(tile.ravel(), minlength=256).astype(np.float64)
        clip = max(self.clip_limit * tile.size / 256.0, 1.0)
        excess = np.maximum(hist - clip, 0).sum()
        hist = np.minimum(hist, clip) + excess / 256.0
        cdf = np.cumsum(hist)
        return np.clip(np.round(cdf * 255.0 / max(cdf[-1], 1e-12)),
                       0, 255)

    def __call__(self, results):
        img = results["img"].astype(np.uint8)
        gy, gx = self.tile_grid_size
        out = np.empty_like(img, np.float64)
        for c in range(img.shape[-1]):
            ch = img[..., c]
            h, w = ch.shape
            ys = np.linspace(0, h, gy + 1).astype(int)
            xs = np.linspace(0, w, gx + 1).astype(int)
            luts = np.stack([
                np.stack([self._tile_lut(ch[ys[i]:ys[i + 1],
                                            xs[j]:xs[j + 1]])
                          for j in range(gx)]) for i in range(gy)])
            cy = (ys[:-1] + ys[1:]) / 2.0
            cx = (xs[:-1] + xs[1:]) / 2.0
            fy = np.interp(np.arange(h), cy, np.arange(gy))
            fx = np.interp(np.arange(w), cx, np.arange(gx))
            y0 = np.clip(np.floor(fy).astype(int), 0, gy - 1)
            x0 = np.clip(np.floor(fx).astype(int), 0, gx - 1)
            y1 = np.minimum(y0 + 1, gy - 1)
            x1 = np.minimum(x0 + 1, gx - 1)
            wy = (fy - y0)[:, None]
            wx = (fx - x0)[None, :]
            v = ch[np.arange(h)[:, None], np.arange(w)[None, :]]
            g = lambda yy, xx: luts[yy[:, None], xx[None, :], v]
            out[..., c] = ((1 - wy) * ((1 - wx) * g(y0, x0)
                                       + wx * g(y0, x1))
                           + wy * ((1 - wx) * g(y1, x0) + wx * g(y1, x1)))
        results["img"] = out.astype(np.uint8)
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
        if seg is not None:
            results["gt_semantic_seg"] = seg[y:y + self.crop_size[0],
                                             x:x + self.crop_size[1]]
        results["img_shape"] = results["img"].shape[:2]
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
        if "gt_semantic_seg" in results:
            results["gt_semantic_seg"] = results["gt_semantic_seg"][
                y:y + self.crop_size[0], x:x + self.crop_size[1]]
        results["img_shape"] = results["img"].shape[:2]
        return results


class RandomRotate:
    """`transforms.py:855-936`: rotate by a uniform angle with prob;
    nearest for seg, border filled with pad values."""

    def __init__(self, prob: float, degree: float, pad_val: float = 0,
                 seg_pad_val: int = 255, rng=None):
        self.prob = prob
        self.degree = (-degree, degree) if np.isscalar(degree) else degree
        self.pad_val = pad_val
        self.seg_pad_val = seg_pad_val
        self.rng = rng or np.random.default_rng()

    def __call__(self, results):
        if self.rng.random() >= self.prob:
            return results
        angle = float(self.rng.uniform(*self.degree))
        img = Image.fromarray(results["img"].astype(np.uint8))
        results["img"] = np.asarray(img.rotate(
            -angle, Image.BILINEAR, fillcolor=int(self.pad_val)))
        if "gt_semantic_seg" in results:
            seg = Image.fromarray(
                results["gt_semantic_seg"].astype(np.uint8))
            results["gt_semantic_seg"] = np.asarray(seg.rotate(
                -angle, Image.NEAREST, fillcolor=self.seg_pad_val))
        return results


class RGB2Gray:
    """`transforms.py:938-991`: weighted grayscale, broadcast back to
    out_channels."""

    def __init__(self, out_channels: Optional[int] = None,
                 weights=(0.299, 0.587, 0.114)):
        self.out_channels = out_channels
        self.weights = np.asarray(weights, np.float32)

    def __call__(self, results):
        img = results["img"].astype(np.float32)
        gray = (img[..., :3] * self.weights).sum(-1, keepdims=True)
        n = self.out_channels or img.shape[-1]
        results["img"] = np.repeat(gray, n, axis=-1)
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
        if self.scale_factor != 1.0 and "gt_semantic_seg" in results:
            seg = results["gt_semantic_seg"]
            size = (int(seg.shape[0] * self.scale_factor),
                    int(seg.shape[1] * self.scale_factor))
            results["gt_semantic_seg"] = _resize_img(seg, size, nearest=True)
        return results


class PhotoMetricDistortion:
    """`transforms.py` PhotoMetricDistortion: random brightness, contrast
    (random order), saturation and hue in HSV space."""

    def __init__(self, brightness_delta: int = 32,
                 contrast_range=(0.5, 1.5), saturation_range=(0.5, 1.5),
                 hue_delta: int = 18, rng=None):
        self.brightness_delta = brightness_delta
        self.contrast_range = contrast_range
        self.saturation_range = saturation_range
        self.hue_delta = hue_delta
        self.rng = rng or np.random.default_rng()

    @staticmethod
    def _rgb_to_hsv(img):
        import colorsys  # noqa: F401  (documentation pointer)
        r, g, b = img[..., 0], img[..., 1], img[..., 2]
        mx = img.max(-1)
        mn = img.min(-1)
        df = mx - mn
        h = np.zeros_like(mx)
        m = df > 0
        rm = m & (mx == r)
        gm = m & (mx == g) & ~rm
        bm = m & ~rm & ~gm
        h[rm] = (60 * ((g - b) / np.where(df == 0, 1, df)) % 360)[rm]
        h[gm] = (60 * ((b - r) / np.where(df == 0, 1, df)) + 120)[gm]
        h[bm] = (60 * ((r - g) / np.where(df == 0, 1, df)) + 240)[bm]
        s = np.where(mx == 0, 0, df / np.where(mx == 0, 1, mx))
        return h, s, mx

    @staticmethod
    def _hsv_to_rgb(h, s, v):
        h = (h % 360) / 60.0
        i = np.floor(h).astype(int) % 6
        f = h - np.floor(h)
        p = v * (1 - s)
        q = v * (1 - f * s)
        t = v * (1 - (1 - f) * s)
        choices = [np.stack(c, -1) for c in
                   [(v, t, p), (q, v, p), (p, v, t),
                    (p, q, v), (t, p, v), (v, p, q)]]
        out = np.zeros(h.shape + (3,), np.float32)
        for k, c in enumerate(choices):
            out[i == k] = c[i == k]
        return out

    def __call__(self, results):
        img = results["img"].astype(np.float32)
        r = self.rng
        if r.integers(2):
            img = img + r.uniform(-self.brightness_delta,
                                  self.brightness_delta)
        contrast_last = bool(r.integers(2))
        if not contrast_last and r.integers(2):
            img = img * r.uniform(*self.contrast_range)
        sat_flag, hue_flag = bool(r.integers(2)), bool(r.integers(2))
        if sat_flag or hue_flag:
            h, s, v = self._rgb_to_hsv(np.clip(img, 0, 255) / 255.0)
            if sat_flag:
                s = np.clip(s * r.uniform(*self.saturation_range), 0, 1)
            if hue_flag:
                h = h + r.uniform(-self.hue_delta, self.hue_delta) * 2
            img = self._hsv_to_rgb(h, s, v) * 255.0
        if contrast_last and r.integers(2):
            img = img * r.uniform(*self.contrast_range)
        results["img"] = np.clip(img, 0, 255).astype(np.uint8)
        return results


class MultiScaleFlipAug:
    """`pipelines/test_time_aug.py`: expand one sample into the TTA set
    (scales x flips), each run through the inner transforms."""

    def __init__(self, transforms: Sequence[Callable],
                 img_scale, img_ratios=None, flip: bool = False,
                 flip_direction="horizontal"):
        self.transforms = Compose(transforms)
        scales = img_scale if isinstance(img_scale, list) else [img_scale]
        if img_ratios is not None:
            base = scales[0]
            scales = [(int(base[0] * r), int(base[1] * r))
                      for r in img_ratios]
        self.scales = scales
        self.flips = [False] + ([True] if flip else [])
        self.flip_direction = flip_direction

    def __call__(self, results):
        out = []
        for scale in self.scales:
            for flip in self.flips:
                r = {k: (v.copy() if isinstance(v, np.ndarray) else v)
                     for k, v in results.items()}
                r = Resize(img_scale=scale, keep_ratio=True)(r)
                r["flip"] = flip
                r = RandomFlip(direction=self.flip_direction)(r)
                out.append(self.transforms(r))
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
                 ignore_index: int = 255, reduce_zero_label: bool = False):
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
        results = dict(img=img, ori_shape=img.shape[:2],
                       img_shape=img.shape[:2], filename=stem)
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
    return None and are dropped."""
    cfg = dict(cfg)
    t = cfg.pop("type")
    if t in ("LoadImageFromFile", "LoadAnnotations", "DefaultFormatBundle",
             "ImageToTensor", "Collect"):
        return None  # decoding/formatting are CustomDataset natives here
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
    pipeline = [x for x in
                ((build_transform(p) if isinstance(p, dict) else p)
                 for p in raw_pipeline) if x]
    cfg["pipeline"] = pipeline
    return cls(**cfg)
