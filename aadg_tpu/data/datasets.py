"""Host-side dataset loading (decode once into RAM, then ship to HBM).

Mirrors the reference's RAM-resident pools: ``FundusSegmentation``
(`/root/reference/data/optic.py:11-137`) and ``RetinalVesselSegmentation``
(`/root/reference/data/vessel.py:12-156`), including the quirks that define
the data distribution: LANCZOS resize to 256 (optic) / 512 (rvs), the
Domain4-first center-crop branch (`optic.py:121-125`), filename-prefix
domain flags, STARE's first-10/rest train/test split (`vessel.py:61-64`),
and default-resample (bicubic) label resizing.

A ``SyntheticDataset`` with the same contract powers tests and CI — the
reference has no hermetic path at all (SURVEY.md §4).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from glob import glob
from typing import Dict, List, Optional

import numpy as np


@dataclass
class DomainData:
    """One domain's images/labels, decoded and resized."""
    name: str
    images: np.ndarray              # (N, H, W, 3) uint8
    labels: np.ndarray              # (N, H, W) uint8 (raw gray values)
    names: List[str] = field(default_factory=list)
    rois: Optional[np.ndarray] = None  # (N, H, W) uint8, rvs only


class FundusDataset:
    """Optic cup/disc (Fundus) — 4 domains, leave-one-out by splitid."""

    FLAGS = {"DGS": ("gd", "nd"), "REF": ("g", "n"),
             "RIM": ("G", "N", "S"), "REF_val": ("V",)}

    def __init__(self, base_dir: str, phase: str = "train",
                 splitid=(1, 2, 3), size: int = 256):
        from PIL import Image
        pools: Dict[str, list] = {k: ([], [], []) for k in self.FLAGS}
        image_list = []
        for did in splitid:
            image_dir = os.path.join(base_dir, f"Domain{did}", phase,
                                     "ROIs/image/")
            for image_path in sorted(glob(image_dir + "*.png")):
                image_list.append(
                    (image_path, image_path.replace("image", "mask")))

        center_crop = (splitid[0] == 4)  # reference quirk, optic.py:121
        from . import native_io
        use_native = native_io.available()
        for img_path, gt_path in image_list:
            basename = os.path.basename(img_path)
            flag = None
            for key, prefixes in self.FLAGS.items():
                if any(basename.startswith(p) for p in prefixes):
                    # DGS uses 2-char prefixes; others 1-char
                    if key == "DGS" and basename[0:2] in prefixes:
                        flag = key
                        break
                    if key != "DGS" and basename[0] in prefixes:
                        flag = key
                        break
            if flag is None:
                raise ValueError(f"Unknown dataset file: {basename}")
            target = Image.open(gt_path)
            if use_native and not center_crop:
                # native C++ decode+LANCZOS path (native/image_ops.cpp)
                img_arr = native_io.load_rgb_resized(img_path, size, size)
            else:
                img = Image.open(img_path).convert("RGB")
                if center_crop:
                    img = img.crop((144, 144, 144 + 512, 144 + 512))
                    target = Image.fromarray(
                        np.asarray(target.convert("L"))[144:144 + 512,
                                                        144:144 + 512])
                img_arr = np.asarray(
                    img.resize((size, size), Image.LANCZOS), np.uint8)
            if target.mode == "RGB":
                target = target.convert("L")
            target = target.resize((size, size))  # PIL default (bicubic)
            pools[flag][0].append(img_arr)
            pools[flag][1].append(np.asarray(target.convert("L"), np.uint8))
            pools[flag][2].append(basename)

        self.domains = [
            DomainData(k, np.stack(v[0]), np.stack(v[1]), v[2])
            for k, v in pools.items() if v[0]]


class RVSDataset:
    """Retinal vessel — CHASEDB1/DRIVE/HRF/STARE, leave-one-out by splitid."""

    POSTFIX = [("jpg", "png", "png"), ("tif", "tif", "gif"),
               ("jpg", "tif", "tif"), ("ppm", "ppm", "png")]

    def __init__(self, base_dir: str, phase: str = "train",
                 splitid=(0, 1, 2), size: int = 512):
        from PIL import Image
        import imageio
        domain_dirs = sorted(os.listdir(base_dir))
        pools: Dict[str, list] = {}
        for did in splitid:
            ddir = os.path.join(base_dir, domain_dirs[did])
            # STARE (id 3) has no train/test subdirs (`vessel.py:46-50`)
            image_dir = ddir if did == 3 else os.path.join(ddir, phase)
            pim, pgt, proi = self.POSTFIX[did]
            imgs = sorted(glob(os.path.join(image_dir, "image", f"*.{pim}")))
            gts = sorted(glob(os.path.join(image_dir, "mask", f"*.{pgt}")))
            rois = sorted(glob(os.path.join(image_dir, "roi", f"*.{proi}")))
            if did == 3:  # STARE: first 10 train, rest test
                sl = slice(0, 10) if phase != "test" else slice(10, None)
                imgs, gts, rois = imgs[sl], gts[sl], rois[sl]
            key = domain_dirs[did]
            ims, gs, rs, names = [], [], [], []
            for ip, gp, rp in zip(imgs, gts, rois):
                if did == 3:  # STARE ppm via imageio (`vessel.py:139-143`)
                    im = Image.fromarray(imageio.v2.imread(ip)).convert(
                        "RGB").resize((size, size), Image.LANCZOS)
                    gt = Image.fromarray(imageio.v2.imread(gp)).convert(
                        "L").resize((size, size))
                else:
                    im = Image.open(ip).convert("RGB").resize(
                        (size, size), Image.LANCZOS)
                    gt = Image.open(gp).convert("L").resize((size, size))
                roi = Image.open(rp).convert("L").resize((size, size))
                ims.append(np.asarray(im, np.uint8))
                gs.append(np.asarray(gt, np.uint8))
                rs.append(np.asarray(roi, np.uint8))
                names.append(os.path.basename(ip))
            if ims:
                pools[key] = DomainData(key, np.stack(ims), np.stack(gs),
                                        names, rois=np.stack(rs))
        self.domains = list(pools.values())


class SyntheticDataset:
    """Hermetic test dataset matching the DomainData contract.

    optic-style: bright disc with darker cup on domain-tinted background
    (mask gray levels 255/128/0 like Fundus). vessel-style: random walks
    of bright curves (binary mask) with a circular ROI.
    """

    def __init__(self, task: str = "optic", n_domains: int = 3,
                 n_per_domain: int = 12, size: int = 64, seed: int = 0):
        rng = np.random.default_rng(seed)
        self.domains = []
        for d in range(n_domains):
            imgs, labels, rois, names = [], [], [], []
            for i in range(n_per_domain):
                if task == "optic_tint":
                    img, lab = self._make_optic_tint(rng, size, d)
                    roi = None
                elif task == "optic":
                    img, lab = self._make_optic(rng, size, d)
                    roi = None
                else:
                    img, lab, roi = self._make_vessel(rng, size, d)
                    rois.append(roi)
                imgs.append(img)
                labels.append(lab)
                names.append(f"d{d}_{i}.png")
            self.domains.append(DomainData(
                f"SYN{d}", np.stack(imgs), np.stack(labels), names,
                rois=np.stack(rois) if rois else None))

    @staticmethod
    def _make_optic_tint(rng, size, domain):
        """Learning-testbed variant (tools/prove_learning.py): domains are
        identical except a CHROMA tint under pure-LUMA noise — all
        stochastic content is replicated across channels, and domain d
        adds a fixed (+t, 0, -t) channel offset. By construction the only
        domain-discriminative signal lives in the chroma axis, so the
        Color op (PIL saturation enhance: gray + v*(x - gray)) at v > 1
        amplifies the inter-domain signal while leaving the luma noise
        unchanged, and histogram/offset-normalizing ops (AutoContrast's
        per-channel min-max stretch, Equalize) erase it."""
        yy, xx = np.mgrid[0:size, 0:size]
        cy, cx = rng.uniform(size * .3, size * .7, 2)
        r_disc = rng.uniform(size * .15, size * .25)
        r_cup = r_disc * rng.uniform(0.4, 0.7)
        disc = (yy - cy) ** 2 + (xx - cx) ** 2 < r_disc ** 2
        cup = (yy - cy) ** 2 + (xx - cx) ** 2 < r_cup ** 2
        luma = rng.normal(85.0, 15.0, (size, size, 1))
        luma[disc] += 50
        luma[cup] += 25
        tint = float(25 * (domain - 1))  # -25 / 0 / +25
        img = np.clip(luma + np.array([tint, 0.0, -tint]), 0, 255)
        lab = np.full((size, size), 255, np.uint8)
        lab[disc] = 128
        lab[cup] = 0
        return img.astype(np.uint8), lab

    @staticmethod
    def _make_optic(rng, size, domain):
        yy, xx = np.mgrid[0:size, 0:size]
        cy, cx = rng.uniform(size * .3, size * .7, 2)
        r_disc = rng.uniform(size * .15, size * .25)
        r_cup = r_disc * rng.uniform(0.4, 0.7)
        disc = (yy - cy) ** 2 + (xx - cx) ** 2 < r_disc ** 2
        cup = (yy - cy) ** 2 + (xx - cx) ** 2 < r_cup ** 2
        base = 60 + 40 * domain
        img = np.clip(rng.normal(base, 15, (size, size, 3)), 0, 255)
        img[disc] = np.clip(img[disc] + 80, 0, 255)
        img[cup] = np.clip(img[cup] + 40, 0, 255)
        # Fundus mask convention: 255 background, 128 disc ring, 0 cup
        lab = np.full((size, size), 255, np.uint8)
        lab[disc] = 128
        lab[cup] = 0
        return img.astype(np.uint8), lab

    @staticmethod
    def _make_vessel(rng, size, domain):
        base = 40 + 30 * domain
        img = np.clip(rng.normal(base, 10, (size, size, 3)), 0, 255)
        lab = np.zeros((size, size), np.uint8)
        for _ in range(3):
            y = rng.integers(5, size - 5)
            x = 0
            while x < size:
                lab[max(y - 1, 0):y + 1, x] = 255
                img[max(y - 1, 0):y + 1, x] = np.clip(
                    img[max(y - 1, 0):y + 1, x] + 90, 0, 255)
                y = int(np.clip(y + rng.integers(-2, 3), 1, size - 2))
                x += 1
        yy, xx = np.mgrid[0:size, 0:size]
        roi = (((yy - size / 2) ** 2 + (xx - size / 2) ** 2)
               < (size * 0.48) ** 2).astype(np.uint8) * 255
        return img.astype(np.uint8), lab, roi


def build_dataset(cfg, phase: str):
    """Dataset factory from config (reference analogue:
    `data/dataloader.py:10-36`)."""
    name = cfg.DATASET.NAME
    splitid = (cfg.DATASET.DG.TRAIN if phase == "train"
               else cfg.DATASET.DG.TEST)
    if name == "optic":
        return FundusDataset(cfg.DATASET.ROOT, phase=phase,
                             splitid=list(splitid))
    if name == "rvs":
        return RVSDataset(cfg.DATASET.ROOT, phase=phase,
                          splitid=list(splitid))
    if name.startswith("synthetic"):
        task = ("optic_tint" if "optic_tint" in name
                else "optic" if "optic" in name else "rvs")
        n_dom = 3 if phase == "train" else 1
        size = int(getattr(cfg.TPU, "SYNTHETIC_SIZE", 64))
        return SyntheticDataset(task=task, n_domains=n_dom,
                                n_per_domain=12 if phase == "train" else 4,
                                size=size, seed=0 if phase == "train" else 1)
    raise NotImplementedError(name)


def load_train_arrays(dataset):
    """Pad per-domain pools to a common N and stack:
    (D, Nmax, H, W, 3) u8 images, (D, Nmax, H, W) u8 labels, counts (D,)."""
    domains = dataset.domains
    n_max = max(d.images.shape[0] for d in domains)
    imgs, labels, counts = [], [], []
    for d in domains:
        n = d.images.shape[0]
        pad = [(0, n_max - n)] + [(0, 0)] * (d.images.ndim - 1)
        imgs.append(np.pad(d.images, pad))
        labels.append(np.pad(d.labels, pad[:d.labels.ndim]))
        counts.append(n)
    return (np.stack(imgs), np.stack(labels),
            np.asarray(counts, np.int32))


def load_test_arrays(dataset):
    """Flatten all test-domain samples: images (N,H,W,3), labels (N,H,W),
    rois (N,H,W) or None, names."""
    imgs, labels, rois, names = [], [], [], []
    has_roi = all(d.rois is not None for d in dataset.domains)
    for d in dataset.domains:
        imgs.append(d.images)
        labels.append(d.labels)
        names.extend(d.names)
        if has_roi:
            rois.append(d.rois)
    return (np.concatenate(imgs), np.concatenate(labels),
            np.concatenate(rois) if has_roi else None, names)
