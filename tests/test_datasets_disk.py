"""Real-data loader tests on synthetic on-disk trees (VERDICT r1 item 4).

Lays out the reference's actual directory layouts —
``Fundus/Domain{1..4}/{train,test}/ROIs/{image,mask}/*.png``
(`/root/reference/data/optic.py:41-47`) and the RVS domain trees with
per-domain extension tables (`/root/reference/data/vessel.py:38-66`) —
and drives ``FundusDataset`` / ``RVSDataset`` through decode, prefix-flag
routing, the Domain-4 center-crop quirk, the STARE first-10 split, ROI
pools, and ``load_train_arrays`` padding.
"""

import os

import numpy as np
import pytest
from PIL import Image

from aadg_tpu.data.datasets import (FundusDataset, RVSDataset,
                                    load_train_arrays, load_test_arrays)

RNG = np.random.default_rng(7)


def _rand_img(h, w):
    return RNG.integers(0, 256, (h, w, 3), dtype=np.uint8)


def _rand_mask(h, w):
    # Fundus gray convention: 255 bg / 128 disc / 0 cup
    return RNG.choice(np.array([0, 128, 255], np.uint8), (h, w))


def _fundus_tree(root, phase="train"):
    """Domain1: DGS ('gd'/'nd'), Domain2: REF ('g'/'n'), Domain3: RIM
    ('G'/'N'/'S'), Domain4: REF_val ('V', 700x700 for the crop branch)."""
    names = {1: ["gd001.png", "nd002.png"],
             2: ["g0001.png", "n0002.png", "g0003.png"],
             3: ["G-1-L.png", "N-2-R.png", "S-3-L.png"],
             4: ["V0001.png", "V0002.png"]}
    for did, files in names.items():
        base = os.path.join(root, f"Domain{did}", phase, "ROIs")
        os.makedirs(os.path.join(base, "image"))
        os.makedirs(os.path.join(base, "mask"))
        size = 700 if did == 4 else 96
        for fn in files:
            Image.fromarray(_rand_img(size, size)).save(
                os.path.join(base, "image", fn))
            Image.fromarray(_rand_mask(size, size)).save(
                os.path.join(base, "mask", fn))
    return names


class TestFundusDisk:
    def test_prefix_flag_routing_and_domain_order(self, tmp_path):
        _fundus_tree(str(tmp_path))
        ds = FundusDataset(str(tmp_path), phase="train", splitid=[1, 2, 3])
        # pools keep FLAGS order: DGS, REF, RIM (REF_val absent from split)
        assert [d.name for d in ds.domains] == ["DGS", "REF", "RIM"]
        assert [d.images.shape[0] for d in ds.domains] == [2, 3, 3]
        assert sorted(ds.domains[0].names) == ["gd001.png", "nd002.png"]
        # 'g...' files route to REF (not DGS: 2-char prefix must match)
        assert set(ds.domains[1].names) == {"g0001.png", "n0002.png",
                                            "g0003.png"}
        for d in ds.domains:
            assert d.images.shape[1:] == (256, 256, 3)
            assert d.labels.shape[1:] == (256, 256)

    def test_unknown_prefix_raises(self, tmp_path):
        base = tmp_path / "Domain1" / "train" / "ROIs"
        (base / "image").mkdir(parents=True)
        (base / "mask").mkdir(parents=True)
        Image.fromarray(_rand_img(32, 32)).save(base / "image" / "x01.png")
        Image.fromarray(_rand_mask(32, 32)).save(base / "mask" / "x01.png")
        with pytest.raises(ValueError, match="Unknown dataset"):
            FundusDataset(str(tmp_path), phase="train", splitid=[1])

    def test_decode_matches_pil_oracle(self, tmp_path):
        """Non-crop path == PIL convert('RGB').resize(256, LANCZOS)
        (within the native resizer's documented ±1 fixed-point rounding,
        see tests/test_native_io.py) and mask == convert('L').resize(256)
        (default bicubic) exactly (`optic.py:126-135`)."""
        _fundus_tree(str(tmp_path))
        ds = FundusDataset(str(tmp_path), phase="train", splitid=[2])
        (dom,) = ds.domains
        for i, fn in enumerate(dom.names):
            ip = tmp_path / "Domain2" / "train" / "ROIs" / "image" / fn
            mp = tmp_path / "Domain2" / "train" / "ROIs" / "mask" / fn
            ref = np.asarray(Image.open(ip).convert("RGB")
                             .resize((256, 256), Image.LANCZOS))
            diff = np.abs(dom.images[i].astype(int) - ref.astype(int))
            assert diff.max() <= 1 and np.mean(diff > 0) < 0.005
            mref = np.asarray(Image.open(mp).convert("L").resize((256, 256)))
            np.testing.assert_array_equal(dom.labels[i], mref)

    def test_domain4_center_crop_quirk(self, tmp_path):
        """splitid[0]==4 -> crop (144,144,656,656) BEFORE the 256 resize,
        and the mask is array-cropped then resized (`optic.py:121-125`)."""
        _fundus_tree(str(tmp_path), phase="test")
        ds = FundusDataset(str(tmp_path), phase="test", splitid=[4])
        (dom,) = ds.domains
        assert dom.name == "REF_val"
        for i, fn in enumerate(dom.names):
            ip = tmp_path / "Domain4" / "test" / "ROIs" / "image" / fn
            mp = tmp_path / "Domain4" / "test" / "ROIs" / "mask" / fn
            ref = np.asarray(Image.open(ip).convert("RGB")
                             .crop((144, 144, 656, 656))
                             .resize((256, 256), Image.LANCZOS))
            np.testing.assert_array_equal(dom.images[i], ref)
            marr = np.asarray(Image.open(mp).convert("L"))[144:656, 144:656]
            mref = np.asarray(Image.fromarray(marr).resize((256, 256)))
            np.testing.assert_array_equal(dom.labels[i], mref)

    def test_load_train_arrays_pads_uneven_pools(self, tmp_path):
        _fundus_tree(str(tmp_path))
        ds = FundusDataset(str(tmp_path), phase="train", splitid=[1, 2, 3])
        imgs, labels, counts = load_train_arrays(ds)
        assert imgs.shape == (3, 3, 256, 256, 3)
        assert labels.shape == (3, 3, 256, 256)
        np.testing.assert_array_equal(counts, [2, 3, 3])
        # DGS pool (n=2) zero-padded to Nmax=3
        assert imgs[0, 2].sum() == 0


def _rvs_tree(root, n_stare=12):
    """CHASEDB1(jpg,png,png) DRIVE(tif,tif,gif) HRF(jpg,tif,tif) with
    train/test subdirs; STARE(ppm,ppm,png) flat (`vessel.py:46-50`)."""
    exts = {"CHASEDB1": ("jpg", "png", "png"),
            "DRIVE": ("tif", "tif", "gif"),
            "HRF": ("jpg", "tif", "tif")}
    for dom, (ei, eg, er) in exts.items():
        for phase in ("train", "test"):
            base = os.path.join(root, dom, phase)
            for sub in ("image", "mask", "roi"):
                os.makedirs(os.path.join(base, sub))
            for i in range(2):
                Image.fromarray(_rand_img(64, 64)).save(
                    os.path.join(base, "image", f"{dom}_{i:02d}.{ei}"))
                Image.fromarray(
                    (RNG.random((64, 64)) < .3).astype(np.uint8) * 255
                ).save(os.path.join(base, "mask", f"{dom}_{i:02d}.{eg}"))
                Image.fromarray(np.full((64, 64), 255, np.uint8)).save(
                    os.path.join(base, "roi", f"{dom}_{i:02d}.{er}"))
    base = os.path.join(root, "STARE")
    for sub in ("image", "mask", "roi"):
        os.makedirs(os.path.join(base, sub))
    for i in range(n_stare):
        Image.fromarray(_rand_img(64, 64)).save(
            os.path.join(base, "image", f"im{i:04d}.ppm"))
        Image.fromarray(
            (RNG.random((64, 64)) < .3).astype(np.uint8) * 255).save(
            os.path.join(base, "mask", f"im{i:04d}.ppm"))
        Image.fromarray(np.full((64, 64), 255, np.uint8)).save(
            os.path.join(base, "roi", f"im{i:04d}.png"))


class TestRVSDisk:
    def test_extension_table_and_domain_codes(self, tmp_path):
        _rvs_tree(str(tmp_path))
        ds = RVSDataset(str(tmp_path), phase="train", splitid=[0, 1, 2])
        # sorted(listdir) order defines the domain codes (`vessel.py:42-44`)
        assert [d.name for d in ds.domains] == ["CHASEDB1", "DRIVE", "HRF"]
        for d in ds.domains:
            assert d.images.shape == (2, 512, 512, 3)
            assert d.labels.shape == (2, 512, 512)
            assert d.rois is not None and d.rois.shape == (2, 512, 512)
            # ROI present everywhere (white disk fixture stays white)
            assert d.rois.max() == 255

    def test_stare_first10_split(self, tmp_path):
        _rvs_tree(str(tmp_path), n_stare=12)
        tr = RVSDataset(str(tmp_path), phase="train", splitid=[3])
        te = RVSDataset(str(tmp_path), phase="test", splitid=[3])
        assert tr.domains[0].images.shape[0] == 10
        assert te.domains[0].images.shape[0] == 2
        assert tr.domains[0].names == [f"im{i:04d}.ppm" for i in range(10)]
        assert te.domains[0].names == ["im0010.ppm", "im0011.ppm"]

    def test_decode_matches_pil_oracle(self, tmp_path):
        _rvs_tree(str(tmp_path))
        ds = RVSDataset(str(tmp_path), phase="train", splitid=[1])
        (dom,) = ds.domains
        for i, fn in enumerate(dom.names):
            base = tmp_path / "DRIVE" / "train"
            stem = fn.rsplit(".", 1)[0]
            ref = np.asarray(Image.open(base / "image" / fn).convert("RGB")
                             .resize((512, 512), Image.LANCZOS))
            np.testing.assert_array_equal(dom.images[i], ref)
            mref = np.asarray(Image.open(base / "mask" / f"{stem}.tif")
                              .convert("L").resize((512, 512)))
            np.testing.assert_array_equal(dom.labels[i], mref)
            rref = np.asarray(Image.open(base / "roi" / f"{stem}.gif")
                              .convert("L").resize((512, 512)))
            np.testing.assert_array_equal(dom.rois[i], rref)

    def test_test_arrays_carry_rois(self, tmp_path):
        _rvs_tree(str(tmp_path))
        ds = RVSDataset(str(tmp_path), phase="test", splitid=[0, 1])
        imgs, labels, rois, names = load_test_arrays(ds)
        assert imgs.shape == (4, 512, 512, 3)
        assert rois is not None and rois.shape == (4, 512, 512)
        assert len(names) == 4
