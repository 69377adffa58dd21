"""Golden tests for the native C++ image IO (native/image_ops.cpp) vs PIL."""

import io

import numpy as np
import pytest
from PIL import Image

from aadg_tpu.data import native_io as N

pytestmark = pytest.mark.skipif(not N.available(),
                                reason="native library not built")


class TestDecode:
    def test_png_rgb_roundtrip(self, rng):
        arr = rng.integers(0, 256, (37, 53, 3), dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        out = N.decode_png(buf.getvalue())
        np.testing.assert_array_equal(out, arr)

    def test_png_gray_roundtrip(self, rng):
        arr = rng.integers(0, 256, (16, 24), dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        out = N.decode_png(buf.getvalue())
        np.testing.assert_array_equal(out, arr)

    def test_png_palette(self, rng):
        arr = rng.integers(0, 256, (20, 20, 3), dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).convert("P", palette=Image.ADAPTIVE).save(
            buf, format="PNG")
        ref = np.asarray(Image.open(io.BytesIO(buf.getvalue()))
                         .convert("RGB"))
        out = N.decode_png(buf.getvalue())
        np.testing.assert_array_equal(out, ref)

    def test_ppm_p6(self, rng):
        arr = rng.integers(0, 256, (11, 13, 3), dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="PPM")
        out = N.decode_pnm(buf.getvalue())
        np.testing.assert_array_equal(out, arr)

    def test_pgm_p5(self, rng):
        arr = rng.integers(0, 256, (9, 14), dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="PPM")  # PIL writes P5
        out = N.decode_pnm(buf.getvalue())
        np.testing.assert_array_equal(out, arr)


class TestResize:
    @pytest.mark.parametrize("method,pil", [
        (N.LANCZOS, Image.LANCZOS),
        (N.BILINEAR, Image.BILINEAR),
    ])
    @pytest.mark.parametrize("size", [(256, 256), (64, 96)])
    def test_downscale_matches_pil(self, rng, method, pil, size):
        arr = rng.integers(0, 256, (347, 409, 3), dtype=np.uint8)
        ref = np.asarray(Image.fromarray(arr).resize(size[::-1], pil))
        out = N.resize(arr, size[0], size[1], method)
        diff = np.abs(out.astype(int) - ref.astype(int))
        # PIL uses fixed-point coefficients; allow off-by-one on a small
        # fraction of pixels
        assert np.mean(diff > 1) < 0.005
        assert diff.max() <= 3

    def test_upscale_matches_pil(self, rng):
        arr = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
        ref = np.asarray(Image.fromarray(arr).resize((256, 256),
                                                     Image.LANCZOS))
        out = N.resize(arr, 256, 256, N.LANCZOS)
        diff = np.abs(out.astype(int) - ref.astype(int))
        assert np.mean(diff > 1) < 0.005

    def test_nearest_matches_pil(self, rng):
        arr = rng.integers(0, 256, (100, 80), dtype=np.uint8)
        ref = np.asarray(Image.fromarray(arr).resize((40, 50),
                                                     Image.NEAREST))
        out = N.resize(arr, 50, 40, N.NEAREST)
        mismatch = (out != ref).mean()
        assert mismatch < 0.02  # PIL nearest rounds half-pixels differently


class TestLoadPath:
    def test_load_rgb_resized(self, rng, tmp_path):
        arr = rng.integers(0, 256, (300, 300, 3), dtype=np.uint8)
        p = tmp_path / "img.png"
        Image.fromarray(arr).save(p)
        out = N.load_rgb_resized(str(p), 128, 128, N.LANCZOS)
        ref = np.asarray(Image.open(p).convert("RGB").resize(
            (128, 128), Image.LANCZOS))
        diff = np.abs(out.astype(int) - ref.astype(int))
        assert np.mean(diff > 1) < 0.005
