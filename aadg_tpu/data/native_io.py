"""ctypes bindings for the native image IO library (native/image_ops.cpp).

Decode-once dataset loading (PNG/PPM -> RGB -> resize) without PIL on the
hot path; graceful PIL fallback if the shared library isn't built.
Build: ``make -C native`` (done automatically on first use when g++ is
available).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libaadg_image.so")

NEAREST, BILINEAR, LANCZOS = 0, 1, 2

_lib = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i32p = ctypes.POINTER(ctypes.c_int)
    lib.resize_u8.argtypes = [u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                              u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.decode_pnm.argtypes = [u8p, ctypes.c_int, i32p, i32p, i32p, u8p]
    lib.decode_png.argtypes = [u8p, ctypes.c_int, i32p, i32p, i32p, u8p]
    lib.decode_resize_rgb.argtypes = [u8p, ctypes.c_int, ctypes.c_int,
                                      ctypes.c_int, ctypes.c_int,
                                      ctypes.c_int, u8p]
    for fn in (lib.resize_u8, lib.decode_pnm, lib.decode_png,
               lib.decode_resize_rgb):
        fn.restype = ctypes.c_int
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _u8p(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def resize(img: np.ndarray, dh: int, dw: int,
           method: int = LANCZOS) -> np.ndarray:
    """PIL-compatible separable resample of an (H, W[, C]) uint8 array."""
    lib = _load()
    assert lib is not None, "native library unavailable"
    img = np.ascontiguousarray(img, dtype=np.uint8)
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    h, w, ch = img.shape
    out = np.empty((dh, dw, ch), np.uint8)
    rc = lib.resize_u8(_u8p(img), h, w, ch, _u8p(out), dh, dw, method)
    if rc != 0:
        raise ValueError(f"resize_u8 failed: {rc}")
    return out[..., 0] if squeeze else out


def _decode(buf: bytes, is_png: bool) -> np.ndarray:
    lib = _load()
    assert lib is not None, "native library unavailable"
    arr = np.frombuffer(buf, np.uint8)
    w = ctypes.c_int()
    h = ctypes.c_int()
    ch = ctypes.c_int()
    fn = lib.decode_png if is_png else lib.decode_pnm
    rc = fn(_u8p(arr), len(buf), ctypes.byref(w), ctypes.byref(h),
            ctypes.byref(ch), None)
    if rc != 0:
        raise ValueError(f"decode header failed: {rc}")
    out = np.empty((h.value, w.value, ch.value), np.uint8)
    rc = fn(_u8p(arr), len(buf), ctypes.byref(w), ctypes.byref(h),
            ctypes.byref(ch), _u8p(out))
    if rc != 0:
        raise ValueError(f"decode failed: {rc}")
    return out[..., 0] if ch.value == 1 else out


def decode_png(buf: bytes) -> np.ndarray:
    return _decode(buf, True)


def decode_pnm(buf: bytes) -> np.ndarray:
    return _decode(buf, False)


def load_rgb_resized(path: str, dh: int, dw: int,
                     method: int = LANCZOS) -> np.ndarray:
    """Decode a PNG/PPM file straight to resized RGB (the dataset-load hot
    path); raises on unsupported formats (caller falls back to PIL)."""
    lib = _load()
    assert lib is not None, "native library unavailable"
    with open(path, "rb") as f:
        buf = f.read()
    is_png = 1 if buf[:4] == b"\x89PNG" else 0
    if not is_png and buf[:1] != b"P":
        raise ValueError("unsupported format")
    arr = np.frombuffer(buf, np.uint8)
    out = np.empty((dh, dw, 3), np.uint8)
    rc = lib.decode_resize_rgb(_u8p(arr), len(buf), is_png, dh, dw,
                               method, _u8p(out))
    if rc != 0:
        raise ValueError(f"decode_resize_rgb failed: {rc}")
    return out
