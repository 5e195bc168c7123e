"""ctypes bindings for the native host-IO library (native/trase_io.cpp).

Compiled on demand with g++ (no pybind11 in this environment); every
entry point has a numpy fallback so the package works without a
toolchain. The native paths matter on the train loop's host side:
bit-unpacking SAM mask stacks and RGBA->float conversion are full-array
passes that numpy does in 3-4 sweeps and single-threaded."""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_lock = threading.Lock()
_lib = None
_tried = False

_SRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native", "trase_io.cpp")
_SO = os.path.join(os.path.dirname(_SRC), "libtrase_io.so")


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                     "-o", _SO, _SRC, "-lpthread"],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(_SO)
            lib.unpack_masks_padded.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p]
            lib.rgba_to_rgb_f32.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p]
            _lib = lib
        except Exception as e:  # noqa: BLE001 — no toolchain / bad cc
            print(f"[native] trase_io unavailable ({e}); numpy fallback")
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def unpack_masks_padded(packed: np.ndarray, n: int, h: int, w: int,
                        m_max: int) -> np.ndarray:
    """Bit-packed (np.packbits, MSB-first) -> (m_max, h, w) float32,
    rows >= n zeroed."""
    lib = _load()
    if lib is None:
        bits = np.unpackbits(packed, count=n * h * w)
        out = np.zeros((m_max, h, w), np.float32)
        k = min(n, m_max)
        out[:k] = bits.reshape(n, h, w)[:k]
        return out
    packed = np.ascontiguousarray(packed, np.uint8)
    out = np.empty((m_max, h, w), np.float32)
    lib.unpack_masks_padded(
        packed.ctypes.data, n, h, w, m_max, out.ctypes.data)
    return out


def rgba_to_rgb_f32(img: np.ndarray, bg=(0.0, 0.0, 0.0)) -> np.ndarray:
    """(H, W, 4|3) uint8 -> (3, H, W) float32 composited on bg."""
    has_alpha = img.shape[-1] == 4
    lib = _load()
    if lib is None:
        data = img.astype(np.float32) / 255.0
        bgn = np.asarray(bg, np.float32)
        if has_alpha:
            arr = data[..., :3] * data[..., 3:4] + bgn * (1 - data[..., 3:4])
        else:
            arr = data
        return np.clip(arr.transpose(2, 0, 1), 0, 1).astype(np.float32)
    img = np.ascontiguousarray(img, np.uint8)
    h, w = img.shape[:2]
    bgn = np.ascontiguousarray(np.asarray(bg, np.float32))
    out = np.empty((3, h, w), np.float32)
    lib.rgba_to_rgb_f32(img.ctypes.data, h, w, int(has_alpha),
                        bgn.ctypes.data, out.ctypes.data)
    return out
