"""ctypes bindings for the native C++ data plane (csrc/tdrn_io.cpp).

Gives the input pipeline a native JPEG decode + bilinear resize + mean-subtract
path with a C++ thread pool (replacing the reference's DataLoader worker
processes, SURVEY.md §3.1). Falls back silently to the cv2 path when the
shared library has not been built (``make -C csrc``).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "..", "..", "csrc", "libtdrn_io.so")
_lib: Optional[ctypes.CDLL] = None


def _load(build_if_missing: bool = True) -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    path = os.path.abspath(_LIB_PATH)
    if not os.path.exists(path) and build_if_missing:
        try:
            subprocess.run(
                ["make", "-C", os.path.dirname(path)], check=True, capture_output=True
            )
        except Exception:
            return None
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    lib.tdrn_decode_resize.restype = ctypes.c_int
    lib.tdrn_decode_resize.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.tdrn_decode_resize_batch.restype = ctypes.c_int
    lib.tdrn_decode_resize_batch.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
    ]
    lib.tdrn_jpeg_dims.restype = ctypes.c_int
    lib.tdrn_jpeg_dims.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _mean_ptr(mean):
    if mean is None:
        return None
    arr = np.ascontiguousarray(np.asarray(mean, np.float32))
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), arr  # keep arr alive


def decode_resize(path: str, size: int, mean=None) -> np.ndarray:
    """Decode one JPEG -> (size, size, 3) float32 RGB (mean-subtracted if given)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native tdrn_io library unavailable")
    out = np.empty((size, size, 3), np.float32)
    mp = _mean_ptr(mean)
    rc = lib.tdrn_decode_resize(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), size,
        mp[0] if mp else None,
    )
    if rc != 0:
        raise IOError(f"native decode failed for {path}")
    return out


def decode_resize_batch(
    paths: Sequence[str], size: int, mean=None, num_threads: int = 8
) -> np.ndarray:
    """Decode a batch of JPEGs in the native thread pool -> (N, size, size, 3)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native tdrn_io library unavailable")
    n = len(paths)
    blob = b""
    offsets = np.empty(n, np.int64)
    for i, p in enumerate(paths):
        offsets[i] = len(blob)
        blob += p.encode() + b"\0"
    out = np.empty((n, size, size, 3), np.float32)
    mp = _mean_ptr(mean)
    failures = lib.tdrn_decode_resize_batch(
        blob,
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        size,
        mp[0] if mp else None,
        num_threads,
    )
    if failures:
        raise IOError(f"native batch decode: {failures}/{n} failures")
    return out


def jpeg_dims(path: str):
    lib = _load()
    if lib is None:
        raise RuntimeError("native tdrn_io library unavailable")
    h = ctypes.c_int()
    w = ctypes.c_int()
    if lib.tdrn_jpeg_dims(path.encode(), ctypes.byref(h), ctypes.byref(w)) != 0:
        raise IOError(f"cannot read {path}")
    return h.value, w.value
