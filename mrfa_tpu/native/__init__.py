"""ctypes bindings for the native host data path (decode/resize/batch).

Auto-builds the shared library on first import if a compiler is available;
falls back cleanly (`available() == False`) otherwise, in which case the data
pipeline uses imageio. See imagecodec.cpp for the C ABI.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libmrfa_imagecodec.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _DIR, "-s"],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return os.path.exists(_SO)
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_SO)
        lib.mrfa_decode_resize.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.mrfa_decode_resize.restype = ctypes.c_int
        lib.mrfa_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.mrfa_decode_batch.restype = ctypes.c_int
        lib.mrfa_image_size.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.mrfa_image_size.restype = ctypes.c_int
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def image_size(path: str):
    """(h, w) from the file header without decoding, or None."""
    lib = _load()
    if lib is None:
        return None
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.mrfa_image_size(path.encode(), ctypes.byref(h), ctypes.byref(w))
    return (h.value, w.value) if rc == 0 else None


def decode_resize(path: str, dst_h: int, dst_w: int) -> Optional[np.ndarray]:
    """Decode one PNG/JPEG to (dst_h, dst_w, 3) float32 in [0, 1]."""
    lib = _load()
    if lib is None:
        return None
    out = np.empty((dst_h, dst_w, 3), dtype=np.float32)
    rc = lib.mrfa_decode_resize(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        dst_h, dst_w,
    )
    return out if rc == 0 else None


def decode_batch(
    paths: List[str], dst_h: int, dst_w: int, n_threads: int = 4
) -> Optional[np.ndarray]:
    """Decode many frames into an (N, dst_h, dst_w, 3) float32 batch."""
    lib = _load()
    if lib is None:
        return None
    n = len(paths)
    out = np.empty((n, dst_h, dst_w, 3), dtype=np.float32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    failed = lib.mrfa_decode_batch(
        arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        dst_h, dst_w, n_threads,
    )
    return out if failed == 0 else None
