"""Native (C++) runtime components with ctypes bindings.

`faceloader`: multithreaded JPEG decode + resize (see faceloader.cpp).  Built
on first use with g++ (no pip deps); falls back cleanly to the cv2 path when a
toolchain or libjpeg is unavailable (data/meld.py handles the fallback).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "faceloader.cpp")
_LIB = os.path.join(_HERE, "_build", "libfaceloader.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    os.makedirs(os.path.dirname(_LIB), exist_ok=True)
    cmd = ["g++", "-O3", "-march=native", "-fPIC", "-shared", "-std=c++17",
           _SRC, "-o", _LIB, "-ljpeg", "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def load_library() -> Optional[ctypes.CDLL]:
    """Build (once) and load the native library; None if unavailable."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_LIB) or (
                os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _build_failed = True
            return None
        lib.decode_resize_batch.restype = ctypes.c_int
        lib.decode_resize_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int]
        _lib = lib
        return _lib


def decode_resize_batch(paths: List[Optional[str]], target: int,
                        out: Optional[np.ndarray] = None,
                        num_threads: int = 0) -> Optional[np.ndarray]:
    """Decode JPEGs into a (N, target, target, 3) BGR uint8 array using the
    native thread pool.  Returns None when the native library is unavailable
    (caller falls back to cv2).  Failed/None paths yield zeroed slots."""
    lib = load_library()
    if lib is None:
        return None
    n = len(paths)
    if out is None:
        out = np.zeros((n, target, target, 3), np.uint8)
    assert out.shape == (n, target, target, 3) and out.dtype == np.uint8
    assert out.flags["C_CONTIGUOUS"]
    arr = (ctypes.c_char_p * n)(
        *[p.encode() if p else None for p in paths])
    lib.decode_resize_batch(
        arr, n, target, out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        num_threads)
    return out
