"""Native (C++) host runtime: threaded image decode + resize.

ctypes bindings to ``impreproc.cpp`` (built on demand with g++).  Used by
the data pipeline as a fast drop-in for the PIL path when available; falls
back silently to PIL otherwise.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

import numpy as np

__all__ = ["build", "load_library", "load_batch", "available"]

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "impreproc.cpp")
_LIB = os.path.join(_DIR, "libimpreproc.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def build(force: bool = False) -> str:
    """Compile the shared library (g++ -O3) if missing/stale."""
    if not force and os.path.exists(_LIB) and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
        return _LIB
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        _SRC, "-o", _LIB, "-ljpeg", "-lpng", "-lpthread",
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return _LIB


def load_library() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        path = build()
        lib = ctypes.CDLL(path)
        lib.spef_load_batch.restype = ctypes.c_int
        lib.spef_load_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.spef_load_image.restype = ctypes.c_int
        lib.spef_load_image.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return load_library() is not None


def load_batch(paths: List[str], out_h: int, out_w: int, n_threads: int = 0) -> np.ndarray:
    """Decode+resize ``paths`` into an (N, H, W, 3) uint8 batch natively."""
    lib = load_library()
    assert lib is not None, "native impreproc library unavailable"
    n = len(paths)
    out = np.empty((n, out_h, out_w, 3), np.uint8)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    ok = lib.spef_load_batch(
        c_paths, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out_h, out_w, n_threads,
    )
    if ok != n:
        raise IOError(f"native loader: {n - ok}/{n} images failed to decode")
    return out
