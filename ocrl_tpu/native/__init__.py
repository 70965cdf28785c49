"""ctypes bindings for the native C++ rasterizer.

Auto-builds ocrl_tpu/native/librasterizer.so with g++ on first use if missing
(scripts/build_native.sh does the same).  ``available()`` gates callers so the
PIL fallback keeps everything working without a toolchain.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_DIR = Path(__file__).resolve().parent
_LIB_PATH = _DIR / "librasterizer.so"
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB_PATH.exists():
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                 "-o", str(_LIB_PATH), str(_DIR / "rasterizer.cpp")],
                check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    lib.render_polygons.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),   # out
        ctypes.c_int, ctypes.c_int, ctypes.c_int,  # W, H, aa
        ctypes.POINTER(ctypes.c_double),  # poly_xy
        ctypes.POINTER(ctypes.c_int),     # poly_sizes
        ctypes.POINTER(ctypes.c_uint8),   # colors
        ctypes.c_int,                     # n_polys
        ctypes.POINTER(ctypes.c_uint8),   # bg (nullable)
    ]
    lib.render_polygons.restype = None
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def render_polygons(W: int, H: int, aa: int, polys: list[np.ndarray],
                    colors: np.ndarray, bg: Optional[np.ndarray] = None) -> np.ndarray:
    """polys: list of [n_i, 2] float64 vertex arrays in supersampled pixel
    coords; colors: [n_polys, 3] uint8.  Returns [H, W, 3] uint8."""
    lib = _load()
    assert lib is not None, "native rasterizer unavailable"
    out = np.empty((H, W, 3), np.uint8)
    if polys:
        xy = np.ascontiguousarray(np.concatenate([p.reshape(-1, 2) for p in polys]),
                                  np.float64)
        sizes = np.asarray([len(p) for p in polys], np.int32)
    else:
        xy = np.zeros((1, 2), np.float64)
        sizes = np.zeros((0,), np.int32)
    colors = np.ascontiguousarray(colors, np.uint8)
    bg_ptr = None
    if bg is not None:
        bg = np.ascontiguousarray(bg, np.uint8)
        bg_ptr = bg.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    lib.render_polygons(
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        W, H, aa,
        xy.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        colors.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        len(polys),
        bg_ptr,
    )
    return out
