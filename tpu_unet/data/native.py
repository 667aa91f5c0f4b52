"""ctypes bindings for the native data-loader core (native/loader_core.cpp).

Lazy-builds ``libloader_core.so`` with g++ on first use; every entry point has a
pure-Python/PIL fallback so the framework works without a toolchain. The native
resize runs without the GIL across a thread pool — the host half of the input
pipeline (the reference's second-hottest path, SURVEY.md §3.1).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_EXPECTED_VERSION = 2  # bump together with tu_version() in loader_core.cpp

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "loader_core.cpp")
# Versioned filename: a stale build from an older wrapper is simply ignored
# (dlopen caches by path, so rebuilding in place can't refresh a live process).
_LIB_PATH = os.path.join(_REPO_ROOT, "native",
                         f"libloader_core.v{_EXPECTED_VERSION}.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False

_MODES = {"nearest": 0, "bilinear": 1, "area": 2}


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-o", _LIB_PATH, _SRC, "-lpthread"],
            check=True, capture_output=True, timeout=300)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError, subprocess.TimeoutExpired):
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) and os.path.exists(_SRC):
            _build()
        if os.path.exists(_LIB_PATH):
            try:
                lib = ctypes.CDLL(_LIB_PATH)
                lib.tu_resize_u8.argtypes = [
                    ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                    ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                    ctypes.c_int]
                lib.tu_resize_u8_batch.argtypes = [
                    ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                    ctypes.c_int, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
                    ctypes.c_int, ctypes.c_int]
                lib.tu_fill_polygon.argtypes = [
                    ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
                    ctypes.c_void_p, ctypes.c_int, ctypes.c_ubyte]
                lib.tu_version.restype = ctypes.c_int
                _lib = lib
            except OSError:
                _lib = None
        return _lib


def available() -> bool:
    return get_lib() is not None


def resize_u8(src: np.ndarray, out_hw, mode: str = "area",
              n_threads: int = 0) -> np.ndarray:
    """Resize (H,W,C) or (H,W) uint8 array natively; falls back to PIL.

    Modes: 'area' (PIL-BILINEAR-parity triangle filter — alias-free downscale,
    classic bilinear on upscale; the production default), 'bilinear' (4-tap),
    'nearest' (label maps).
    """
    lib = get_lib()
    dh, dw = out_hw
    squeeze = src.ndim == 2
    if squeeze:
        src = src[..., None]
    sh, sw, c = src.shape
    if (sh, sw) == (dh, dw):
        out = src.copy()
        return out[..., 0] if squeeze else out
    if lib is None:
        from PIL import Image
        resample = Image.NEAREST if mode == "nearest" else Image.BILINEAR
        if c == 1:
            im = Image.fromarray(src[..., 0])
            out = np.asarray(im.resize((dw, dh), resample), np.uint8)[..., None]
        else:
            im = Image.fromarray(src)
            out = np.asarray(im.resize((dw, dh), resample), np.uint8)
        return out[..., 0] if squeeze else out
    src = np.ascontiguousarray(src)
    out = np.empty((dh, dw, c), np.uint8)
    if n_threads <= 0:
        n_threads = min(8, os.cpu_count() or 1)
    lib.tu_resize_u8(src.ctypes.data, sh, sw, c, out.ctypes.data, dh, dw,
                     _MODES[mode], n_threads)
    return out[..., 0] if squeeze else out


def fill_polygon(mask: np.ndarray, points_xy, value: int = 1) -> None:
    """Even-odd scanline fill into a (H,W) uint8 mask, in place.

    Near-PIL semantics (used as an optional fast path; the Gear dataset keeps PIL
    as the parity-exact default since rasterized masks are memoized anyway).
    """
    lib = get_lib()
    h, w = mask.shape
    pts = np.asarray(points_xy, np.float32).reshape(-1)
    if lib is None:
        from PIL import Image, ImageDraw
        im = Image.fromarray(mask)
        ImageDraw.Draw(im).polygon([tuple(p) for p in np.asarray(points_xy)], fill=value)
        mask[:] = np.asarray(im)
        return
    assert mask.flags["C_CONTIGUOUS"]
    lib.tu_fill_polygon(mask.ctypes.data, h, w, pts.ctypes.data, len(pts) // 2, value)
