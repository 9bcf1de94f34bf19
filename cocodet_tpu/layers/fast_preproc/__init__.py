"""ctypes binding for the native letterbox preproc (builds on first import).

See src/preproc.cpp. Falls back silently if the toolchain is unavailable —
callers check ``available()`` and use the cv2 path otherwise.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "src", "preproc.cpp")
_SO = os.path.join(_DIR, "_preproc.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build(native_arch: bool = True) -> bool:
    arch = ["-march=native"] if native_arch else []
    try:
        subprocess.run(
            ["g++", "-O3", *arch, "-shared", "-fPIC",
             "-std=c++17", "-pthread", _SRC, "-o", _SO],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _try_load_and_probe() -> Optional[ctypes.CDLL]:
    try:
        lib = ctypes.CDLL(_SO)
        lib.letterbox_u8.restype = ctypes.c_float
        lib.letterbox_u8.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.c_int,
        ]
        # tiny end-to-end probe: 2x2 -> 4x4 letterbox must return ratio 2.0
        img = np.zeros((2, 2, 3), np.uint8)
        out = np.empty((4, 4, 3), np.float32)
        r = lib.letterbox_u8(
            img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), 2, 2,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), 4, 4,
            ctypes.c_float(114.0), 1)
        if abs(float(r) - 2.0) > 1e-5:
            return None
        return lib
    except Exception:
        return None


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    stale = (not os.path.exists(_SO)
             or os.path.getmtime(_SO) < os.path.getmtime(_SRC))
    if stale and not _build():
        return None
    lib = _try_load_and_probe()
    if lib is None and not stale:
        # existing .so may come from a different host/ISA — rebuild fresh
        try:
            os.remove(_SO)
        except OSError:
            pass
        if _build() or _build(native_arch=False):
            lib = _try_load_and_probe()
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def letterbox(img: np.ndarray, out_hw: Tuple[int, int], fill: float = 114.0,
              num_threads: int = 1) -> Tuple[np.ndarray, float]:
    """Native letterbox: HWC uint8 -> (out_h, out_w, 3) float32, ratio."""
    lib = _load()
    assert lib is not None, "native preproc unavailable"
    img = np.ascontiguousarray(img, np.uint8)
    h, w = img.shape[:2]
    out = np.empty((out_hw[0], out_hw[1], 3), np.float32)
    r = lib.letterbox_u8(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_hw[0], out_hw[1], fill, num_threads)
    return out, float(r)
