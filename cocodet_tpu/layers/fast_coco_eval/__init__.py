"""ctypes binding for the native COCO eval kernels (builds on first import).

Role parity: ref yolox/layers/fast_coco_eval_api.py:19-151 + the pybind11
extension yolox/layers/csrc (SURVEY.md §2.5). The python fallback oracle is
cocodet_tpu/evaluators/coco_metric.match_image; tests assert equivalence.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "src", "cocoeval.cpp")
_SO = os.path.join(_DIR, "_cocoeval.so")

_lib: Optional[ctypes.CDLL] = None


def _build(native_arch: bool = True) -> bool:
    arch = ["-march=native"] if native_arch else []
    try:
        subprocess.run(
            ["g++", "-O3", *arch, "-shared", "-fPIC", "-std=c++17",
             _SRC, "-o", _SO],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    lib.match_image.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.accumulate_pr.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int, ctypes.c_longlong, ctypes.POINTER(ctypes.c_double),
        ctypes.c_int, ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double),
    ]
    return lib


def _try_load_and_probe() -> Optional[ctypes.CDLL]:
    """CDLL + a tiny end-to-end probe so symbol/ABI problems surface here
    (where callers can fall back to the python oracle), not mid-summarize."""
    try:
        lib = _bind(ctypes.CDLL(_SO))
        ious = np.asarray([[0.9]], np.float64)
        thrs = np.asarray([0.5], np.float64)
        dm = np.empty((1, 1), np.int64)
        di = np.empty((1, 1), np.uint8)
        z = np.zeros(1, np.uint8)
        lib.match_image(
            _ptr(ious, ctypes.c_double), 1, 1,
            _ptr(z, ctypes.c_uint8), _ptr(z, ctypes.c_uint8),
            _ptr(thrs, ctypes.c_double), 1,
            _ptr(dm, ctypes.c_int64), _ptr(di, ctypes.c_uint8))
        if int(dm[0, 0]) != 0:
            return None
        return lib
    except Exception:
        return None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    stale = (not os.path.exists(_SO)
             or os.path.getmtime(_SO) < os.path.getmtime(_SRC))
    if stale and not _build():
        return None
    lib = _try_load_and_probe()
    if lib is None and not stale:
        # existing .so may be from a different host/ISA — rebuild fresh
        try:
            os.remove(_SO)
        except OSError:
            pass
        if _build() or _build(native_arch=False):
            lib = _try_load_and_probe()
    _lib = lib
    return lib


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def match_image(ious: np.ndarray, gt_ignore: np.ndarray,
                gt_crowd: np.ndarray, iou_thrs: np.ndarray
                ) -> Tuple[np.ndarray, np.ndarray]:
    """Native greedy matching; same contract as coco_metric.match_image."""
    lib = _load()
    if lib is None:
        raise ImportError("native cocoeval unavailable")
    nd, ng = ious.shape
    nt = len(iou_thrs)
    ious = np.ascontiguousarray(ious, np.float64)
    g_ign = np.ascontiguousarray(gt_ignore, np.uint8)
    g_crd = np.ascontiguousarray(gt_crowd, np.uint8)
    thrs = np.ascontiguousarray(iou_thrs, np.float64)
    dt_match = np.empty((nt, nd), np.int64)
    dt_ignore = np.empty((nt, nd), np.uint8)
    lib.match_image(
        _ptr(ious, ctypes.c_double), nd, ng,
        _ptr(g_ign, ctypes.c_uint8), _ptr(g_crd, ctypes.c_uint8),
        _ptr(thrs, ctypes.c_double), nt,
        _ptr(dt_match, ctypes.c_int64), _ptr(dt_ignore, ctypes.c_uint8))
    return dt_match, dt_ignore.astype(bool)


def accumulate_pr(matched: np.ndarray, ignored: np.ndarray, npig: int,
                  recall_thrs: np.ndarray) -> Tuple[np.ndarray, float]:
    lib = _load()
    if lib is None:
        raise ImportError("native cocoeval unavailable")
    nd = len(matched)
    m = np.ascontiguousarray(matched, np.uint8)
    ig = np.ascontiguousarray(ignored, np.uint8)
    rt = np.ascontiguousarray(recall_thrs, np.float64)
    prec = np.empty(len(rt), np.float64)
    rec = ctypes.c_double(0.0)
    lib.accumulate_pr(
        _ptr(m, ctypes.c_uint8), _ptr(ig, ctypes.c_uint8), nd,
        int(npig), _ptr(rt, ctypes.c_double), len(rt),
        _ptr(prec, ctypes.c_double), ctypes.byref(rec))
    return prec, rec.value
