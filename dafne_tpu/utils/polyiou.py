"""Host polygon-IoU dispatcher: native C++ extension with NumPy fallback.

The reference links a SWIG C++ `polyiou` module for evaluation and tile
merging (voc_eval.py:1, ResultMerge_multi_process.py:15); here the native
path is a ctypes-loaded shared library built on demand from
native/polyiou.cpp (g++ available in the image), with the vectorized
float64 NumPy implementation (utils/polyiou_np.py) as the always-available
fallback.  All entry points are batched so Python overhead stays per-call.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from typing import Optional

import numpy as np

from dafne_tpu.utils import polyiou_np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "native", "polyiou.cpp")
_BUILD_DIR = os.path.join(_REPO, "native", "build")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        with open(_SRC, "rb") as f:
            tag = hashlib.sha1(f.read()).hexdigest()[:12]
        so_path = os.path.join(_BUILD_DIR, f"libpolyiou_{tag}.so")
        if not os.path.exists(so_path):
            os.makedirs(_BUILD_DIR, exist_ok=True)
            tmp = so_path + f".tmp{os.getpid()}"
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", tmp],
                check=True,
                capture_output=True,
            )
            os.replace(tmp, so_path)
        lib = ctypes.CDLL(so_path)
        lib.polyiou_single.restype = ctypes.c_double
        lib.polyiou_single.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        lib.polyiou_pairs.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
        ]
        lib.polyiou_matrix.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p,
        ]
        lib.poly_nms.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_double,
            ctypes.c_void_p,
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def native_available() -> bool:
    return _build_and_load() is not None


def iou_poly(p, q) -> float:
    """Exact IoU of two quads (flat 8-sequences)."""
    lib = _build_and_load()
    p = np.ascontiguousarray(p, np.float64).reshape(8)
    q = np.ascontiguousarray(q, np.float64).reshape(8)
    if lib is None:
        return polyiou_np.iou_poly(p, q)
    return float(lib.polyiou_single(p.ctypes.data, q.ctypes.data))


def iou_poly_pairs(p, q) -> np.ndarray:
    """Elementwise IoU; p, q [N, 8] -> [N] float64."""
    p = np.ascontiguousarray(p, np.float64)
    q = np.ascontiguousarray(q, np.float64)
    lib = _build_and_load()
    if lib is None:
        return polyiou_np.iou_pairs(p, q)
    out = np.empty(len(p), np.float64)
    lib.polyiou_pairs(p.ctypes.data, q.ctypes.data, len(p), out.ctypes.data)
    return out


def iou_poly_matrix(p, q) -> np.ndarray:
    """Pairwise IoU; p [N, 8], q [M, 8] -> [N, M] float64."""
    p = np.ascontiguousarray(p, np.float64)
    q = np.ascontiguousarray(q, np.float64)
    lib = _build_and_load()
    if lib is None:
        return polyiou_np.iou_matrix(p, q)
    out = np.empty((len(p), len(q)), np.float64)
    lib.polyiou_matrix(
        p.ctypes.data, len(p), q.ctypes.data, len(q), out.ctypes.data
    )
    return out


def poly_nms(boxes, scores, thresh: float) -> np.ndarray:
    """Greedy rotated NMS (single class group); returns keep mask [N] bool.

    Host path used by cross-tile merging (py_cpu_nms_poly_fast equivalent,
    ResultMerge_multi_process.py:61-122)."""
    boxes = np.ascontiguousarray(boxes, np.float64)
    scores = np.ascontiguousarray(scores, np.float64)
    n = len(boxes)
    if n == 0:
        return np.zeros(0, bool)
    lib = _build_and_load()
    if lib is not None:
        keep = np.zeros(n, np.uint8)
        lib.poly_nms(
            boxes.ctypes.data, scores.ctypes.data, n, float(thresh),
            keep.ctypes.data,
        )
        return keep.astype(bool)
    # NumPy fallback: same greedy loop with hbb prefilter
    order = np.argsort(-scores, kind="stable")
    hb = np.stack(
        [boxes[:, 0::2].min(1), boxes[:, 1::2].min(1),
         boxes[:, 0::2].max(1), boxes[:, 1::2].max(1)], axis=1,
    )
    keep = np.zeros(n, bool)
    kept: list = []
    for i in order:
        ok = True
        for j in kept:
            if (hb[i, 0] > hb[j, 2] or hb[j, 0] > hb[i, 2]
                    or hb[i, 1] > hb[j, 3] or hb[j, 1] > hb[i, 3]):
                continue
            if polyiou_np.iou_poly(boxes[i], boxes[j]) > thresh:
                ok = False
                break
        if ok:
            kept.append(i)
            keep[i] = True
    return keep
