"""ctypes binding for the native COCO greedy matcher (native/cocoeval.cpp)
— the framework's COCOeval_opt equivalent (the reference evaluates through
detectron2's C++ COCOeval_opt, eval_all.py:18,516).

Builds on demand with `make -C native`; callers fall back to the numpy
matcher (eval/coco_eval._match_image) when no toolchain is available —
identical outputs, verified in tests/test_coco_eval.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    so = os.path.abspath(os.path.join(_NATIVE_DIR, "libcocoeval.so"))
    if not os.path.exists(so):
        try:
            subprocess.run(
                ["make", "-C", os.path.abspath(_NATIVE_DIR)],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    if not os.path.exists(so):
        return None
    lib = ctypes.CDLL(so)
    if not hasattr(lib, "coco_match_image_v2"):
        # stale pre-crowd library on disk: rebuild once, else fall back
        try:
            subprocess.run(
                ["make", "-C", os.path.abspath(_NATIVE_DIR), "-B"],
                check=True, capture_output=True, timeout=120,
            )
            lib = ctypes.CDLL(so)
        except Exception:
            return None
        if not hasattr(lib, "coco_match_image_v2"):
            return None
    lib.coco_match_image_v2.restype = None
    lib.coco_match_image_v2.argtypes = [
        ctypes.POINTER(ctypes.c_double),  # iou (n_det, n_gt)
        ctypes.c_int,  # n_det
        ctypes.c_int,  # n_gt
        ctypes.POINTER(ctypes.c_uint8),  # gt_ignore
        ctypes.POINTER(ctypes.c_uint8),  # gt_crowd
        ctypes.POINTER(ctypes.c_double),  # iou_thrs
        ctypes.c_int,  # n_thrs
        ctypes.POINTER(ctypes.c_int64),  # out matched
        ctypes.POINTER(ctypes.c_uint8),  # out ignored
    ]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def match_image(
    iou: np.ndarray, gt_ignore: np.ndarray, iou_thrs: np.ndarray,
    gt_crowd: np.ndarray = None,
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Native greedy matching for one image. iou: (N, M); gt_ignore: (M,)
    bool; iou_thrs: (T,); gt_crowd: (M,) bool iscrowd flags (crowd gts are
    re-matchable). Returns (det_matched (T, N) int64 gt-or-neg-1,
    det_ignore (T, N) bool) or None when the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    N, M = iou.shape
    T = len(iou_thrs)
    iou_c = np.ascontiguousarray(iou, dtype=np.float64)
    gig_c = np.ascontiguousarray(gt_ignore, dtype=np.uint8)
    if gt_crowd is None:
        gt_crowd = np.zeros(M, dtype=np.uint8)
    gcr_c = np.ascontiguousarray(gt_crowd, dtype=np.uint8)
    thr_c = np.ascontiguousarray(iou_thrs, dtype=np.float64)
    out_m = np.empty((T, N), dtype=np.int64)
    out_ig = np.empty((T, N), dtype=np.uint8)
    lib.coco_match_image_v2(
        iou_c.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        N, M,
        gig_c.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        gcr_c.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        thr_c.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        T,
        out_m.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        out_ig.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out_m, out_ig.astype(bool)
