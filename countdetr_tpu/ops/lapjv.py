"""ctypes binding for the native exact LAP solver (native/lapjv.cpp).

Host-side only: parity oracle for the on-device auction matcher and offline
tooling. Builds on demand with `make -C native`; scipy fallback if no
toolchain is available.
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
    so = os.path.abspath(os.path.join(_NATIVE_DIR, "liblapjv.so"))
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
    lib.lapjv_solve.restype = ctypes.c_float
    lib.lapjv_solve.argtypes = [
        ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
    ]
    lib.lapjv_solve_batch.restype = None
    lib.lapjv_solve_batch.argtypes = [
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int32),
    ]
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def solve(cost: np.ndarray) -> Tuple[np.ndarray, float]:
    """Min-cost assignment of n rows to m >= n columns.
    Returns (col_for_row (n,), total_cost)."""
    lib = _load()
    cost = np.ascontiguousarray(cost, dtype=np.float32)
    n, m = cost.shape
    assert n <= m
    if lib is None:
        from scipy.optimize import linear_sum_assignment

        r, c = linear_sum_assignment(cost)
        out = np.zeros(n, dtype=np.int32)
        out[r] = c
        return out, float(cost[r, c].sum())
    out = np.zeros(n, dtype=np.int32)
    total = lib.lapjv_solve(
        n, m,
        cost.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out, float(total)


def solve_batch(cost: np.ndarray, valid: np.ndarray) -> np.ndarray:
    """Batched padded form mirroring ops/matching.batched_match:
    cost (B, Q, T), valid (B, T) -> tgt2query (B, T) int32."""
    lib = _load()
    cost = np.ascontiguousarray(cost, dtype=np.float32)
    valid = np.ascontiguousarray(valid, dtype=np.uint8)
    B, Q, T = cost.shape
    out = np.zeros((B, T), dtype=np.int32)
    if lib is None:
        from countdetr_tpu.ops.matching import scipy_match

        # scipy_match returns (tgt2query, matched); this contract is
        # tgt2query only
        return np.asarray(scipy_match(cost, valid.astype(bool))[0])
    lib.lapjv_solve_batch(
        B, Q, T,
        cost.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        valid.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out
