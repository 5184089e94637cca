"""Native (C++) host ops with ctypes bindings and numpy fallbacks.

Builds ``host_ops.cpp`` into a shared library on first use (g++ is in the
image); every function silently falls back to numpy when the toolchain or
library is unavailable, so the native layer is an accelerator, never a
dependency.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_DIR = os.path.dirname(__file__)
_SO = os.path.join(_DIR, "libhostops.so")
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def build_native(force: bool = False) -> Optional[str]:
    src = os.path.join(_DIR, "host_ops.cpp")
    if os.path.isfile(_SO) and not force and (
            os.path.getmtime(_SO) >= os.path.getmtime(src)):
        return _SO
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", src, "-o", _SO],
            check=True, capture_output=True)
        return _SO
    except Exception as e:  # pragma: no cover
        logger.warning("native build failed (%s); using numpy fallbacks", e)
        return None


def _lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is None and not _TRIED:
        _TRIED = True
        path = build_native()
        if path:
            lib = ctypes.CDLL(path)
            lib.rgb2id.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
            lib.pq_intersections.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
            lib.pq_intersections.restype = ctypes.c_int64
            lib.mask_iou.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                     ctypes.c_int64]
            lib.mask_iou.restype = ctypes.c_double
            lib.bincount_u32.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                         ctypes.c_void_p, ctypes.c_int64]
            _LIB = lib
    return _LIB


def rgb2id(rgb: np.ndarray) -> np.ndarray:
    """Panoptic png RGB [H, W, 3] -> uint32 id map (native when available)."""
    lib = _lib()
    rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
    if lib is None:
        c = rgb.astype(np.uint32)
        return c[..., 0] + 256 * c[..., 1] + 65536 * c[..., 2]
    out = np.empty(rgb.shape[:2], np.uint32)
    lib.rgb2id(rgb.ctypes.data, out.ctypes.data, out.size)
    return out


def pq_intersections(gt: np.ndarray, pred: np.ndarray
                     ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Distinct (gt_id, pred_id) pairs and their intersection areas."""
    gt = np.ascontiguousarray(gt, dtype=np.uint32)
    pred = np.ascontiguousarray(pred, dtype=np.uint32)
    lib = _lib()
    if lib is None:
        combined = gt.astype(np.uint64) * (2 ** 32) + pred.astype(np.uint64)
        pairs, counts = np.unique(combined, return_counts=True)
        return (pairs >> 32).astype(np.uint32), (pairs & 0xFFFFFFFF).astype(np.uint32), counts
    cap = 4096
    while True:
        out_pairs = np.empty(cap, np.uint64)
        out_counts = np.empty(cap, np.uint64)
        m = lib.pq_intersections(gt.ctypes.data, pred.ctypes.data, gt.size,
                                 out_pairs.ctypes.data, out_counts.ctypes.data,
                                 cap)
        if m <= cap:
            pairs = out_pairs[:m]
            return ((pairs >> np.uint64(32)).astype(np.uint32),
                    (pairs & np.uint64(0xFFFFFFFF)).astype(np.uint32),
                    out_counts[:m])
        cap = int(m) + 64


def mask_iou(a: np.ndarray, b: np.ndarray) -> float:
    lib = _lib()
    a = np.ascontiguousarray(a, dtype=np.uint8)
    b = np.ascontiguousarray(b, dtype=np.uint8)
    if lib is None:
        inter = np.logical_and(a, b).sum()
        union = np.logical_or(a, b).sum()
        return float(inter / union) if union else 0.0
    return float(lib.mask_iou(a.ctypes.data, b.ctypes.data, a.size))
