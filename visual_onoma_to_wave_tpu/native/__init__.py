"""Native (C) data-plane kernels, loaded via ctypes.

The shared library is compiled on demand from datakernels.c into a
per-user cache directory (no pybind11/pip dependency — plain C ABI).
`available()` gates every call site; the numpy fallback in data/dataset.py
is semantically identical.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import pathlib
import subprocess
import tempfile

import numpy as np

_SRC = pathlib.Path(__file__).with_name("datakernels.c")
_LIB = None
_TRIED = False


def _build() -> pathlib.Path | None:
    src = _SRC.read_bytes()
    tag = hashlib.sha256(src).hexdigest()[:16]
    cache = pathlib.Path(
        os.environ.get("VOW_NATIVE_CACHE",
                       os.path.join(tempfile.gettempdir(), "vow_native")))
    cache.mkdir(parents=True, exist_ok=True)
    so = cache / f"datakernels_{tag}.so"
    if so.exists():
        return so
    for cc in ("cc", "gcc", "g++", "clang"):
        try:
            subprocess.run(
                [cc, "-O2", "-shared", "-fPIC", str(_SRC), "-o", str(so)],
                check=True, capture_output=True, timeout=120)
            return so
        except (FileNotFoundError, subprocess.CalledProcessError,
                subprocess.TimeoutExpired):
            continue
    return None


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("VOW_DISABLE_NATIVE"):
        return None
    so = _build()
    if so is None:
        return None
    lib = ctypes.CDLL(str(so))
    for name in ("fill_cells_f32", "pad_cells_u8"):
        fn = getattr(lib, name)
        fn.restype = ctypes.c_int
        fn.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p,
        ]
    lib.dtw_path_f64.restype = ctypes.c_int64
    lib.dtw_path_f64.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
    ]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def fill_cells_f32(img: np.ndarray, widths: np.ndarray, cell_width: int,
                   out: np.ndarray) -> None:
    """img (H, W) uint8 C-contiguous; widths (n,) int64; out (n, H,
    cell_width) float32 C-contiguous — fully overwritten."""
    lib = _load()
    assert lib is not None
    img = np.ascontiguousarray(img, np.uint8)
    widths = np.ascontiguousarray(widths, np.int64)
    assert out.dtype == np.float32 and out.flags.c_contiguous
    h, w = img.shape
    n = widths.shape[0]
    assert out.shape == (n, h, cell_width)
    lib.fill_cells_f32(
        img.ctypes.data, h, w, widths.ctypes.data, n, cell_width,
        out.ctypes.data)


def pad_cells_u8(img: np.ndarray, widths: np.ndarray,
                 cell_width: int) -> np.ndarray:
    lib = _load()
    assert lib is not None
    img = np.ascontiguousarray(img, np.uint8)
    widths = np.ascontiguousarray(widths, np.int64)
    h, w = img.shape
    n = widths.shape[0]
    out = np.empty((n, h, cell_width), np.uint8)
    lib.pad_cells_u8(
        img.ctypes.data, h, w, widths.ctypes.data, n, cell_width,
        out.ctypes.data)
    return out


def dtw_path_f64(cost: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """DTW alignment path over a (T1, T2) float64 cost matrix — native DP
    (same moves and tie-breaking as metrics.dtw_path, which is the
    fallback). Returns (path_i, path_j) int64 index arrays."""
    lib = _load()
    assert lib is not None
    cost = np.ascontiguousarray(cost, np.float64)
    t1, t2 = cost.shape
    acc = np.empty((t1 + 1) * (t2 + 1), np.float64)
    pi = np.empty(t1 + t2, np.int64)
    pj = np.empty(t1 + t2, np.int64)
    k = lib.dtw_path_f64(cost.ctypes.data, t1, t2, acc.ctypes.data,
                         pi.ctypes.data, pj.ctypes.data)
    if k < 0:
        raise ValueError(f"degenerate DTW cost shape {cost.shape}")
    return pi[:k].copy(), pj[:k].copy()
