"""Native runtime: fast point-cloud text parsing (C++ / OpenMP, ctypes).

Replaces the process-pool role of the reference's
``DataLoader(num_workers=10)`` (`eval.py:90`) with an in-process native
parser: ~50-100x faster than np.loadtxt per file, parallel across files.
Builds lazily on first use with the system compiler; falls back to
numpy if no toolchain is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "pointcloud_io.cpp")
_LIB = os.path.join(os.path.dirname(__file__), "_pointcloud_io.so")
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> Optional[ctypes.CDLL]:
    global _build_failed
    if _build_failed:
        return None
    if not os.path.exists(_LIB) or (os.path.getmtime(_LIB)
                                    < os.path.getmtime(_SRC)):
        for cc in ("g++", "c++", "clang++"):
            try:
                subprocess.run(
                    [cc, "-O3", "-fopenmp", "-shared", "-fPIC",
                     _SRC, "-o", _LIB],
                    check=True, capture_output=True)
                break
            except (subprocess.CalledProcessError, FileNotFoundError):
                continue
        else:
            _build_failed = True
            return None
    lib = ctypes.CDLL(_LIB)
    lib.pcio_load_txt.restype = ctypes.c_int64
    lib.pcio_load_txt.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64]
    lib.pcio_load_txt_batch.restype = ctypes.c_int64
    lib.pcio_load_txt_batch.argtypes = [
        ctypes.c_char_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64)]
    lib.pcio_normalize_batch.restype = None
    lib.pcio_normalize_batch.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64]
    return lib


def available() -> bool:
    global _lib
    if _lib is None:
        _lib = _build()
    return _lib is not None


class NativeParser:
    """Drop-in txt parser for the data loaders.

    ``load_txt(path)`` mimics ``np.loadtxt(path, delimiter=',')`` for the
    dense numeric tables of the point-cloud datasets.
    """

    def __init__(self, max_rows: int = 20000, n_cols: int = 6):
        if not available():
            raise RuntimeError("native parser unavailable (no compiler)")
        self.max_rows = max_rows
        self.n_cols = n_cols

    def load_txt(self, path: str, n_cols: Optional[int] = None
                 ) -> np.ndarray:
        cols = n_cols or self.n_cols
        buf = np.empty((self.max_rows, cols), np.float32)
        rows = _lib.pcio_load_txt(
            path.encode(), buf.ctypes.data_as(
                ctypes.POINTER(ctypes.c_float)),
            self.max_rows, cols, cols)
        if rows < 0:
            raise IOError(f"native parse failed ({rows}) for {path}")
        return buf[:rows].copy()

    def load_batch(self, paths: List[str], rows_per_file: int,
                   n_cols: Optional[int] = None,
                   normalize: bool = False
                   ) -> Tuple[np.ndarray, np.ndarray]:
        """Parse many files in parallel into [F, rows, cols] (+row counts)."""
        cols = n_cols or self.n_cols
        n = len(paths)
        out = np.zeros((n, rows_per_file, cols), np.float32)
        counts = np.zeros(n, np.int64)
        blob = b"".join(p.encode() + b"\0" for p in paths)
        ok = _lib.pcio_load_txt_batch(
            blob, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            rows_per_file, cols,
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        if ok != n:
            bad = [paths[i] for i in range(n) if counts[i] < 0]
            raise IOError(f"native parse failed for {bad[:3]}...")
        if normalize:
            _lib.pcio_normalize_batch(
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                n, rows_per_file, cols)
        return out, counts
