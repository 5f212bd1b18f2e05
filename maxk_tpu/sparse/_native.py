"""ctypes binding to the C++ preprocessing library (csrc/meta.cpp).

Role of the reference's pybind11 extension layer (`cuda_kernel_bindings
.cpp` / `binding_v2.py`) for the host-side pieces: edge-tile scheduling
(warp4 analog) and CSR transpose. Auto-builds with `make` on first use;
callers fall back to the vectorized numpy path when unavailable
(the same graceful-degradation pattern as the reference's kernel
fallback chain, `maxk_spgemm_function.py:96-130`).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "csrc")
_LIB_PATH = os.path.join(_DIR, "libmaxk_native.so")
_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", _DIR, "-s"],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    i64, i32p, f32p, i64p = (
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int64),
    )
    lib.edge_tiles_count.restype = i64
    lib.edge_tiles_count.argtypes = [i64p, i64, i64, i64]
    lib.edge_tiles_fill.restype = None
    lib.edge_tiles_fill.argtypes = [
        i64p, i32p, f32p, i64, i64, i64, i32p, i32p, f32p, i32p,
    ]
    lib.csr_transpose.restype = None
    lib.csr_transpose.argtypes = [i64p, i32p, f32p, i64, i64, i64p, i32p, f32p]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def edge_tiles_native(
    indptr: np.ndarray,
    indices: np.ndarray,
    values: np.ndarray,
    row_block: int,
    edge_tile: int,
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]]:
    """(tile_block, cols, vals, localrow) or None if the lib is missing."""
    lib = _load()
    if lib is None:
        return None
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    indices = np.ascontiguousarray(indices, dtype=np.int32)
    values = np.ascontiguousarray(values, dtype=np.float32)
    v = indptr.shape[0] - 1
    nt = lib.edge_tiles_count(
        _ptr(indptr, ctypes.c_int64), v, row_block, edge_tile
    )
    tile_block = np.zeros(nt, dtype=np.int32)
    cols = np.zeros(nt * edge_tile, dtype=np.int32)
    vals = np.zeros(nt * edge_tile, dtype=np.float32)
    localrow = np.zeros(nt * edge_tile, dtype=np.int32)
    lib.edge_tiles_fill(
        _ptr(indptr, ctypes.c_int64),
        _ptr(indices, ctypes.c_int32),
        _ptr(values, ctypes.c_float),
        v,
        row_block,
        edge_tile,
        _ptr(tile_block, ctypes.c_int32),
        _ptr(cols, ctypes.c_int32),
        _ptr(vals, ctypes.c_float),
        _ptr(localrow, ctypes.c_int32),
    )
    return (
        tile_block,
        cols.reshape(nt, edge_tile),
        vals.reshape(nt, edge_tile),
        localrow.reshape(nt, edge_tile),
    )


def csr_transpose_native(
    indptr: np.ndarray, indices: np.ndarray, values: np.ndarray
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    lib = _load()
    if lib is None:
        return None
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    indices = np.ascontiguousarray(indices, dtype=np.int32)
    values = np.ascontiguousarray(values, dtype=np.float32)
    v = indptr.shape[0] - 1
    nnz = indices.shape[0]
    out_indptr = np.zeros(v + 1, dtype=np.int64)
    out_indices = np.zeros(nnz, dtype=np.int32)
    out_values = np.zeros(nnz, dtype=np.float32)
    lib.csr_transpose(
        _ptr(indptr, ctypes.c_int64),
        _ptr(indices, ctypes.c_int32),
        _ptr(values, ctypes.c_float),
        v,
        nnz,
        _ptr(out_indptr, ctypes.c_int64),
        _ptr(out_indices, ctypes.c_int32),
        _ptr(out_values, ctypes.c_float),
    )
    return out_indptr, out_indices, out_values
