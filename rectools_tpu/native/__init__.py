"""Native host-ops runtime: lazily compiled C++ (OpenMP) kernels for the
TPU feeding pipeline's host-side hot loops, bound via ctypes.

``lib()`` returns the loaded library or None when no C++ toolchain is
available — callers keep a vectorized-numpy fallback, so the framework works
everywhere and gets the native path on production hosts.
"""

import ctypes
import hashlib
import os
import subprocess
import tempfile
import threading
import typing as tp
from pathlib import Path

import numpy as np

_SRC = Path(__file__).parent / "hostops.cpp"
_LOCK = threading.Lock()
_LIB: tp.Any = None
_TRIED = False


def _compile() -> tp.Optional[ctypes.CDLL]:
    src_text = _SRC.read_bytes()
    digest = hashlib.sha256(src_text).hexdigest()[:16]
    cache_dir = Path(os.environ.get("RECTOOLS_TPU_CACHE", Path(tempfile.gettempdir()) / "rectools_tpu_native"))
    cache_dir.mkdir(parents=True, exist_ok=True)
    so_path = cache_dir / f"hostops_{digest}.so"
    if not so_path.exists():
        tmp_path = so_path.with_suffix(f".{os.getpid()}.tmp")
        cmd = [
            "g++", "-O3", "-shared", "-fPIC", "-fopenmp", "-std=c++17",
            "-o", str(tmp_path), str(_SRC),
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        except (OSError, subprocess.SubprocessError):
            return None
        os.replace(tmp_path, so_path)
    try:
        cdll = ctypes.CDLL(str(so_path))
    except OSError:  # pragma: no cover
        return None

    i64p = ctypes.POINTER(ctypes.c_int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    i64 = ctypes.c_int64
    cdll.scatter_left_padded_i64.argtypes = [i64p, i64p, i64p, i64, i64, i64p]
    cdll.scatter_left_padded_f32.argtypes = [f32p, i64p, i64p, i64, i64, f32p]
    cdll.csr_rows_padded_i32.argtypes = [i32p, i64p, i64p, i64, i64, i32p]
    cdll.sasrec_train_collate.argtypes = [i64p, f32p, i64p, i64p, i64, i64, i64p, i64p, f32p]
    return cdll


def lib() -> tp.Any:
    """The compiled host-ops library, or None if unavailable."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    with _LOCK:
        if not _TRIED:
            if os.environ.get("RECTOOLS_TPU_NO_NATIVE"):
                _LIB = None
            else:
                _LIB = _compile()
            _TRIED = True
    return _LIB


def _ptr(arr: np.ndarray, ctype: tp.Any) -> tp.Any:
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def scatter_left_padded_native(
    values: np.ndarray, starts: np.ndarray, lengths: np.ndarray, out_len: int, dtype: tp.Any, fill: tp.Any = 0
) -> tp.Optional[np.ndarray]:
    """Native ragged->dense left-pad; None if the library is unavailable or
    the dtype unsupported."""
    cdll = lib()
    if cdll is None:
        return None
    n = len(starts)
    starts64 = np.ascontiguousarray(starts, dtype=np.int64)
    lengths64 = np.ascontiguousarray(lengths, dtype=np.int64)
    np_dtype = np.dtype(dtype)
    if np_dtype == np.int64:
        values_c = np.ascontiguousarray(values, dtype=np.int64)
        # np.zeros is calloc-backed: the kernel then only touches real data
        out = np.zeros((n, out_len), dtype=np.int64) if fill == 0 else np.full((n, out_len), fill, dtype=np.int64)
        cdll.scatter_left_padded_i64(
            _ptr(values_c, ctypes.c_int64), _ptr(starts64, ctypes.c_int64), _ptr(lengths64, ctypes.c_int64),
            n, out_len, _ptr(out, ctypes.c_int64),
        )
        return out
    if np_dtype == np.float32:
        values_c = np.ascontiguousarray(values, dtype=np.float32)
        out = np.zeros((n, out_len), dtype=np.float32) if fill == 0 else np.full((n, out_len), fill, dtype=np.float32)
        cdll.scatter_left_padded_f32(
            _ptr(values_c, ctypes.c_float), _ptr(starts64, ctypes.c_int64), _ptr(lengths64, ctypes.c_int64),
            n, out_len, _ptr(out, ctypes.c_float),
        )
        return out
    return None


def csr_rows_padded_native(
    indices: np.ndarray, indptr: np.ndarray, rows: np.ndarray, max_len: int, fill: int
) -> tp.Optional[np.ndarray]:
    """Native per-row CSR column extraction; None if unavailable."""
    cdll = lib()
    if cdll is None:
        return None
    n = len(rows)
    indices32 = np.ascontiguousarray(indices, dtype=np.int32)
    indptr64 = np.ascontiguousarray(indptr, dtype=np.int64)
    rows64 = np.ascontiguousarray(rows, dtype=np.int64)
    out = np.full((n, max_len), fill, dtype=np.int32)
    cdll.csr_rows_padded_i32(
        _ptr(indices32, ctypes.c_int32), _ptr(indptr64, ctypes.c_int64), _ptr(rows64, ctypes.c_int64),
        n, max_len, _ptr(out, ctypes.c_int32),
    )
    return out


def sasrec_train_collate_native(
    items: np.ndarray, weights: np.ndarray, starts: np.ndarray, lengths: np.ndarray, out_len: int
) -> tp.Optional[tp.Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Native one-pass SASRec shifted-sequence collation; None if unavailable."""
    cdll = lib()
    if cdll is None:
        return None
    n = len(starts)
    items64 = np.ascontiguousarray(items, dtype=np.int64)
    weights32 = np.ascontiguousarray(weights, dtype=np.float32)
    starts64 = np.ascontiguousarray(starts, dtype=np.int64)
    lengths64 = np.ascontiguousarray(lengths, dtype=np.int64)
    x = np.zeros((n, out_len), dtype=np.int64)
    y = np.zeros((n, out_len), dtype=np.int64)
    yw = np.zeros((n, out_len), dtype=np.float32)
    cdll.sasrec_train_collate(
        _ptr(items64, ctypes.c_int64), _ptr(weights32, ctypes.c_float),
        _ptr(starts64, ctypes.c_int64), _ptr(lengths64, ctypes.c_int64),
        n, out_len,
        _ptr(x, ctypes.c_int64), _ptr(y, ctypes.c_int64), _ptr(yw, ctypes.c_float),
    )
    return x, y, yw
