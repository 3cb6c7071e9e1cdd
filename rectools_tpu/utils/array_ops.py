"""Fast set operations over id arrays.

Behavioral parity with reference: rectools/utils/array_set_ops.py:23-282.
Implementations are numpy-first (the host side of this framework avoids pandas
in hot paths; id bookkeeping happens on CPU, compute on TPU).
"""

import typing as tp

import numpy as np
import pandas as pd


def fast_isin(elements: np.ndarray, test_elements: np.ndarray) -> np.ndarray:
    """Effective version of `np.isin` that handles object dtypes via pandas Index."""
    if elements.dtype is np.dtype("O") or test_elements.dtype is np.dtype("O"):
        return pd.Index(elements).isin(test_elements)
    return np.isin(elements, test_elements)


def fast_isin_for_sorted_test_elements(
    elements: np.ndarray,
    sorted_test_elements: np.ndarray,
    invert: bool = False,
) -> np.ndarray:
    """Check membership against an already-sorted array via searchsorted.

    Reference semantics: rectools/utils/array_set_ops.py (searchsorted trick).
    """
    ss_result = np.searchsorted(sorted_test_elements, elements, side="left")
    ss_result[ss_result == sorted_test_elements.size] = 0
    isin = sorted_test_elements[ss_result] == elements
    if invert:
        return ~isin
    return isin


def _to_void_view(arr: np.ndarray) -> np.ndarray:
    arr = np.ascontiguousarray(arr)
    void_dt = np.dtype((np.void, arr.dtype.itemsize * arr.shape[1]))
    return arr.view(void_dt).ravel()


def fast_2d_int_unique(arr: np.ndarray) -> tp.Tuple[np.ndarray, np.ndarray]:
    """Unique rows of a 2d int array + inverse indices (void-view trick).

    Returns (unique_rows, inverse) such that unique_rows[inverse] == arr.
    """
    if arr.ndim != 2:
        raise ValueError("Array must be 2d")
    if arr.size == 0:
        return arr.copy(), np.array([], dtype=np.int64)
    voids = _to_void_view(arr)
    _, unq_idx, inverse = np.unique(voids, return_index=True, return_inverse=True)
    return arr[unq_idx], inverse.reshape(-1)


def isin_2d_int(ar1: np.ndarray, ar2: np.ndarray) -> np.ndarray:
    """Row-wise membership of 2d int array `ar1` in 2d int array `ar2`."""
    if ar1.ndim != 2 or ar2.ndim != 2:
        raise ValueError("Arrays must be 2d")
    if ar1.shape[1] != ar2.shape[1]:
        raise ValueError("Arrays must have equal number of columns")
    common = np.result_type(ar1.dtype, ar2.dtype)
    v1 = _to_void_view(ar1.astype(common, copy=False))
    v2 = _to_void_view(ar2.astype(common, copy=False))
    return np.isin(v1, v2)
