"""Split helpers.

Behavioral parity with reference rectools/model_selection/utils.py:21-75.
"""

import numpy as np
from scipy import sparse

from ..utils.array_ops import isin_2d_int


def get_not_seen_mask(
    train_users: np.ndarray,
    train_items: np.ndarray,
    test_users: np.ndarray,
    test_items: np.ndarray,
) -> np.ndarray:
    """Mask of test (user, item) pairs not present in train, via the sparse
    elementwise-multiply trick (reference utils.py:21-75)."""
    if train_users.size != train_items.size:
        raise ValueError("Lengths of `train_users` and `train_items` must be the same")
    if test_users.size != test_items.size:
        raise ValueError("Lengths of `test_users` and `test_items` must be the same")

    if train_users.size == 0:
        return np.ones(test_users.size, dtype=bool)
    if test_users.size == 0:
        return np.array([], dtype=bool)

    n_users = max(train_users.max(), test_users.max()) + 1
    n_items = max(train_items.max(), test_items.max()) + 1
    cls = sparse.csr_matrix if n_users < n_items else sparse.csc_matrix

    def make_matrix(users: np.ndarray, items: np.ndarray) -> sparse.spmatrix:
        return cls((np.ones(len(users), dtype=bool), (users, items)), shape=(n_users, n_items))

    already_seen_coo = make_matrix(test_users, test_items).multiply(make_matrix(train_users, train_items)).tocoo()
    already_seen_arr = np.vstack((already_seen_coo.row, already_seen_coo.col)).T.astype(test_users.dtype)
    test_ui = np.vstack((test_users, test_items)).T
    return ~isin_2d_int(test_ui, already_seen_arr)
