import numpy as np
from scipy import sparse


def _filter_items_from_sparse_matrix(items, query_items):
    """Keep only `items` columns of a CSR matrix (signature parity; the
    reference uses it to align seen-item filters with whitelists)."""
    mask = np.zeros(query_items.shape[1], dtype=bool)
    mask[np.asarray(items)] = True
    filtered = query_items.multiply(sparse.csr_matrix(mask.astype(np.float32)))
    return filtered.tocsr()[:, np.asarray(items)]
