"""Exact brute-force top-k MIPS with implicit's call signature and neginf
sentinel contract (filtered entries come back with a score below
prev(-FLT_MAX) so callers can strip them)."""

import numpy as np
from scipy import sparse

_NEGINF = np.float32(-np.inf)


def topk(items, query, k, item_norms=None, filter_query_items=None, filter_items=None, num_threads=0):
    if sparse.issparse(query):  # CSR subjects (EASE / kNN user-history rows)
        query = np.asarray(query.todense())
    scores = np.asarray(query, dtype=np.float32) @ np.asarray(items, dtype=np.float32).T
    if item_norms is not None:
        scores = scores / np.asarray(item_norms, dtype=np.float32)[None, :]
    if filter_query_items is not None:
        coo = filter_query_items.tocoo()
        scores[coo.row, coo.col] = _NEGINF
    if filter_items is not None:
        scores[:, np.asarray(filter_items)] = _NEGINF
    order = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    return order.astype(np.int32), np.take_along_axis(scores, order, axis=1).astype(np.float32)
