"""BPR matrix factorization trained with vectorized minibatch SGD on TPU.

Replaces implicit's Hogwild Cython/CUDA BPR (consumed by the reference at
rectools/models/implicit_bpr.py:222-226). Same objective — maximize
sigmoid(<p_u, q_i> + b_i - <p_u, q_j> - b_j) over sampled (u, pos, neg)
triplets with L2 regularization — but updates are synchronous minibatches of
scatter-adds, which vectorizes onto the VPU/MXU instead of lock-free threads.

Negative verification (implicit's `verify_negative_samples`) is a device-side
per-user binary search over the CSR row of sorted item indices: accidental
positives get their update masked to zero.
"""

import math
import typing as tp
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from scipy import sparse


class BPRParams(tp.NamedTuple):
    user_emb: jax.Array  # (n_users, f)
    item_emb: jax.Array  # (n_items, f)
    item_bias: jax.Array  # (n_items,)


def _csr_contains(indices: jax.Array, indptr: jax.Array, u: jax.Array, j: jax.Array) -> jax.Array:
    """Vectorized membership test: is item j among user u's CSR row indices?

    Fixed-depth binary search within [indptr[u], indptr[u+1]) — int32-safe for
    any catalog size (a flat user*n_items+item key would overflow int32).
    Requires CSR with sorted indices per row.
    """
    lo = indptr[u]
    hi = indptr[u + 1]
    empty = lo >= hi

    def body(_, carry):
        lo, hi = carry
        mid = (lo + hi) // 2
        v = indices[jnp.clip(mid, 0, indices.shape[0] - 1)]
        go_right = v < j
        new_lo = jnp.where((lo < hi) & go_right, mid + 1, lo)
        new_hi = jnp.where((lo < hi) & ~go_right, mid, hi)
        return new_lo, new_hi

    depth = max(1, int(math.ceil(math.log2(max(int(indices.shape[0]), 2)))) + 1)
    lo, hi = jax.lax.fori_loop(0, depth, body, (lo, hi))
    found = (~empty) & (lo < indptr[u + 1]) & (indices[jnp.clip(lo, 0, indices.shape[0] - 1)] == j)
    return found


@partial(jax.jit, static_argnames=("n_items", "verify_negatives", "batch_size"), donate_argnums=(0,))
def _bpr_epoch(
    params: BPRParams,
    key: jax.Array,
    users: jax.Array,  # (nnz,) int32 — one entry per interaction
    items: jax.Array,  # (nnz,) int32
    csr_indices: jax.Array,  # (nnz,) int32 sorted-per-row item ids
    csr_indptr: jax.Array,  # (n_users+1,) int32
    n_items: int,
    lr: jax.Array,
    reg: jax.Array,
    verify_negatives: bool,
    batch_size: int = 8192,
) -> tp.Tuple[BPRParams, jax.Array]:
    """One epoch: iterate all interactions in shuffled order, batched SGD."""
    nnz = users.shape[0]
    n_batches = max(1, nnz // batch_size)
    perm_key, neg_key = jax.random.split(key)
    perm = jax.random.permutation(perm_key, nnz)
    usable = n_batches * batch_size
    # Wrap around if nnz is not a batch multiple (a few resampled duplicates).
    perm = jnp.concatenate([perm, perm[: max(0, usable - nnz)]])[:usable]
    u_ep = users[perm].reshape(n_batches, batch_size)
    i_ep = items[perm].reshape(n_batches, batch_size)
    negs = jax.random.randint(neg_key, (n_batches, batch_size), 0, n_items, dtype=jnp.int32)

    def step(carry: tp.Tuple[BPRParams, jax.Array], batch: tp.Tuple[jax.Array, jax.Array, jax.Array]):
        p, correct = carry
        u, i, j = batch
        pu = p.user_emb[u]
        qi = p.item_emb[i]
        qj = p.item_emb[j]
        x_uij = jnp.sum(pu * (qi - qj), axis=1) + p.item_bias[i] - p.item_bias[j]
        z = jax.nn.sigmoid(-x_uij)  # gradient weight

        if verify_negatives:
            is_false_neg = _csr_contains(csr_indices, csr_indptr, u, j)
            w = jnp.where(is_false_neg, 0.0, 1.0)
        else:
            w = jnp.ones_like(z)
        zw = (z * w)[:, None]

        du = zw * (qi - qj) - reg * pu * w[:, None]
        dqi = zw * pu - reg * qi * w[:, None]
        dqj = -zw * pu - reg * qj * w[:, None]
        dbi = (z - reg * p.item_bias[i]) * w
        dbj = (-z - reg * p.item_bias[j]) * w

        new = BPRParams(
            user_emb=p.user_emb.at[u].add(lr * du),
            item_emb=p.item_emb.at[i].add(lr * dqi).at[j].add(lr * dqj),
            item_bias=p.item_bias.at[i].add(lr * dbi).at[j].add(lr * dbj),
        )
        correct = correct + jnp.sum((x_uij > 0) * w)
        return (new, correct), None

    (params, correct), _ = jax.lax.scan(step, (params, jnp.float32(0.0)), (u_ep, i_ep, negs))
    return params, correct


def bpr_fit(
    ui_csr: sparse.csr_matrix,
    factors: int,
    learning_rate: float,
    regularization: float,
    iterations: int,
    random_state: tp.Optional[int],
    verify_negative_samples: bool = True,
    batch_size: int = 8192,
    initial: tp.Optional[tp.Tuple[np.ndarray, np.ndarray, np.ndarray]] = None,
) -> tp.Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Train BPR; returns (user_emb, item_emb, item_bias)."""
    n_users, n_items = ui_csr.shape
    ui_csr = ui_csr.tocsr()
    ui_csr.sort_indices()
    coo = ui_csr.tocoo()
    users = jnp.asarray(coo.row.astype(np.int32))
    items = jnp.asarray(coo.col.astype(np.int32))
    csr_indices = jnp.asarray(ui_csr.indices.astype(np.int32))
    csr_indptr = jnp.asarray(ui_csr.indptr.astype(np.int32))

    rng = np.random.RandomState(random_state)
    if initial is not None:
        ue, ie, ib = initial
        params = BPRParams(jnp.asarray(ue), jnp.asarray(ie), jnp.asarray(ib))
    else:
        # Same init scale convention as implicit: normal / factors.
        params = BPRParams(
            user_emb=jnp.asarray(rng.normal(size=(n_users, factors)).astype(np.float32) / factors),
            item_emb=jnp.asarray(rng.normal(size=(n_items, factors)).astype(np.float32) / factors),
            item_bias=jnp.zeros((n_items,), dtype=jnp.float32),
        )
    # Small datasets: one batch must not exceed the interaction count, or the
    # epoch's wrap-around padding (built from a single permutation copy)
    # cannot fill it.
    batch_size = max(1, min(batch_size, int(users.shape[0])))

    key = jax.random.PRNGKey(random_state if random_state is not None else 0)
    for _ in range(iterations):
        key, sub = jax.random.split(key)
        params, _ = _bpr_epoch(
            params,
            sub,
            users,
            items,
            csr_indices,
            csr_indptr,
            n_items,
            jnp.float32(learning_rate),
            jnp.float32(regularization),
            verify_negative_samples,
            batch_size,
        )
    return (
        np.asarray(params.user_emb),
        np.asarray(params.item_emb),
        np.asarray(params.item_bias),
    )
