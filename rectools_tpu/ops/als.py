"""Batched ALS least-squares half-steps on TPU.

Replaces implicit's Cython/OpenMP + CUDA solvers (consumed by the reference at
rectools/models/implicit_als.py:584-675). Math follows the implicit-library
convention the reference wraps:

  per subject u with observed objects i and confidences c_ui (csr values,
  already multiplied by alpha):
    A_u = Y^T Y + lambda*I + sum_i (|c_ui| - 1) y_i y_i^T
    b_u = sum_i max(c_ui, 0) y_i
    x_u = A_u^{-1} b_u

All per-subject systems in a batch solve together: a gather of object factors,
two einsum contractions (MXU) and a batched Cholesky solve. Ragged per-subject
lists are bucketed by length (subjects processed in degree order) so jit
specializations stay few and padding waste stays low.
"""

import typing as tp
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from scipy import sparse

from ..parallel.mesh import DATA_AXIS, MODEL_AXIS

_HI = jax.lax.Precision.HIGHEST


def _next_pow2(n: int, minimum: int = 8) -> int:
    return max(minimum, 1 << max(0, (n - 1).bit_length()))


@partial(jax.jit, static_argnames=())
def _solve_batch(
    y: jax.Array,  # (n_objects, f)
    yty_reg: jax.Array,  # (f, f) = Y^T Y + reg*I
    idx: jax.Array,  # (B, L) int32, padded entries point anywhere (conf=0)
    conf: jax.Array,  # (B, L) f32, 0 = padding
) -> jax.Array:
    yb = y[idx]  # (B, L, f) gather
    valid = conf != 0.0
    w_a = jnp.where(valid, jnp.abs(conf) - 1.0, 0.0)
    w_b = jnp.maximum(conf, 0.0)
    a = yty_reg[None, :, :] + jnp.einsum(
        "bl,blf,blg->bfg", w_a, yb, yb, precision=_HI
    )
    b = jnp.einsum("bl,blf->bf", w_b, yb, precision=_HI)
    # Batched SPD solve via Cholesky.
    chol = jax.lax.linalg.cholesky(a)
    x = jax.lax.linalg.triangular_solve(chol, b[..., None], left_side=True, lower=True)
    x = jax.lax.linalg.triangular_solve(chol, x, left_side=True, lower=True, transpose_a=True)
    return x[..., 0]


@jax.jit
def _yty_reg(y: jax.Array, reg: jax.Array) -> jax.Array:
    f = y.shape[1]
    return jnp.dot(y.T, y, preferred_element_type=jnp.float32, precision=_HI) + reg * jnp.eye(
        f, dtype=jnp.float32
    )


@jax.jit
def _solve_and_scatter(
    y: jax.Array,  # (n_objects, f)
    yty_reg: jax.Array,  # (f, f)
    idx: jax.Array,  # (B_pad, L_pad) int32
    conf: jax.Array,  # (B_pad, L_pad) f32, 0 = padding
    rows: jax.Array,  # (B_pad,) int32 destination rows; padding points at the dump row
    out: jax.Array,  # (n_subjects + 1, f) — last row is the dump row
) -> jax.Array:
    x = _solve_batch(y, yty_reg, idx, conf)
    return out.at[rows].set(x)


def _bucket_spans(
    sorted_lengths: np.ndarray, batch_size: int, area_budget: int
) -> tp.List[tp.Tuple[int, int]]:
    """Split degree-ASCENDING rows into (start, stop) bucket spans such that
    each bucket's padded area b_pad * l_pad stays under ``area_budget``
    (at least 1 row per bucket). Without the cap, skewed degrees explode
    the padding: at KION scale the top item has ~500k interactions, so a
    2048-row bucket padded to its pow2 degree is a 2^30-row gather
    (observed 550 GB allocation attempt)."""
    spans = []
    i = 0
    n = len(sorted_lengths)
    while i < n:
        j = i + 1
        while j < n and (j - i) < batch_size:
            l_pad = _next_pow2(int(sorted_lengths[j]), minimum=8)
            if _next_pow2(j - i + 1, minimum=8) * l_pad > area_budget:
                break
            j += 1
        spans.append((i, j))
        i = j
    return spans


def _pack_degree_buckets(
    xy_csr: sparse.csr_matrix, batch_size: int, dump_row: int, area_budget: int = 1 << 22
) -> tp.List[tp.Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Degree-sorted (rows, idx, conf) batches, padded to pow2 shapes.

    Computed ONCE per fit: the sparsity pattern never changes across ALS
    iterations, so the ragged-to-padded packing (and its H2D upload) must not
    sit inside the iteration loop. Zero-degree subjects are left out — the
    half-step starts from zeros, which is their exact solution (b = 0).
    Padding rows scatter into ``dump_row``. Bucket sizes adapt so the
    padded area stays bounded under degree skew (`_bucket_spans`).
    """
    n_subjects = xy_csr.shape[0]
    indptr = xy_csr.indptr
    lengths = (indptr[1:] - indptr[:-1]).astype(np.int64)
    order = np.argsort(lengths, kind="stable")
    order = order[lengths[order] > 0]

    buckets = []
    for start, stop in _bucket_spans(lengths[order], batch_size, area_budget):
        rows = order[start:stop]
        b = len(rows)
        l_pad = _next_pow2(int(lengths[rows].max()), minimum=8)
        b_pad = _next_pow2(b, minimum=8)
        idx = np.zeros((b_pad, l_pad), dtype=np.int32)
        conf = np.zeros((b_pad, l_pad), dtype=np.float32)
        row_lens = lengths[rows]
        total = int(row_lens.sum())
        row_pos = np.repeat(np.arange(b), row_lens)
        col_pos = np.arange(total) - np.repeat(np.cumsum(row_lens) - row_lens, row_lens)
        src = np.repeat(indptr[rows].astype(np.int64), row_lens) + col_pos
        idx[row_pos, col_pos] = xy_csr.indices[src]
        conf[row_pos, col_pos] = xy_csr.data[src]
        rows_padded = np.full(b_pad, dump_row, dtype=np.int32)
        rows_padded[:b] = rows
        buckets.append((rows_padded, idx, conf))
    return buckets


def _als_fit_resident(
    ui_csr: sparse.csr_matrix,
    user_factors: np.ndarray,
    item_factors: np.ndarray,
    regularization: float,
    iterations: int,
    user_reset_cols: tp.Optional[tp.Tuple[int, int]],
    user_reset_values: tp.Optional[np.ndarray],
    item_reset_cols: tp.Optional[tp.Tuple[int, int]],
    item_reset_values: tp.Optional[np.ndarray],
    batch_size: int = 2048,
) -> tp.Tuple[np.ndarray, np.ndarray]:
    """Single-device ALS with the whole iteration loop device-resident.

    The padded CSR buckets upload once and every half-step is a chain of
    async solve+scatter dispatches — no host sync until the final factor
    fetch. vs the per-batch materializing loop this removed ~6 tunnel
    round trips and a full repack per iteration (measured: ML-1M-scale
    iALS fit 53.7 s -> see ARCHITECTURE.md).
    """
    n_users, n_items = ui_csr.shape
    f = item_factors.shape[1]
    iu_csr = ui_csr.T.tocsr(copy=False)

    user_buckets = [
        tuple(jnp.asarray(a) for a in bucket)
        for bucket in _pack_degree_buckets(ui_csr, batch_size, dump_row=n_users)
    ]
    item_buckets = [
        tuple(jnp.asarray(a) for a in bucket)
        for bucket in _pack_degree_buckets(iu_csr, batch_size, dump_row=n_items)
    ]
    reg = jnp.float32(regularization)
    u_dev = jnp.asarray(user_factors, dtype=jnp.float32)
    i_dev = jnp.asarray(item_factors, dtype=jnp.float32)
    u_reset = None if user_reset_values is None else jnp.asarray(user_reset_values, jnp.float32)
    i_reset = None if item_reset_values is None else jnp.asarray(item_reset_values, jnp.float32)

    def half_step(y_dev, buckets, n_subjects):
        yty = _yty_reg(y_dev, reg)
        out = jnp.zeros((n_subjects + 1, f), dtype=jnp.float32)
        for rows, idx, conf in buckets:
            out = _solve_and_scatter(y_dev, yty, idx, conf, rows, out)
        return out[:n_subjects]

    for _ in range(iterations):
        u_dev = half_step(i_dev, user_buckets, n_users)
        if user_reset_cols is not None:
            s, e = user_reset_cols
            u_dev = u_dev.at[:, s:e].set(u_reset)
        i_dev = half_step(u_dev, item_buckets, n_items)
        if item_reset_cols is not None:
            s, e = item_reset_cols
            i_dev = i_dev.at[:, s:e].set(i_reset)
    return np.asarray(u_dev), np.asarray(i_dev)


def als_half_step(
    xy_csr: sparse.csr_matrix,  # (n_subjects, n_objects) confidences
    y: np.ndarray,  # (n_objects, f) fixed side
    regularization: float,
    batch_size: int = 2048,
    out: tp.Optional[np.ndarray] = None,
    mesh: tp.Optional[Mesh] = None,
) -> np.ndarray:
    """One ALS half-step: re-solve all subject factors against fixed `y`.

    Subjects with no interactions get zero factors (matching the A=YtY+regI,
    b=0 limit only up to the reg term: implicit leaves them at b=0 solution
    which is exactly zero).

    With a ``mesh``, the Gram Y^T Y is computed with `y` row-sharded over all
    mesh devices (XLA inserts the psum all-reduce over ICI — the SURVEY §2.9
    "all-to-all gram-matrix exchange" plan), and the per-subject solve batches
    shard over the ``data`` axis so wall-clock scales with data-parallel
    width. Each system is independent, so results match single-device exactly.
    """
    n_subjects, n_objects = xy_csr.shape
    f = y.shape[1]
    if mesh is not None:
        # Gram over row shards: contraction over the sharded dim -> psum.
        # Zero-pad rows so the table splits evenly (zero rows add nothing).
        n_dev = mesh.devices.size
        n_rows_pad = ((n_objects + n_dev - 1) // n_dev) * n_dev
        y_padded = np.zeros((n_rows_pad, f), dtype=np.float32)
        y_padded[:n_objects] = y
        y_rows_sharded = jax.device_put(
            jnp.asarray(y_padded), NamedSharding(mesh, P((DATA_AXIS, MODEL_AXIS), None))
        )
        yty = _yty_reg(y_rows_sharded, jnp.float32(regularization))
        # Solve side gathers arbitrary rows of y: keep it replicated; batch
        # rows carry the parallelism instead.
        y_dev = jax.device_put(jnp.asarray(y, dtype=jnp.float32), NamedSharding(mesh, P()))
        yty = jax.device_put(yty, NamedSharding(mesh, P()))
        batch_sharding = NamedSharding(mesh, P(DATA_AXIS, None))
        n_data = mesh.shape[DATA_AXIS]
    else:
        y_dev = jax.device_put(jnp.asarray(y, dtype=jnp.float32))
        yty = _yty_reg(y_dev, jnp.float32(regularization))
        batch_sharding = None
        n_data = 1

    indptr = xy_csr.indptr
    lengths = (indptr[1:] - indptr[:-1]).astype(np.int64)
    order = np.argsort(lengths, kind="stable")

    result = out if out is not None else np.zeros((n_subjects, f), dtype=np.float32)

    # area-capped spans: fixed-size buckets padded to the tallest row explode
    # under degree skew (see _bucket_spans)
    for start, stop in _bucket_spans(lengths[order], batch_size, 1 << 22):
        rows = order[start:stop]
        b = len(rows)
        max_len = int(lengths[rows].max()) if b else 0
        if max_len == 0:
            result[rows] = 0.0
            continue
        l_pad = _next_pow2(max_len, minimum=8)
        b_pad = _next_pow2(b, minimum=8)
        if b_pad % n_data:
            b_pad = ((b_pad + n_data - 1) // n_data) * n_data
        idx = np.zeros((b_pad, l_pad), dtype=np.int32)
        conf = np.zeros((b_pad, l_pad), dtype=np.float32)
        row_lens = lengths[rows]
        total = int(row_lens.sum())
        row_pos = np.repeat(np.arange(b), row_lens)
        col_pos = np.arange(total) - np.repeat(np.cumsum(row_lens) - row_lens, row_lens)
        src = np.repeat(indptr[rows].astype(np.int64), row_lens) + col_pos
        idx[row_pos, col_pos] = xy_csr.indices[src]
        conf[row_pos, col_pos] = xy_csr.data[src]
        idx_dev, conf_dev = jnp.asarray(idx), jnp.asarray(conf)
        if batch_sharding is not None:
            idx_dev = jax.device_put(idx_dev, batch_sharding)
            conf_dev = jax.device_put(conf_dev, batch_sharding)
        x = _solve_batch(y_dev, yty, idx_dev, conf_dev)
        result[rows] = np.asarray(x[:b])
    return result


def als_fit(
    ui_csr: sparse.csr_matrix,
    user_factors: np.ndarray,
    item_factors: np.ndarray,
    regularization: float,
    iterations: int,
    user_reset_cols: tp.Optional[tp.Tuple[int, int]] = None,
    user_reset_values: tp.Optional[np.ndarray] = None,
    item_reset_cols: tp.Optional[tp.Tuple[int, int]] = None,
    item_reset_values: tp.Optional[np.ndarray] = None,
    mesh: tp.Optional[Mesh] = None,
) -> tp.Tuple[np.ndarray, np.ndarray]:
    """Full ALS loop with optional explicit-feature column resetting.

    The reset hooks replicate the reference's combined feature training
    (implicit_als.py:596-628): after each user half-step the user explicit
    columns are overwritten back to the raw features, after each item
    half-step the item explicit columns likewise.

    `ui_csr` values must already include the alpha confidence scaling.
    """
    if mesh is None:
        return _als_fit_resident(
            ui_csr,
            user_factors,
            item_factors,
            regularization,
            iterations,
            user_reset_cols,
            user_reset_values,
            item_reset_cols,
            item_reset_values,
        )
    iu_csr = ui_csr.T.tocsr(copy=False)
    for _ in range(iterations):
        user_factors = als_half_step(ui_csr, item_factors, regularization, out=user_factors, mesh=mesh)
        if user_reset_cols is not None:
            s, e = user_reset_cols
            user_factors[:, s:e] = user_reset_values
        item_factors = als_half_step(iu_csr, user_factors, regularization, out=item_factors, mesh=mesh)
        if item_reset_cols is not None:
            s, e = item_reset_cols
            item_factors[:, s:e] = item_reset_values
    return user_factors, item_factors
