"""Streaming logsumexp over an item table (Pallas) — the fused-CE core.

The full-catalog softmax loss is the compute- AND traffic-dominant part of a
recsys train step: logits are (B*L, n_items). The jnp chunked path
(losses.fused_softmax_loss) already avoids materializing the full tensor,
but each (B*L, chunk) partial still round-trips HBM in forward and again in
the checkpointed backward. Here the whole flash-style reduction runs
in-kernel: item chunks stream through VMEM against a resident session block,
the running (max, sumexp) carry lives in the revisited output block, and the
partial-logit tiles never exist in HBM at all. Backward recomputes the
probability tiles the same way, emitting d(sessions) (chunk-streamed) and
d(items) (session-block-streamed) without any (M, chunk) HBM tensor.

Grid layouts exploit the TPU's sequential grid: the reduction axis is the
fastest grid dimension, so the accumulator block is revisited consecutively
and stays in VMEM between steps.
"""

import typing as tp
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

DEFAULT_BLOCK_M = 256
DEFAULT_CHUNK_N = 1024
_NEG_BIG = -1e30


def _lse_fwd_kernel(s_ref, items_ref, m_ref, l_ref, *, chunk_n: int, n_valid: int):
    """(m-block i, item-chunk j) program: flash-style running logsumexp."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref[...], _NEG_BIG)
        l_ref[...] = jnp.zeros_like(l_ref[...])

    logits = jax.lax.dot_general(
        s_ref[...], items_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (block_m, chunk_n)
    col_ids = j * chunk_n + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    logits = jnp.where(col_ids < n_valid, logits, _NEG_BIG)

    m_old = m_ref[0, 0]
    m_new = jnp.maximum(m_old, jnp.max(logits, axis=1))
    l_ref[0, 0] = l_ref[0, 0] * jnp.exp(m_old - m_new) + jnp.sum(jnp.exp(logits - m_new[:, None]), axis=1)
    m_ref[0, 0] = m_new


def _dsessions_kernel(s_ref, items_ref, lse_ref, dlse_ref, ds_ref, *, chunk_n: int, n_valid: int):
    """ds = dlse * softmax @ items, accumulated over item chunks."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        ds_ref[...] = jnp.zeros_like(ds_ref[...])

    logits = jax.lax.dot_general(
        s_ref[...], items_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    col_ids = j * chunk_n + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    p = jnp.where(col_ids < n_valid, jnp.exp(logits - lse_ref[0, 0][:, None]), 0.0)
    weighted = p * dlse_ref[0, 0][:, None]
    # accumulator stays f32 across chunks (bf16 += would round each step)
    ds_ref[...] += jnp.dot(weighted, items_ref[...], preferred_element_type=jnp.float32)


def _ditems_kernel(s_ref, items_ref, lse_ref, dlse_ref, di_ref, *, chunk_n: int, n_valid: int):
    """d(items) = softmax^T @ (dlse * sessions), accumulated over m-blocks."""
    j = pl.program_id(0)  # item-chunk index (slow axis here)
    i = pl.program_id(1)  # m-block index (fast axis -> consecutive revisits)

    @pl.when(i == 0)
    def _init():
        di_ref[...] = jnp.zeros_like(di_ref[...])

    logits = jax.lax.dot_general(
        s_ref[...], items_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (block_m, chunk_n)
    col_ids = j * chunk_n + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    p = jnp.where(col_ids < n_valid, jnp.exp(logits - lse_ref[0, 0][:, None]), 0.0)
    weighted_s = s_ref[...].astype(jnp.float32) * dlse_ref[0, 0][:, None]
    di_ref[...] += jax.lax.dot_general(
        p, weighted_s, dimension_numbers=(((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _pad_rows(x: jnp.ndarray, multiple: int) -> jnp.ndarray:
    rows = x.shape[0]
    target = ((rows + multiple - 1) // multiple) * multiple
    if target == rows:
        return x
    return jnp.pad(x, ((0, target - rows),) + ((0, 0),) * (x.ndim - 1))


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def streaming_lse(
    sessions: jnp.ndarray,  # (M, D)
    items: jnp.ndarray,  # (N, D)
    block_m: int = DEFAULT_BLOCK_M,
    chunk_n: int = DEFAULT_CHUNK_N,
    interpret: bool = False,
) -> jnp.ndarray:
    """logsumexp_j(sessions @ items.T)[m] as one fused Pallas reduction."""
    lse, _ = _streaming_lse_fwd_impl(sessions, items, block_m, chunk_n, interpret)
    return lse


def _streaming_lse_fwd_impl(sessions, items, block_m, chunk_n, interpret):
    m_rows, d = sessions.shape
    n_valid = items.shape[0]
    s_pad = _pad_rows(sessions, block_m)
    items_pad = _pad_rows(items, chunk_n)
    n_m = s_pad.shape[0] // block_m
    n_chunks = items_pad.shape[0] // chunk_n

    m_run, l_run = pl.pallas_call(
        partial(_lse_fwd_kernel, chunk_n=chunk_n, n_valid=n_valid),
        grid=(n_m, n_chunks),
        in_specs=[
            pl.BlockSpec((block_m, d), lambda i, j: (i, 0)),
            pl.BlockSpec((chunk_n, d), lambda i, j: (j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_m), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, block_m), lambda i, j: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_m, 1, block_m), jnp.float32),
            jax.ShapeDtypeStruct((n_m, 1, block_m), jnp.float32),
        ],
        interpret=interpret,
    )(s_pad, items_pad)
    lse = (m_run + jnp.log(l_run)).reshape(-1)[:m_rows]
    return lse, (s_pad, items_pad, lse)


def _streaming_lse_fwd(sessions, items, block_m, chunk_n, interpret):
    lse, (s_pad, items_pad, _) = _streaming_lse_fwd_impl(sessions, items, block_m, chunk_n, interpret)
    return lse, (sessions, items, lse)


def _streaming_lse_bwd(block_m, chunk_n, interpret, residuals, dlse):
    sessions, items, lse = residuals
    m_rows, d = sessions.shape
    n_valid = items.shape[0]
    s_pad = _pad_rows(sessions, block_m)
    items_pad = _pad_rows(items, chunk_n)
    n_m = s_pad.shape[0] // block_m
    n_chunks = items_pad.shape[0] // chunk_n
    # padded rows: lse=+big makes their probabilities vanish
    lse_pad = jnp.pad(lse, (0, s_pad.shape[0] - m_rows), constant_values=-_NEG_BIG).reshape(n_m, 1, block_m)
    dlse_pad = jnp.pad(dlse.astype(jnp.float32), (0, s_pad.shape[0] - m_rows)).reshape(n_m, 1, block_m)

    ds = pl.pallas_call(
        partial(_dsessions_kernel, chunk_n=chunk_n, n_valid=n_valid),
        grid=(n_m, n_chunks),
        in_specs=[
            pl.BlockSpec((block_m, d), lambda i, j: (i, 0)),
            pl.BlockSpec((chunk_n, d), lambda i, j: (j, 0)),
            pl.BlockSpec((1, 1, block_m), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, block_m), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((block_m, d), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct(s_pad.shape, jnp.float32),
        interpret=interpret,
    )(s_pad, items_pad, lse_pad, dlse_pad)

    di = pl.pallas_call(
        partial(_ditems_kernel, chunk_n=chunk_n, n_valid=n_valid),
        grid=(n_chunks, n_m),
        in_specs=[
            pl.BlockSpec((block_m, d), lambda j, i: (i, 0)),
            pl.BlockSpec((chunk_n, d), lambda j, i: (j, 0)),
            pl.BlockSpec((1, 1, block_m), lambda j, i: (i, 0, 0)),
            pl.BlockSpec((1, 1, block_m), lambda j, i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((chunk_n, d), lambda j, i: (j, 0)),
        out_shape=jax.ShapeDtypeStruct(items_pad.shape, jnp.float32),
        interpret=interpret,
    )(s_pad, items_pad, lse_pad, dlse_pad)

    return ds[:m_rows].astype(sessions.dtype), di[:n_valid].astype(items.dtype)


streaming_lse.defvjp(_streaming_lse_fwd, _streaming_lse_bwd)


def reference_lse(sessions: jnp.ndarray, items: jnp.ndarray) -> jnp.ndarray:
    """XLA-math twin for CPU/testing."""
    logits = jnp.einsum("md,nd->mn", sessions, items, preferred_element_type=jnp.float32)
    return jax.nn.logsumexp(logits, axis=-1)
