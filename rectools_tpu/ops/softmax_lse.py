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

Invalid item rows (padding to chunk multiples, or shard-local padding under
a row-sharded table) are excluded through an additive per-row bias input
(0 valid / -1e30 invalid) rather than a static count, which is what lets
:func:`sharded_streaming_lse` run the same kernel per shard under
``shard_map`` and combine the per-shard results with one tiny
logsumexp-merge collective — the tensor-parallel form of the loss.

Grid layouts exploit the TPU's sequential grid: the reduction axis is the
fastest grid dimension, so the accumulator block is revisited consecutively
and stays in VMEM between steps.
"""

import typing as tp
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

DEFAULT_BLOCK_M = 512
DEFAULT_CHUNK_N = 2048
_NEG_BIG = -1e30


def _lse_fwd_kernel(s_ref, items_ref, rowbias_ref, m_ref, l_ref):
    """(m-block i, item-chunk j) program: flash-style running logsumexp."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref[...], _NEG_BIG)
        l_ref[...] = jnp.zeros_like(l_ref[...])

    logits = jax.lax.dot_general(
        s_ref[...], items_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + rowbias_ref[0, 0][None, :]  # (block_m, chunk_n); invalid rows -> -1e30

    m_old = m_ref[0, 0]
    m_new = jnp.maximum(m_old, jnp.max(logits, axis=1))
    l_ref[0, 0] = l_ref[0, 0] * jnp.exp(m_old - m_new) + jnp.sum(jnp.exp(logits - m_new[:, None]), axis=1)
    m_ref[0, 0] = m_new


def _dsessions_kernel(s_ref, items_ref, rowbias_ref, lse_ref, dlse_ref, ds_ref):
    """ds = dlse * softmax @ items, accumulated over item chunks."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        ds_ref[...] = jnp.zeros_like(ds_ref[...])

    logits = jax.lax.dot_general(
        s_ref[...], items_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + rowbias_ref[0, 0][None, :]
    p = jnp.exp(logits - lse_ref[0, 0][:, None])
    weighted = p * dlse_ref[0, 0][:, None]
    # accumulator stays f32 across chunks (bf16 += would round each step);
    # under bf16 inputs the probability operand drops to bf16 so the MXU runs
    # the product at bf16 rate — accumulation is still f32
    ds_ref[...] += jnp.dot(
        weighted.astype(s_ref.dtype), items_ref[...], preferred_element_type=jnp.float32
    )


def _bwd_fused_kernel(s_ref, items_ref, rowbias_ref, lse_ref, dlse_ref, di_ref, dsp_ref):
    """One (item-chunk j, m-block i) program emitting BOTH gradients.

    The probability tile is computed once per (i, j) instead of once per
    kernel: pw = softmax * dlse serves ds (pw @ items) and di (pw^T @ s) —
    this removes one full (M, N, D) logit-recompute pass versus the split
    kernels below. di accumulates in the revisited VMEM block (i is the fast
    grid axis); ds cannot also revisit consecutively in this layout, so each
    (i, j) tile writes a per-chunk partial that a cheap XLA reduction sums —
    O(n_chunks * M * D) HBM, which is why the split path remains for very
    large catalogs (see _FUSED_BWD_PARTIALS_BUDGET).
    """
    i = pl.program_id(1)  # m-block index (fast axis -> consecutive di revisits)

    @pl.when(i == 0)
    def _init():
        di_ref[...] = jnp.zeros_like(di_ref[...])

    logits = jax.lax.dot_general(
        s_ref[...], items_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + rowbias_ref[0, 0][None, :]
    pw = jnp.exp(logits - lse_ref[0, 0][:, None]) * dlse_ref[0, 0][:, None]
    pw_op = pw.astype(s_ref.dtype)  # MXU runs at the input precision; f32 accumulation below
    dsp_ref[0, ...] = jnp.dot(pw_op, items_ref[...], preferred_element_type=jnp.float32)
    di_ref[...] += jax.lax.dot_general(
        pw_op, s_ref[...], dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _ditems_kernel(s_ref, items_ref, rowbias_ref, lse_ref, dlse_ref, di_ref):
    """d(items) = softmax^T @ (dlse * sessions), accumulated over m-blocks."""
    i = pl.program_id(1)  # m-block index (fast axis -> consecutive revisits)

    @pl.when(i == 0)
    def _init():
        di_ref[...] = jnp.zeros_like(di_ref[...])

    logits = jax.lax.dot_general(
        s_ref[...], items_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + rowbias_ref[0, 0][None, :]
    p = jnp.exp(logits - lse_ref[0, 0][:, None])
    weighted_s = s_ref[...].astype(jnp.float32) * dlse_ref[0, 0][:, None]
    # match operand precision to the input dtype (f32 accumulation either way)
    di_ref[...] += jax.lax.dot_general(
        p.astype(s_ref.dtype),
        weighted_s.astype(s_ref.dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _pad_rows(x: jnp.ndarray, multiple: int, fill: float = 0.0) -> jnp.ndarray:
    rows = x.shape[0]
    target = ((rows + multiple - 1) // multiple) * multiple
    if target == rows:
        return x
    widths = ((0, target - rows),) + ((0, 0),) * (x.ndim - 1)
    return jnp.pad(x, widths, constant_values=fill)


def _prepare(sessions, items, row_bias, block_m, chunk_n):
    s_pad = _pad_rows(sessions, block_m)
    items_pad = _pad_rows(items, chunk_n)
    if row_bias is None:
        row_bias = jnp.zeros((items.shape[0],), jnp.float32)
    bias_pad = _pad_rows(row_bias.astype(jnp.float32), chunk_n, fill=_NEG_BIG)
    n_m = s_pad.shape[0] // block_m
    n_chunks = items_pad.shape[0] // chunk_n
    return s_pad, items_pad, bias_pad.reshape(n_chunks, 1, chunk_n), n_m, n_chunks


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def streaming_lse(
    sessions: jnp.ndarray,  # (M, D)
    items: jnp.ndarray,  # (N, D)
    row_bias: tp.Optional[jnp.ndarray] = None,  # (N,) additive; -1e30 = invalid row
    block_m: int = DEFAULT_BLOCK_M,
    chunk_n: int = DEFAULT_CHUNK_N,
    interpret: bool = False,
) -> jnp.ndarray:
    """logsumexp_j(sessions @ items.T + row_bias)[m] as one fused reduction."""
    lse = _lse_call(sessions, items, row_bias, block_m, chunk_n, interpret)
    return lse


def _lse_call(sessions, items, row_bias, block_m, chunk_n, interpret):
    m_rows, d = sessions.shape
    s_pad, items_pad, bias3, n_m, n_chunks = _prepare(sessions, items, row_bias, block_m, chunk_n)
    m_run, l_run = pl.pallas_call(
        _lse_fwd_kernel,
        grid=(n_m, n_chunks),
        in_specs=[
            pl.BlockSpec((block_m, d), lambda i, j: (i, 0)),
            pl.BlockSpec((chunk_n, d), lambda i, j: (j, 0)),
            pl.BlockSpec((1, 1, chunk_n), lambda i, j: (j, 0, 0)),
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
    )(s_pad, items_pad, bias3)
    return (m_run + jnp.log(l_run)).reshape(-1)[:m_rows]


def _streaming_lse_fwd(sessions, items, row_bias, block_m, chunk_n, interpret):
    lse = _lse_call(sessions, items, row_bias, block_m, chunk_n, interpret)
    return lse, (sessions, items, row_bias, lse)


# fused backward writes (n_chunks, M, D) f32 ds partials; above this many
# bytes fall back to the two-pass kernels (no partials, one extra logit pass)
_FUSED_BWD_PARTIALS_BUDGET = 512 * 1024 * 1024


def _streaming_lse_bwd(block_m, chunk_n, interpret, residuals, dlse):
    sessions, items, row_bias, lse = residuals
    m_rows, d = sessions.shape
    n_valid = items.shape[0]
    s_pad, items_pad, bias3, n_m, n_chunks = _prepare(sessions, items, row_bias, block_m, chunk_n)
    # padded session rows: lse=+big makes their probabilities vanish
    lse_pad = jnp.pad(lse, (0, s_pad.shape[0] - m_rows), constant_values=-_NEG_BIG).reshape(n_m, 1, block_m)
    dlse_pad = jnp.pad(dlse.astype(jnp.float32), (0, s_pad.shape[0] - m_rows)).reshape(n_m, 1, block_m)

    d_bias = None if row_bias is None else jnp.zeros_like(row_bias)
    partials_bytes = n_chunks * s_pad.shape[0] * d * 4
    if partials_bytes <= _FUSED_BWD_PARTIALS_BUDGET:
        di, ds_partials = pl.pallas_call(
            _bwd_fused_kernel,
            grid=(n_chunks, n_m),
            in_specs=[
                pl.BlockSpec((block_m, d), lambda j, i: (i, 0)),
                pl.BlockSpec((chunk_n, d), lambda j, i: (j, 0)),
                pl.BlockSpec((1, 1, chunk_n), lambda j, i: (j, 0, 0)),
                pl.BlockSpec((1, 1, block_m), lambda j, i: (i, 0, 0)),
                pl.BlockSpec((1, 1, block_m), lambda j, i: (i, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((chunk_n, d), lambda j, i: (j, 0)),
                pl.BlockSpec((1, block_m, d), lambda j, i: (j, i, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct(items_pad.shape, jnp.float32),
                jax.ShapeDtypeStruct((n_chunks, s_pad.shape[0], d), jnp.float32),
            ],
            interpret=interpret,
        )(s_pad, items_pad, bias3, lse_pad, dlse_pad)
        ds = ds_partials.sum(axis=0)
        return ds[:m_rows].astype(sessions.dtype), di[:n_valid].astype(items.dtype), d_bias

    ds = pl.pallas_call(
        _dsessions_kernel,
        grid=(n_m, n_chunks),
        in_specs=[
            pl.BlockSpec((block_m, d), lambda i, j: (i, 0)),
            pl.BlockSpec((chunk_n, d), lambda i, j: (j, 0)),
            pl.BlockSpec((1, 1, chunk_n), lambda i, j: (j, 0, 0)),
            pl.BlockSpec((1, 1, block_m), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, block_m), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((block_m, d), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct(s_pad.shape, jnp.float32),
        interpret=interpret,
    )(s_pad, items_pad, bias3, lse_pad, dlse_pad)

    di = pl.pallas_call(
        _ditems_kernel,
        grid=(n_chunks, n_m),
        in_specs=[
            pl.BlockSpec((block_m, d), lambda j, i: (i, 0)),
            pl.BlockSpec((chunk_n, d), lambda j, i: (j, 0)),
            pl.BlockSpec((1, 1, chunk_n), lambda j, i: (j, 0, 0)),
            pl.BlockSpec((1, 1, block_m), lambda j, i: (i, 0, 0)),
            pl.BlockSpec((1, 1, block_m), lambda j, i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((chunk_n, d), lambda j, i: (j, 0)),
        out_shape=jax.ShapeDtypeStruct(items_pad.shape, jnp.float32),
        interpret=interpret,
    )(s_pad, items_pad, bias3, lse_pad, dlse_pad)

    return ds[:m_rows].astype(sessions.dtype), di[:n_valid].astype(items.dtype), d_bias


streaming_lse.defvjp(_streaming_lse_fwd, _streaming_lse_bwd)


def sharded_streaming_lse(
    sessions: jnp.ndarray,  # (M, D) — replicated or row-sharded over data_axis
    items: jnp.ndarray,  # (N, D)
    mesh: Mesh,
    shard_axis: str,
    data_axis: tp.Optional[str] = None,
    block_m: int = DEFAULT_BLOCK_M,
    chunk_n: int = DEFAULT_CHUNK_N,
    interpret: bool = False,
) -> jnp.ndarray:
    """Tensor-parallel streaming lse: item table row-sharded over
    ``shard_axis``; each shard runs the local kernel over its slice, then the
    per-shard partial logsumexps merge with one (M,)-sized collective —
    the communication volume is rows, not logits. With ``data_axis`` set,
    session rows stay batch-sharded (DPxTP): each (data, model) device works
    on its batch shard against its item shard."""
    n_shards = mesh.shape[shard_axis]
    n = items.shape[0]
    per_shard = -(-n // n_shards)
    items_padded = _pad_rows(items, per_shard * n_shards)
    valid = jnp.where(jnp.arange(items_padded.shape[0]) < n, 0.0, _NEG_BIG).astype(jnp.float32)
    sessions_spec = P(data_axis, None) if data_axis is not None else P()

    def local(sessions_local, items_local, bias_local):
        local_lse = streaming_lse(sessions_local, items_local, bias_local, block_m, chunk_n, interpret)
        # logsumexp-combine across shards: tiny (M,) collectives over ICI.
        # The max shift is gradient-neutral; pmax has no differentiation rule
        # under shard_map, so gather the per-shard maxima instead.
        gathered = jax.lax.all_gather(jax.lax.stop_gradient(local_lse), shard_axis)
        m = jnp.max(gathered, axis=0)
        total = jax.lax.psum(jnp.exp(local_lse - m), shard_axis)
        return m + jnp.log(total)

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(sessions_spec, P(shard_axis, None), P(shard_axis)),
        out_specs=P(data_axis) if data_axis is not None else P(),
        check_vma=False,
    )(sessions, items_padded, valid)


def reference_lse(sessions: jnp.ndarray, items: jnp.ndarray) -> jnp.ndarray:
    """XLA-math twin for CPU/testing."""
    logits = jnp.einsum("md,nd->mn", sessions, items, preferred_element_type=jnp.float32)
    return jax.nn.logsumexp(logits, axis=-1)
