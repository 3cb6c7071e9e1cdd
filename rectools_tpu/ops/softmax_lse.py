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


# second accumulation window offset: window-1 covers bound gaps g in [0, ~64]
# at full f32 relative precision, window-2 (terms pre-multiplied by e^64
# INSIDE the exp argument) extends exact coverage to g ~ 128; beyond that
# both windows flush to zero and the lse comes out -inf — loud, not silent.
_WINDOW2_OFFSET = 64.0


def _lse_shift_kernel(s_ref, items_ref, shift_ref, l_ref, l2_ref, *, n_valid, chunk_n, j_last):
    """Fixed-shift streaming sumexp: one dependency-free sweep per chunk.

    The flash-style running max costs ~45% of the forward at recsys shapes —
    not the exp itself but the SERIALIZATION it forces (the max-reduce over
    the tile must retire before the exp pass can start, so the VPU runs two
    dependent sweeps; measured 2.84 ms vs 1.57 ms without the max at
    M=51k, N=16k, D=128). This kernel instead shifts by a PRECOMPUTED
    per-row upper bound (Cauchy-Schwarz: ||s_row|| * max_i ||item_i||, one
    cheap fused XLA pass outside). Terms are exp of values <= 0, so no
    overflow is possible; f32 keeps full RELATIVE precision however loose
    the bound is, until flush-to-zero at e^-87. The second accumulator
    collects the same terms scaled by e^64 (still overflow-safe: each term
    <= e^64, a chunk row-sum <= 2048 * e^64 ~ 1e31 << f32 max), pushing the
    flush horizon to bound gaps of ~128 — far beyond any sanely-scaled
    embedding (a gap g means max |logit| >= g). The caller selects per row:
    window 1 while its sum stays comfortably normal, else window 2.

    Items arrive UNPADDED (tail chunk iota-masked like _lse_fwd_tail_kernel);
    the shift input is whole-array resident — one DMA, indexed by m-block.
    """
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        l_ref[...] = jnp.zeros_like(l_ref[...])
        l2_ref[...] = jnp.zeros_like(l2_ref[...])

    logits = jax.lax.dot_general(
        s_ref[...], items_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    shifted = logits - shift_ref[i, 0][:, None]

    def _accumulate(sh):
        l_ref[0, 0] += jnp.sum(jnp.exp(sh), axis=1)
        l2_ref[0, 0] += jnp.sum(jnp.exp(sh + _WINDOW2_OFFSET), axis=1)

    @pl.when(j < j_last)
    def _full_chunk():
        _accumulate(shifted)

    @pl.when(j == j_last)
    def _masked_tail():
        cols = jax.lax.broadcasted_iota(jnp.int32, shifted.shape, 1)
        _accumulate(jnp.where(cols < n_valid - j_last * chunk_n, shifted, _NEG_BIG))


def _lse_fwd_kernel(s_ref, items_ref, rowbias_ref, m_ref, l_ref, *, bias_resident=True):
    """(m-block i, item-chunk j) program: flash-style running logsumexp.

    General form: caller-supplied additive per-item bias. Below
    ``_BIAS_RESIDENT_BUDGET`` the whole bias array is VMEM-resident (one DMA
    total, indexed by chunk — a per-program (1, 1, chunk) spec would re-DMA
    every program and cost ~2.5 ms at KION scale); above it (multi-million-
    item catalogs where residency would blow VMEM) each program DMAs only its
    own chunk.
    """
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref[...], _NEG_BIG)
        l_ref[...] = jnp.zeros_like(l_ref[...])

    logits = jax.lax.dot_general(
        s_ref[...], items_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + rowbias_ref[j if bias_resident else 0, 0][None, :]  # (block_m, chunk_n); invalid rows -> -1e30

    m_old = m_ref[0, 0]
    m_new = jnp.maximum(m_old, jnp.max(logits, axis=1))
    l_ref[0, 0] = l_ref[0, 0] * jnp.exp(m_old - m_new) + jnp.sum(jnp.exp(logits - m_new[:, None]), axis=1)
    m_ref[0, 0] = m_new


def _lse_fwd_tail_kernel(s_ref, items_ref, m_ref, l_ref, *, n_valid, chunk_n, j_last):
    """Tail-mask fwd: no bias input, no item padding.

    The item table arrives UNPADDED — the final grid block reads past the
    array bound (Pallas fills it with unspecified values) and an iota mask
    rewrites those columns to -1e30 before the reduction. Skipping the host
    ``jnp.pad`` matters far more than the mask pass costs: the per-step pad
    copy of the item tower measured +2.4 ms at KION scale (16.4k x 128).
    """
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref[...], _NEG_BIG)
        l_ref[...] = jnp.zeros_like(l_ref[...])

    logits = jax.lax.dot_general(
        s_ref[...], items_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    def _update(lg):
        m_old = m_ref[0, 0]
        m_new = jnp.maximum(m_old, jnp.max(lg, axis=1))
        l_ref[0, 0] = l_ref[0, 0] * jnp.exp(m_old - m_new) + jnp.sum(jnp.exp(lg - m_new[:, None]), axis=1)
        m_ref[0, 0] = m_new

    @pl.when(j < j_last)
    def _full_chunk():
        _update(logits)

    @pl.when(j == j_last)
    def _masked_tail():
        cols = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        _update(jnp.where(cols < n_valid - j_last * chunk_n, logits, _NEG_BIG))


# default fwd kernel for the row_bias=None path; False = the classic
# carry-in-revisited-block kernel (kept for A/B measurement)
_USE_PARTIALS_FWD = True


def _lse_fwd_partials_kernel(s_ref, items_ref, m_ref, l_ref, *, n_valid, chunk_n, j_last):
    """Per-chunk (max, sumexp) partials with the DMA-optimal grid order.

    The classic kernel's flash carry forces the chunk axis to be the fastest
    grid dimension, which re-DMAs the ENTIRE item table once per session
    block (~864 MB/step at KION scale — measured 2.5 ms for the bare matmul
    vs its 1.06 ms compute bound). Emitting independent per-chunk partials
    removes the carry, so the grid can run (chunk slow, m-block fast): the
    item chunk's block index is constant across consecutive programs and
    stays VMEM-resident, cutting HBM traffic to one session-table pass per
    chunk (~210 MB). The (n_chunks, M) partials are combined by a trivial
    XLA logsumexp over the chunk axis — exact at any logit scale, same
    numerics class as the classic flash reduction.
    """
    j = pl.program_id(0)

    logits = jax.lax.dot_general(
        s_ref[...], items_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    def _partials(lg):
        m_j = jnp.max(lg, axis=1)
        m_ref[0, 0, 0] = m_j
        l_ref[0, 0, 0] = jnp.sum(jnp.exp(lg - m_j[:, None]), axis=1)

    @pl.when(j < j_last)
    def _full_chunk():
        _partials(logits)

    @pl.when(j == j_last)
    def _masked_tail():
        cols = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        _partials(jnp.where(cols < n_valid - j_last * chunk_n, logits, _NEG_BIG))


def _dsessions_kernel(s_ref, items_ref, rowbias_ref, lse_ref, dlse_ref, ds_ref, *, bias_resident=True):
    """ds = dlse * softmax @ items, accumulated over item chunks.

    Small per-row inputs (bias, lse, dlse) are whole-array resident blocks
    indexed by grid position — per-program (1, 1, n) block specs would issue
    a tiny DMA every program and dominate the kernel at recsys shapes. The
    bias alone falls back to per-chunk DMA above _BIAS_RESIDENT_BUDGET.
    """
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        ds_ref[...] = jnp.zeros_like(ds_ref[...])

    logits = jax.lax.dot_general(
        s_ref[...], items_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + rowbias_ref[j if bias_resident else 0, 0][None, :]
    p = jnp.exp(logits - lse_ref[i, 0][:, None])
    weighted = p * dlse_ref[i, 0][:, None]
    # accumulator stays f32 across chunks (bf16 += would round each step);
    # under bf16 inputs the probability operand drops to bf16 so the MXU runs
    # the product at bf16 rate — accumulation is still f32
    ds_ref[...] += jnp.dot(
        weighted.astype(s_ref.dtype), items_ref[...], preferred_element_type=jnp.float32
    )


def _bwd_fused_kernel(s_ref, items_ref, rowbias_ref, lse_ref, dlse_ref, di_ref, dsp_ref, *, bias_resident=True):
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
    j = pl.program_id(0)
    i = pl.program_id(1)  # m-block index (fast axis -> consecutive di revisits)

    @pl.when(i == 0)
    def _init():
        di_ref[...] = jnp.zeros_like(di_ref[...])

    logits = jax.lax.dot_general(
        s_ref[...], items_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + rowbias_ref[j if bias_resident else 0, 0][None, :]
    pw = jnp.exp(logits - lse_ref[i, 0][:, None]) * dlse_ref[i, 0][:, None]
    pw_op = pw.astype(s_ref.dtype)  # MXU runs at the input precision; f32 accumulation below
    dsp_ref[0, ...] = jnp.dot(pw_op, items_ref[...], preferred_element_type=jnp.float32)
    di_ref[...] += jax.lax.dot_general(
        pw_op, s_ref[...], dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _ditems_kernel(s_ref, items_ref, rowbias_ref, lse_ref, dlse_ref, di_ref, *, bias_resident=True):
    """d(items) = softmax^T @ (dlse * sessions), accumulated over m-blocks."""
    j = pl.program_id(0)
    i = pl.program_id(1)  # m-block index (fast axis -> consecutive revisits)

    @pl.when(i == 0)
    def _init():
        di_ref[...] = jnp.zeros_like(di_ref[...])

    logits = jax.lax.dot_general(
        s_ref[...], items_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + rowbias_ref[j if bias_resident else 0, 0][None, :]
    p = jnp.exp(logits - lse_ref[i, 0][:, None])
    weighted_s = s_ref[...].astype(jnp.float32) * dlse_ref[i, 0][:, None]
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


# whole-bias VMEM residency cap: one DMA total and chunk-indexed reads below
# it; above it (multi-million-item catalogs on the sharded full-softmax path,
# where O(N) f32 resident would fail to compile) each program DMAs its chunk
_BIAS_RESIDENT_BUDGET = 8 * 1024 * 1024  # bytes of f32 bias (2M items)


def _bias_spec(n_chunks: int, chunk_n: int, j_of_grid, bias3) -> tp.Tuple[tp.Any, bool]:
    """(BlockSpec, bias_resident) for a bias3 of shape (n_chunks, 1, chunk_n).

    ``j_of_grid`` maps the kernel grid coordinates to the item-chunk index
    (grids differ in axis order between the fwd and bwd kernels).
    """
    if bias3.size * 4 <= _BIAS_RESIDENT_BUDGET:
        return pl.BlockSpec((n_chunks, 1, chunk_n), lambda *g: (0, 0, 0)), True
    return pl.BlockSpec((1, 1, chunk_n), lambda *g: (j_of_grid(*g), 0, 0)), False


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def streaming_lse(
    sessions: jnp.ndarray,  # (M, D)
    items: jnp.ndarray,  # (N, D)
    row_bias: tp.Optional[jnp.ndarray] = None,  # (N,) additive; -1e30 = invalid row
    block_m: int = DEFAULT_BLOCK_M,
    chunk_n: int = DEFAULT_CHUNK_N,
    interpret: bool = False,
    bounded_shift: bool = False,
) -> jnp.ndarray:
    """logsumexp_j(sessions @ items.T + row_bias)[m] as one fused reduction.

    ``bounded_shift=True`` selects the dependency-free fixed-shift kernel
    (_lse_shift_kernel): ~45% faster forward, exact while the Cauchy-Schwarz
    bound GAP (||s_row|| * max_i ||item_i|| minus the row's true max logit)
    stays under ~125, and LOUDLY -inf beyond. CAUTION — the gap scales with
    the norms themselves for incoherent embeddings (gap ~ 0.7 * ||s||*||i||
    for isotropic vectors), so large-d towers violate the contract at norms
    well inside normal training (observed: NaN loss at the d=256 ml20m perf
    config). Opt-in for callers that control their embedding scale; the
    default runs the flash-style running-max kernels, exact at any scale.
    """
    lse = _lse_call(sessions, items, row_bias, block_m, chunk_n, interpret, bounded_shift)
    return lse


def _lse_call(sessions, items, row_bias, block_m, chunk_n, interpret, bounded_shift=False):
    m_rows, d = sessions.shape
    out_spec = [pl.BlockSpec((1, 1, block_m), lambda i, j: (i, 0, 0))] * 2

    if row_bias is None and bounded_shift:
        # fast path: fixed-shift one-pass kernel (see _lse_shift_kernel);
        # per-row branch-free selection between the two accumulation windows
        s_pad = _pad_rows(sessions, block_m)
        n_m = s_pad.shape[0] // block_m
        n_valid = items.shape[0]
        n_chunks = -(-n_valid // chunk_n)
        item_max_norm = jnp.sqrt(jnp.max(jnp.sum(jnp.square(items.astype(jnp.float32)), axis=1)))
        shift = jnp.sqrt(jnp.sum(jnp.square(s_pad.astype(jnp.float32)), axis=1)) * item_max_norm
        shift3 = shift.reshape(n_m, 1, block_m)
        l_run, l2_run = pl.pallas_call(
            partial(_lse_shift_kernel, n_valid=n_valid, chunk_n=chunk_n, j_last=n_chunks - 1),
            grid=(n_m, n_chunks),
            in_specs=[
                pl.BlockSpec((block_m, d), lambda i, j: (i, 0)),
                pl.BlockSpec((chunk_n, d), lambda i, j: (j, 0)),
                pl.BlockSpec((n_m, 1, block_m), lambda i, j: (0, 0, 0)),  # shift resident
            ],
            out_specs=out_spec,
            out_shape=[jax.ShapeDtypeStruct((n_m, 1, block_m), jnp.float32)] * 2,
            interpret=interpret,
        )(s_pad, items, shift3)
        # window 1 while its sum is comfortably normal (>= e^-20: flushed
        # tail terms then contribute < N * e^-87 / e^-20 ~ e^-57 relative);
        # otherwise window 2 (same terms scaled e^64 inside the exp)
        lse = jnp.where(
            l_run >= 2.061e-9,
            shift3 + jnp.log(l_run),
            (shift3 - _WINDOW2_OFFSET) + jnp.log(l2_run),
        )
        return lse.reshape(-1)[:m_rows]

    if row_bias is None:
        # exact tail mode: unpadded items, final chunk iota-masked in-kernel
        s_pad = _pad_rows(sessions, block_m)
        n_m = s_pad.shape[0] // block_m
        n_valid = items.shape[0]
        n_chunks = -(-n_valid // chunk_n)
        if _USE_PARTIALS_FWD:
            # DMA-optimal order: chunk slow / m-block fast, item chunk
            # VMEM-resident across m-blocks (see _lse_fwd_partials_kernel)
            m_part, l_part = pl.pallas_call(
                partial(_lse_fwd_partials_kernel, n_valid=n_valid, chunk_n=chunk_n, j_last=n_chunks - 1),
                grid=(n_chunks, n_m),
                in_specs=[
                    pl.BlockSpec((block_m, d), lambda j, i: (i, 0)),
                    pl.BlockSpec((chunk_n, d), lambda j, i: (j, 0)),
                ],
                out_specs=[pl.BlockSpec((1, 1, 1, block_m), lambda j, i: (j, i, 0, 0))] * 2,
                out_shape=[jax.ShapeDtypeStruct((n_chunks, n_m, 1, block_m), jnp.float32)] * 2,
                interpret=interpret,
            )(s_pad, items)
            # logsumexp-combine over the chunk axis: (n_chunks, M) floats,
            # negligible next to the kernel
            m_all = jnp.max(m_part, axis=0)
            l_all = jnp.sum(l_part * jnp.exp(m_part - m_all[None]), axis=0)
            return (m_all + jnp.log(l_all)).reshape(-1)[:m_rows]
        m_run, l_run = pl.pallas_call(
            partial(_lse_fwd_tail_kernel, n_valid=n_valid, chunk_n=chunk_n, j_last=n_chunks - 1),
            grid=(n_m, n_chunks),
            in_specs=[
                pl.BlockSpec((block_m, d), lambda i, j: (i, 0)),
                pl.BlockSpec((chunk_n, d), lambda i, j: (j, 0)),
            ],
            out_specs=out_spec,
            out_shape=[jax.ShapeDtypeStruct((n_m, 1, block_m), jnp.float32)] * 2,
            interpret=interpret,
        )(s_pad, items)
        return (m_run + jnp.log(l_run)).reshape(-1)[:m_rows]

    s_pad, items_pad, bias3, n_m, n_chunks = _prepare(sessions, items, row_bias, block_m, chunk_n)
    bias_spec, bias_resident = _bias_spec(n_chunks, chunk_n, lambda i, j: j, bias3)
    m_run, l_run = pl.pallas_call(
        partial(_lse_fwd_kernel, bias_resident=bias_resident),
        grid=(n_m, n_chunks),
        in_specs=[
            pl.BlockSpec((block_m, d), lambda i, j: (i, 0)),
            pl.BlockSpec((chunk_n, d), lambda i, j: (j, 0)),
            bias_spec,
        ],
        out_specs=out_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_m, 1, block_m), jnp.float32),
            jax.ShapeDtypeStruct((n_m, 1, block_m), jnp.float32),
        ],
        interpret=interpret,
    )(s_pad, items_pad, bias3)
    return (m_run + jnp.log(l_run)).reshape(-1)[:m_rows]


def _streaming_lse_fwd(sessions, items, row_bias, block_m, chunk_n, interpret, bounded_shift):
    lse = _lse_call(sessions, items, row_bias, block_m, chunk_n, interpret, bounded_shift)
    return lse, (sessions, items, row_bias, lse)


# fused backward writes (n_chunks, M, D) f32 ds partials; above this many
# bytes fall back to the two-pass kernels (no partials, one extra logit pass)
_FUSED_BWD_PARTIALS_BUDGET = 512 * 1024 * 1024

# Per-chunk ds partials precision for bf16 inputs. bf16 partials halve the
# partial-sum HBM traffic but round each chunk's session-gradient partial
# BEFORE the cross-chunk sum, where cancellation can amplify the error
# (round-4 advisor finding). Measured at the KION shape (B=512, L=100,
# N=15872, 8 chunks; benchmarks/results_partials_ab.json): f32 partials cost
# +0.16 ms on the 6.15 ms loss fwd+bwd slice (+2.6%); bf16 partials move ds
# by 0.0015 rel-mean vs f32 partials, while bf16 TOWERS alone already sit
# 0.0014 rel-mean from the f32-tower oracle — the partial rounding adds
# ~0.0006 on top of a same-sized noise floor, and di is bit-identical. The
# default therefore stays bf16; flip to False to force f32 partials.
# tests/models/nn/transformers/test_bf16_drift.py pins the quality effect.
BF16_DS_PARTIALS = True


def _ds_partials_dtype(input_dtype) -> jnp.dtype:
    if BF16_DS_PARTIALS and input_dtype == jnp.bfloat16:
        return jnp.bfloat16
    return jnp.float32


def _streaming_lse_bwd(block_m, chunk_n, interpret, bounded_shift, residuals, dlse):
    sessions, items, row_bias, lse = residuals
    m_rows, d = sessions.shape
    n_valid = items.shape[0]
    s_pad, items_pad, bias3, n_m, n_chunks = _prepare(sessions, items, row_bias, block_m, chunk_n)
    # padded session rows: lse=+big makes their probabilities vanish
    lse_pad = jnp.pad(lse, (0, s_pad.shape[0] - m_rows), constant_values=-_NEG_BIG).reshape(n_m, 1, block_m)
    dlse_pad = jnp.pad(dlse.astype(jnp.float32), (0, s_pad.shape[0] - m_rows)).reshape(n_m, 1, block_m)

    d_bias = None if row_bias is None else jnp.zeros_like(row_bias)
    bias_spec_ji, bias_resident = _bias_spec(n_chunks, chunk_n, lambda j, i: j, bias3)
    partials_bytes = n_chunks * s_pad.shape[0] * d * 4
    if partials_bytes <= _FUSED_BWD_PARTIALS_BUDGET:
        di, ds_partials = pl.pallas_call(
            partial(_bwd_fused_kernel, bias_resident=bias_resident),
            grid=(n_chunks, n_m),
            in_specs=[
                pl.BlockSpec((block_m, d), lambda j, i: (i, 0)),
                pl.BlockSpec((chunk_n, d), lambda j, i: (j, 0)),
                bias_spec_ji,
                pl.BlockSpec((n_m, 1, block_m), lambda j, i: (0, 0, 0)),
                pl.BlockSpec((n_m, 1, block_m), lambda j, i: (0, 0, 0)),
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

    bias_spec_ij, _ = _bias_spec(n_chunks, chunk_n, lambda i, j: j, bias3)
    ds = pl.pallas_call(
        partial(_dsessions_kernel, bias_resident=bias_resident),
        grid=(n_m, n_chunks),
        in_specs=[
            pl.BlockSpec((block_m, d), lambda i, j: (i, 0)),
            pl.BlockSpec((chunk_n, d), lambda i, j: (j, 0)),
            bias_spec_ij,
            pl.BlockSpec((n_m, 1, block_m), lambda i, j: (0, 0, 0)),
            pl.BlockSpec((n_m, 1, block_m), lambda i, j: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((block_m, d), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct(s_pad.shape, jnp.float32),
        interpret=interpret,
    )(s_pad, items_pad, bias3, lse_pad, dlse_pad)

    di = pl.pallas_call(
        partial(_ditems_kernel, bias_resident=bias_resident),
        grid=(n_chunks, n_m),
        in_specs=[
            pl.BlockSpec((block_m, d), lambda j, i: (i, 0)),
            pl.BlockSpec((chunk_n, d), lambda j, i: (j, 0)),
            bias_spec_ji,
            pl.BlockSpec((n_m, 1, block_m), lambda j, i: (0, 0, 0)),
            pl.BlockSpec((n_m, 1, block_m), lambda j, i: (0, 0, 0)),
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


def _grads_z_fused_kernel(s_ref, items_ref, z_ref, di_ref, dsp_ref, *, n_valid, chunk_n, j_last):
    """One (item-chunk j, m-block i) program emitting both softmax grads
    from the z-folded row vector: pw = exp(logits - z).

    ``z = lse - log(c)`` folds the per-row cotangent magnitude c >= 0 into
    the exp's subtrahend, so the kernel runs two elementwise passes
    (sub+exp, cast) where the generic backward runs four (bias add, sub,
    exp, dlse mul). The item table arrives UNPADDED (the final block's
    out-of-bounds columns are iota-masked to zero probability — required:
    the dsp row sums over ALL columns, so garbage there would pollute valid
    ds rows); z is whole-array resident (one DMA, not one per program); z
    rows for padded/ignored sessions are +inf.
    """
    j = pl.program_id(0)
    i = pl.program_id(1)  # m-block index (fast axis -> consecutive di revisits)

    @pl.when(i == 0)
    def _init():
        di_ref[...] = jnp.zeros_like(di_ref[...])

    logits = jax.lax.dot_general(
        s_ref[...], items_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    zrow = z_ref[i, 0]

    def _emit(pw, items):
        pw = pw.astype(s_ref.dtype)
        dsp_ref[0, ...] = jnp.dot(pw, items, preferred_element_type=jnp.float32).astype(
            dsp_ref.dtype
        )
        di_ref[...] += jax.lax.dot_general(
            pw, s_ref[...], dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(j < j_last)
    def _full_chunk():
        _emit(jnp.exp(logits - zrow[:, None]), items_ref[...])

    @pl.when(j == j_last)
    def _masked_tail():
        tail_valid = n_valid - j_last * chunk_n
        cols = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        pw = jnp.where(cols < tail_valid, jnp.exp(logits - zrow[:, None]), 0.0)
        # the dsp row sums over ALL columns, and out-of-bounds item garbage
        # can be NaN — 0 * NaN = NaN, so the items operand must be zeroed
        # too, not just the probabilities
        rows = jax.lax.broadcasted_iota(jnp.int32, items_ref.shape, 0)
        _emit(pw, jnp.where(rows < tail_valid, items_ref[...], 0))


def _ce_grads_z_fused_kernel(
    s_ref, items_ref, z_ref, y_ref, coeff_ref, di_ref, dsp_ref, *, n_valid, chunk_n, j_last
):
    """_grads_z_fused_kernel with the CE label correction fused in.

    The softmax-CE gradient is ``(P - coeff * onehot(y)) `` applied to both
    matmuls. Folding the one-hot into the probability tile as an iota
    compare (col == y[m]) removes the host-side ``items[y]`` gather and the
    ``segment_sum`` scatter-add over the catalog that the unfused backward
    needed — the scatter serializes on TPU and cost more than both gradient
    matmuls combined at KION scale.
    """
    j = pl.program_id(0)
    i = pl.program_id(1)  # m-block index (fast axis -> consecutive di revisits)

    @pl.when(i == 0)
    def _init():
        di_ref[...] = jnp.zeros_like(di_ref[...])

    logits = jax.lax.dot_general(
        s_ref[...], items_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    zrow = z_ref[i, 0]
    # label one-hot for this chunk: columns are global ids [j*chunk, ...);
    # applied as ONE select on the probability tile (no delta tile buffer)
    local_y = y_ref[i, 0] - j * chunk_n  # (block_m,)
    cols = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)

    def _corrected(pw):
        return jnp.where(cols == local_y[:, None], pw - coeff_ref[i, 0][:, None], pw)

    def _emit(pw, items):
        pw = pw.astype(s_ref.dtype)
        dsp_ref[0, ...] = jnp.dot(pw, items, preferred_element_type=jnp.float32).astype(
            dsp_ref.dtype
        )
        di_ref[...] += jax.lax.dot_general(
            pw, s_ref[...], dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(j < j_last)
    def _full_chunk():
        _emit(_corrected(jnp.exp(logits - zrow[:, None])), items_ref[...])

    @pl.when(j == j_last)
    def _masked_tail():
        tail_valid = n_valid - j_last * chunk_n
        pw = jnp.where(cols < tail_valid, _corrected(jnp.exp(logits - zrow[:, None])), 0.0)
        rows = jax.lax.broadcasted_iota(jnp.int32, items_ref.shape, 0)
        _emit(pw, jnp.where(rows < tail_valid, items_ref[...], 0))


def softmax_ce_grads_from_z(
    sessions: jnp.ndarray,  # (M, D)
    items: jnp.ndarray,  # (N, D)
    z: jnp.ndarray,  # (M,) f32: lse - log(row cotangent magnitude), +inf = ignore row
    y: jnp.ndarray,  # (M,) int32 label ids; rows with coeff == 0 are ignored
    coeff: jnp.ndarray,  # (M,) f32 nonnegative row cotangent magnitude (= exp(lse - z))
    block_m: int = DEFAULT_BLOCK_M,
    chunk_n: int = DEFAULT_CHUNK_N,
    interpret: bool = False,
) -> tp.Tuple[jnp.ndarray, jnp.ndarray]:
    """(ds, di) = ((P - D) @ items, (P - D)^T @ sessions) with
    P = exp(sessions @ items^T - z), D = coeff * onehot(y) — the full
    softmax-CE backward in one fused kernel (see _ce_grads_z_fused_kernel)."""
    m_rows, d = sessions.shape
    n_valid = items.shape[0]
    s_pad = _pad_rows(sessions, block_m)
    n_m = s_pad.shape[0] // block_m
    n_chunks = -(-n_valid // chunk_n)
    pad_m = s_pad.shape[0] - m_rows
    z3 = jnp.pad(z.astype(jnp.float32), (0, pad_m), constant_values=jnp.inf).reshape(n_m, 1, block_m)
    # padded rows: coeff 0 -> their delta vanishes (y value is then irrelevant)
    y3 = jnp.pad(y.astype(jnp.int32), (0, pad_m)).reshape(n_m, 1, block_m)
    c3 = jnp.pad(coeff.astype(jnp.float32), (0, pad_m)).reshape(n_m, 1, block_m)
    part_dtype = _ds_partials_dtype(sessions.dtype)

    partials_bytes = n_chunks * s_pad.shape[0] * d * jnp.dtype(part_dtype).itemsize
    if partials_bytes <= _FUSED_BWD_PARTIALS_BUDGET:
        row_spec = pl.BlockSpec((n_m, 1, block_m), lambda j, i: (0, 0, 0))
        di, ds_partials = pl.pallas_call(
            partial(_ce_grads_z_fused_kernel, n_valid=n_valid, chunk_n=chunk_n, j_last=n_chunks - 1),
            grid=(n_chunks, n_m),
            in_specs=[
                pl.BlockSpec((block_m, d), lambda j, i: (i, 0)),
                pl.BlockSpec((chunk_n, d), lambda j, i: (j, 0)),
                row_spec,  # z resident
                row_spec,  # y resident
                row_spec,  # coeff resident
            ],
            out_specs=[
                pl.BlockSpec((chunk_n, d), lambda j, i: (j, 0)),
                pl.BlockSpec((1, block_m, d), lambda j, i: (j * n_m + i, 0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n_chunks * chunk_n, d), jnp.float32),
                jax.ShapeDtypeStruct((n_chunks * n_m, block_m, d), part_dtype),
            ],
            interpret=interpret,
        )(s_pad, items, z3, y3, c3)
        ds = ds_partials.reshape(n_chunks, s_pad.shape[0], d).astype(jnp.float32).sum(axis=0)
        return ds[:m_rows], di[:n_valid]

    # very-large-catalog fallback: plain grads + explicit label correction
    # (the gather/scatter cost is acceptable where the partials are not)
    ds_z, di_z = softmax_grads_from_z(sessions, items, z, block_m, chunk_n, interpret)
    coeff_col = coeff.astype(jnp.float32)[:, None]
    ds = ds_z - coeff_col * items[y].astype(jnp.float32)
    di = di_z - jax.ops.segment_sum(coeff_col * sessions.astype(jnp.float32), y, num_segments=n_valid)
    return ds, di


def _ds_z_kernel(s_ref, items_ref, z_ref, ds_ref):
    """Split fallback: padded items (zero rows annihilate their ds term)."""
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        ds_ref[...] = jnp.zeros_like(ds_ref[...])

    logits = jax.lax.dot_general(
        s_ref[...], items_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    pw = jnp.exp(logits - z_ref[i, 0][:, None]).astype(s_ref.dtype)
    ds_ref[...] += jnp.dot(pw, items_ref[...], preferred_element_type=jnp.float32)


def _di_z_kernel(s_ref, items_ref, z_ref, di_ref):
    """Split fallback: padded di rows are garbage and sliced off."""
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        di_ref[...] = jnp.zeros_like(di_ref[...])

    logits = jax.lax.dot_general(
        s_ref[...], items_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    pw = jnp.exp(logits - z_ref[i, 0][:, None]).astype(s_ref.dtype)
    di_ref[...] += jax.lax.dot_general(
        pw, s_ref[...], dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def softmax_grads_from_z(
    sessions: jnp.ndarray,  # (M, D)
    items: jnp.ndarray,  # (N, D)
    z: jnp.ndarray,  # (M,) f32: lse - log(row cotangent magnitude), +inf = ignore row
    block_m: int = DEFAULT_BLOCK_M,
    chunk_n: int = DEFAULT_CHUNK_N,
    interpret: bool = False,
) -> tp.Tuple[jnp.ndarray, jnp.ndarray]:
    """(ds, di) = (P @ items, P^T @ sessions) with P = exp(sessions @ items^T - z).

    The nonnegative-cotangent softmax backward: callers that know their
    per-row lse cotangent is ``c >= 0`` up to one scalar sign (softmax CE:
    c = w/denom) pass ``z = lse - log(c)`` and apply the scalar sign to the
    outputs. The ds partials are emitted at the input dtype (bf16 inputs ->
    bf16 partials): the factors are bf16 anyway, so the extra rounding is
    below the product noise, and it halves the partial-sum HBM traffic.
    """
    m_rows, d = sessions.shape
    n_valid = items.shape[0]
    s_pad = _pad_rows(sessions, block_m)
    n_m = s_pad.shape[0] // block_m
    n_chunks = -(-n_valid // chunk_n)
    # padded session rows: z=+inf makes pw vanish
    z_pad = jnp.pad(z.astype(jnp.float32), (0, s_pad.shape[0] - m_rows), constant_values=jnp.inf)
    z3 = z_pad.reshape(n_m, 1, block_m)
    part_dtype = _ds_partials_dtype(sessions.dtype)

    partials_bytes = n_chunks * s_pad.shape[0] * d * jnp.dtype(part_dtype).itemsize
    if partials_bytes <= _FUSED_BWD_PARTIALS_BUDGET:
        di, ds_partials = pl.pallas_call(
            partial(_grads_z_fused_kernel, n_valid=n_valid, chunk_n=chunk_n, j_last=n_chunks - 1),
            grid=(n_chunks, n_m),
            in_specs=[
                pl.BlockSpec((block_m, d), lambda j, i: (i, 0)),
                pl.BlockSpec((chunk_n, d), lambda j, i: (j, 0)),
                pl.BlockSpec((n_m, 1, block_m), lambda j, i: (0, 0, 0)),  # z resident
            ],
            out_specs=[
                pl.BlockSpec((chunk_n, d), lambda j, i: (j, 0)),
                pl.BlockSpec((1, block_m, d), lambda j, i: (j * n_m + i, 0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n_chunks * chunk_n, d), jnp.float32),
                jax.ShapeDtypeStruct((n_chunks * n_m, block_m, d), part_dtype),
            ],
            interpret=interpret,
        )(s_pad, items, z3)
        ds = ds_partials.reshape(n_chunks, s_pad.shape[0], d).astype(jnp.float32).sum(axis=0)
        return ds[:m_rows], di[:n_valid]

    items_pad = _pad_rows(items, chunk_n)
    ds = pl.pallas_call(
        _ds_z_kernel,
        grid=(n_m, n_chunks),
        in_specs=[
            pl.BlockSpec((block_m, d), lambda i, j: (i, 0)),
            pl.BlockSpec((chunk_n, d), lambda i, j: (j, 0)),
            pl.BlockSpec((n_m, 1, block_m), lambda i, j: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((block_m, d), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct(s_pad.shape, jnp.float32),
        interpret=interpret,
    )(s_pad, items_pad, z3)
    di = pl.pallas_call(
        _di_z_kernel,
        grid=(n_chunks, n_m),
        in_specs=[
            pl.BlockSpec((block_m, d), lambda j, i: (i, 0)),
            pl.BlockSpec((chunk_n, d), lambda j, i: (j, 0)),
            pl.BlockSpec((n_m, 1, block_m), lambda j, i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((chunk_n, d), lambda j, i: (j, 0)),
        out_shape=jax.ShapeDtypeStruct(items_pad.shape, jnp.float32),
        interpret=interpret,
    )(s_pad, items_pad, z3)
    return ds[:m_rows], di[:n_valid]


def reference_lse(sessions: jnp.ndarray, items: jnp.ndarray) -> jnp.ndarray:
    """XLA-math twin for CPU/testing."""
    logits = jnp.einsum("md,nd->mn", sessions, items, preferred_element_type=jnp.float32)
    return jax.nn.logsumexp(logits, axis=-1)
