"""Fused attention kernel (Pallas) with additive bias and in-kernel dropout.

The transformer stack's hot op. The reference computes dense O(L^2) attention
through torch MHA (rectools/models/nn/transformers/torch_backbone.py:249-259);
here the whole per-head attention — scores, additive bias (causal/key-padding
masks and relative biases are all additive float biases in this framework),
softmax, attention-probability dropout, and the value contraction — runs in
one Pallas kernel: q blocks stream through VMEM while K/V stay resident, so
the (L, L) score matrix never round-trips to HBM. Sessions are short
(L ~ 100-1000 padded to lane multiples), so K/V fit VMEM comfortably and
blockwise-q fusion is the speed-of-light layout; the q-block loop also makes
long-session scaling a config knob (SURVEY.md §5 long-context note).

Dropout is counter-based: the keep mask is a pure function of
(seed, batch*head index, query row, key column) through a murmur3-style
integer hash computed with plain VPU ops. The same function runs inside the
Pallas kernels, in the XLA fallback path, and under interpret mode, so
TPU-vs-CPU training semantics are bit-identical and CI can test the dropout
path without hardware PRNG support.

Backward is a second Pallas kernel (one program per batch*head row) that
recomputes scores blockwise from the forward's logsumexp and regenerates the
dropout mask — dq/dk/dv never materialize the (B, H, L, L) probability
tensor in HBM either. Bias gradients, when requested, take an XLA recompute
path (biases are constant masks on every built-in training path).
"""

import typing as tp
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 128

_GOLDEN = np.uint32(0x9E3779B9)
_GOLDEN_I32 = np.int32(np.uint32(0x9E3779B9).astype(np.int32))  # same bits, signed


def _fmix32(h: jnp.ndarray) -> jnp.ndarray:
    """murmur3 finalizer: full avalanche on 32-bit lanes (VPU int ops only)."""
    h = h ^ (h >> np.uint32(16))
    h = h * np.uint32(0x85EBCA6B)
    h = h ^ (h >> np.uint32(13))
    h = h * np.uint32(0xC2B2AE35)
    h = h ^ (h >> np.uint32(16))
    return h


def _mix32_fast(h: jnp.ndarray) -> jnp.ndarray:
    """Single-multiply finalizer for dropout thresholding.

    int32 multiply is the expensive VPU op (emulated in multiple passes), and
    the full murmur3 finalizer spends two of them per element on top of the
    callers' position pre-multiply — dropout mask generation measured
    ~0.7 ms/step at KION scale. A dropout KEEP decision only compares the
    hash against a threshold, which is dominated by the HIGH bits, and the
    high bits of ``x * C`` depend on every input bit — one finalizer multiply
    (plus the callers' golden-ratio position multiply, which the adjacency
    tests do require) passes the adjacency/row independence tests
    (tests/models/nn/test_hash_dropout.py) at two thirds of the multiply
    cost. Negative sampling keeps the full `_fmix32` (its draws use all
    32 bits through a modulo).
    """
    h = h ^ (h >> np.uint32(16))
    h = h * np.uint32(0x7FEB352D)
    h = h ^ (h >> np.uint32(15))
    return h


def _dropout_threshold(dropout_rate: float) -> np.uint32:
    return np.uint32(min(0xFFFFFFFF, int(round(dropout_rate * 4294967296.0))))


def dropout_keep_mask(
    seed: jnp.ndarray,  # () or (1,) int32
    bh_index: jnp.ndarray,  # () int32 — batch*head row
    row_start: jnp.ndarray,  # () int32 — absolute first query row of the tile
    n_rows: int,
    n_cols: int,
    dropout_rate: float,
) -> jnp.ndarray:
    """(n_rows, n_cols) float32 keep mask in {0, 1}; P(1) = 1 - dropout_rate.

    Pure function of (seed, bh_index, absolute row, col): tiles of the same
    logical (L, L) mask agree regardless of block decomposition, which is what
    lets forward and backward regenerate identical masks.
    """
    # Scalars stay plain int32 arithmetic (Mosaic lowers 0-D vector ops
    # poorly); the avalanche hash runs on the 2-D lane array only. int32
    # multiply wraps identically to uint32, so the salt mixing is exact.
    rows = row_start + jax.lax.broadcasted_iota(jnp.int32, (n_rows, n_cols), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n_rows, n_cols), 1)
    pos = rows * np.int32(n_cols) + cols  # (n_rows, n_cols) int32
    salt = seed + bh_index * np.int32(40503)  # scalar-ish; (1,) in the XLA path
    mixed = pos * _GOLDEN_I32 + salt * np.int32(0x01000193)
    bits = _mix32_fast(mixed.astype(jnp.uint32))
    return (bits >= _dropout_threshold(dropout_rate)).astype(jnp.float32)


def _attn_fwd_kernel(
    seed_ref,
    q_ref,  # (G, block_q, dh)
    k_ref,  # (G, L, dh)
    v_ref,  # (G, L, dh)
    bias_ref,  # (bias_rows, block_q, L)
    out_ref,  # (G, block_q, dh)
    lse_ref,  # (G, 1, block_q)
    *,
    scale: float,
    dropout_rate: float,
    block_q: int,
    g_rows: int,
    bias_row_of: tp.Callable[[int], int],
):
    """One program handles ``g_rows`` batch*head rows of one q block.

    Grouping rows amortizes the per-program launch overhead that dominates at
    recsys shapes (L ~ 100, dh ~ 32: each row's matmuls are far smaller than
    one MXU pass) — measured 1.3x fwd+bwd win at B=512, H=4, L=100, dh=32 vs
    the one-row-per-program layout (benchmarks/attention_micro.py). Group
    sizes beyond ~16 hit the scoped-VMEM stack limit (see
    `_GROUP_VMEM_BUDGET`), which is why short-L dispatch still prefers the
    XLA path (`_prefer_xla_attention`).
    """
    i = pl.program_id(0)
    j = pl.program_id(1)
    for g in range(g_rows):  # static unroll
        q = q_ref[g]  # (block_q, dh)
        k = k_ref[g]  # (L, dh)
        v = v_ref[g]  # (L, dh)
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (block_q, L)
        s = s * scale + bias_ref[bias_row_of(g)]
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        if dropout_rate > 0.0:
            keep = dropout_keep_mask(
                seed_ref[0], i * g_rows + g, j * block_q, block_q, k.shape[0], dropout_rate
            )
            p = p * keep * (1.0 / (1.0 - dropout_rate))
        out = jnp.dot(p, v, preferred_element_type=jnp.float32) / denom
        out_ref[g] = out.astype(out_ref.dtype)
        lse_ref[g] = (m[:, 0] + jnp.log(denom[:, 0]))[None, :]


_GROUP_CANDIDATES = (16, 8, 4, 2, 1)
# Scoped-VMEM budget for one program: double-buffered window blocks PLUS the
# unrolled loop's stack temporaries (~10 live (block_q, L) f32/int32 tiles per
# unrolled row: scores, probabilities, dropout hash intermediates — Mosaic
# does not reuse stack across unrolled iterations; hardware scoped limit 16M).
_GROUP_VMEM_BUDGET = 12 * 1024 * 1024
_TEMP_TILES_PER_ROW = 10


def _bias_group_layout(bias_b: int, bias_h: int, h: int, g: int):
    """(bias_rows, block_row_index(i), bias_row_of(g)) for a G-row program.

    The flat bias array is (bias_b*bias_h, L, L); a program covers batch*head
    rows [i*G, (i+1)*G). Requires G % H == 0 or H % G == 0 when the bias is
    batch- or head-dependent (enforced by `_pick_group`).
    """
    if bias_b == 1 and bias_h == 1:
        return 1, lambda i: 0, lambda g_: 0
    if bias_b == 1:  # per-head bias, flat (H, L, L)
        if g % h == 0:
            return h, lambda i: 0, lambda g_: g_ % h
        return g, lambda i: i % (h // g), lambda g_: g_
    if bias_h == 1:  # per-batch bias, flat (B, L, L)
        if g % h == 0:
            return g // h, lambda i: i, lambda g_: g_ // h
        return 1, lambda i: i * g // h, lambda g_: 0
    return g, lambda i: i, lambda g_: g_  # full (B, H, L, L)


def _pick_group(bh: int, h: int, bias_b: int, bias_h: int, row_bytes: int, bias_block_bytes: int) -> int:
    """Largest group size whose resident blocks fit the VMEM budget."""
    for g in _GROUP_CANDIDATES:
        if bh % g:
            continue
        if (bias_b > 1 or bias_h > 1) and not (g % h == 0 or h % g == 0):
            continue
        bias_rows = _bias_group_layout(bias_b, bias_h, h, g)[0]
        if g * row_bytes + bias_rows * bias_block_bytes <= _GROUP_VMEM_BUDGET:
            return g
    return 1


def _pallas_attention(
    q: jnp.ndarray,  # (B, H, L, dh)
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray,  # (Bb, Hb, L, L), Bb in {1, B}, Hb in {1, H}
    seed: jnp.ndarray,  # (1,) int32
    scale: float,
    dropout_rate: float,
    block_q: int,
    interpret: bool = False,
) -> tp.Tuple[jnp.ndarray, jnp.ndarray]:
    b, h, l, dh = q.shape
    bh = b * h
    q3 = q.reshape(bh, l, dh)
    k3 = k.reshape(bh, l, dh)
    v3 = v.reshape(bh, l, dh)
    bias_b, bias_h = bias.shape[0], bias.shape[1]
    bias3 = bias.reshape(bias_b * bias_h, l, l)

    n_q_blocks = pl.cdiv(l, block_q)

    itemsize = jnp.dtype(q.dtype).itemsize
    block_bytes = (2 * block_q * dh) * itemsize + 2 * l * dh * itemsize  # q+out, k+v
    row_bytes = 2 * block_bytes + _TEMP_TILES_PER_ROW * block_q * l * 4
    g_rows = _pick_group(bh, h, bias_b, bias_h, row_bytes, block_q * l * 4)
    bias_rows, bias_block_index, bias_row_of = _bias_group_layout(bias_b, bias_h, h, g_rows)

    def bias_index(i, j, *_):
        return (bias_block_index(i), j, 0)

    out, lse = pl.pallas_call(
        partial(
            _attn_fwd_kernel,
            scale=scale,
            dropout_rate=dropout_rate,
            block_q=block_q,
            g_rows=g_rows,
            bias_row_of=bias_row_of,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bh // g_rows, n_q_blocks),
            in_specs=[
                pl.BlockSpec((g_rows, block_q, dh), lambda i, j, *_: (i, j, 0)),
                pl.BlockSpec((g_rows, l, dh), lambda i, j, *_: (i, 0, 0)),
                pl.BlockSpec((g_rows, l, dh), lambda i, j, *_: (i, 0, 0)),
                pl.BlockSpec((bias_rows, block_q, l), bias_index),
            ],
            out_specs=[
                pl.BlockSpec((g_rows, block_q, dh), lambda i, j, *_: (i, j, 0)),
                pl.BlockSpec((g_rows, 1, block_q), lambda i, j, *_: (i, 0, j)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((bh, l, dh), q.dtype),
            jax.ShapeDtypeStruct((bh, 1, l), jnp.float32),
        ],
        interpret=interpret,
    )(seed.astype(jnp.int32), q3, k3, v3, bias3)
    return out.reshape(b, h, l, dh), lse.reshape(b, h, l)


def _attn_bwd_kernel(
    seed_ref,
    q_ref,  # (G, block_q, dh) — this q block
    k_ref,  # (G, L, dh)
    v_ref,  # (G, L, dh)
    bias_ref,  # (bias_rows, block_q, L)
    lse_ref,  # (G, 1, block_q) — padded rows hold +inf-ish so p == 0 there
    delta_ref,  # (G, 1, block_q)
    do_ref,  # (G, block_q, dh)
    dq_ref,  # (G, block_q, dh)
    dk_ref,  # (G, L, dh) — accumulated over the q-block (minor) grid dim
    dv_ref,  # (G, L, dh) — accumulated likewise
    *,
    scale: float,
    dropout_rate: float,
    block_q: int,
    g_rows: int,
    bias_row_of: tp.Callable[[int], int],
):
    """Grid (n_groups, n_q): one program per (row group, q block). dk/dv
    blocks are indexed by the group only, so they stay VMEM-resident across
    the CONSECUTIVE q-block programs and accumulate there. Every VMEM block
    is O(block_q * L) or smaller — session length is unbounded in the
    backward (the old per-group q loop held full (L_pad, L) bias blocks and
    capped at L=1024). Row grouping amortizes program-launch overhead
    exactly as in the forward."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    inv_keep = 1.0 / (1.0 - dropout_rate) if dropout_rate > 0.0 else 1.0

    for g in range(g_rows):  # static unroll
        k = k_ref[g]  # (L, dh)
        v = v_ref[g]
        l_total = k.shape[0]

        @pl.when(j == 0)
        def _init(g=g):
            dk_ref[g] = jnp.zeros_like(dk_ref[g])
            dv_ref[g] = jnp.zeros_like(dv_ref[g])

        q_blk = q_ref[g]  # (block_q, dh)
        do_blk = do_ref[g]
        lse_blk = lse_ref[g, 0]
        delta_blk = delta_ref[g, 0]
        s = (
            jax.lax.dot_general(
                q_blk, k, dimension_numbers=(((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            * scale
            + bias_ref[bias_row_of(g)]
        )
        p = jnp.exp(s - lse_blk[:, None])  # normalized probs; 0 on padded rows
        dp = jax.lax.dot_general(
            do_blk, v, dimension_numbers=(((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if dropout_rate > 0.0:
            keep = dropout_keep_mask(
                seed_ref[0], i * g_rows + g, j * block_q, block_q, l_total, dropout_rate
            )
            p_dropped = p * keep * inv_keep
            dp = dp * keep * inv_keep
        else:
            p_dropped = p
        dv_ref[g] += jax.lax.dot_general(
            p_dropped, do_blk, dimension_numbers=(((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(dv_ref.dtype)
        ds = p * (dp - delta_blk[:, None])
        dq_ref[g] = (jnp.dot(ds, k, preferred_element_type=jnp.float32) * scale).astype(dq_ref.dtype)
        dk_ref[g] += (
            jax.lax.dot_general(
                ds, q_blk, dimension_numbers=(((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            * scale
        ).astype(dk_ref.dtype)


def _pallas_attention_bwd(
    q: jnp.ndarray,  # (B, H, L, dh)
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray,
    seed: jnp.ndarray,
    lse: jnp.ndarray,  # (B, H, L)
    delta: jnp.ndarray,  # (B, H, L)
    d_out: jnp.ndarray,
    scale: float,
    dropout_rate: float,
    block_q: int,
    interpret: bool = False,
) -> tp.Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    b, h, l, dh = q.shape
    bh = b * h
    block_q = min(block_q, l)
    n_q_blocks = pl.cdiv(l, block_q)
    l_pad = n_q_blocks * block_q

    q3 = q.reshape(bh, l, dh)
    k3 = k.reshape(bh, l, dh)
    v3 = v.reshape(bh, l, dh)
    do3 = d_out.reshape(bh, l, dh)
    lse3 = lse.reshape(bh, 1, l)
    delta3 = delta.reshape(bh, 1, l)
    bias_b, bias_h = bias.shape[0], bias.shape[1]
    bias3 = bias.reshape(bias_b * bias_h, l, l)
    if l_pad > l:
        pad = l_pad - l
        q3 = jnp.pad(q3, ((0, 0), (0, pad), (0, 0)))
        do3 = jnp.pad(do3, ((0, 0), (0, pad), (0, 0)))
        # padded rows: lse=+big makes exp(s - lse) vanish, so they contribute
        # nothing to dk/dv and their dq rows are discarded below
        lse3 = jnp.pad(lse3, ((0, 0), (0, 0), (0, pad)), constant_values=1e30)
        delta3 = jnp.pad(delta3, ((0, 0), (0, 0), (0, pad)))
        bias3 = jnp.pad(bias3, ((0, 0), (0, pad), (0, 0)))

    itemsize = jnp.dtype(q.dtype).itemsize
    # per group-row residents: k,v,dk,dv full-length + q,do,dq one q block
    block_bytes = (3 * block_q * dh + 4 * l * dh) * itemsize
    row_bytes = block_bytes + _TEMP_TILES_PER_ROW * block_q * l * 4
    g_rows = _pick_group(bh, h, bias_b, bias_h, row_bytes, block_q * l * 4)
    bias_rows, bias_block_index, bias_row_of = _bias_group_layout(bias_b, bias_h, h, g_rows)

    def bias_row_index(i, j, *_):
        return (bias_block_index(i), j, 0)

    dq, dk, dv = pl.pallas_call(
        partial(
            _attn_bwd_kernel,
            scale=scale,
            dropout_rate=dropout_rate,
            block_q=block_q,
            g_rows=g_rows,
            bias_row_of=bias_row_of,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bh // g_rows, n_q_blocks),
            in_specs=[
                pl.BlockSpec((g_rows, block_q, dh), lambda i, j, *_: (i, j, 0)),
                pl.BlockSpec((g_rows, l, dh), lambda i, j, *_: (i, 0, 0)),
                pl.BlockSpec((g_rows, l, dh), lambda i, j, *_: (i, 0, 0)),
                pl.BlockSpec((bias_rows, block_q, l), bias_row_index),
                pl.BlockSpec((g_rows, 1, block_q), lambda i, j, *_: (i, 0, j)),
                pl.BlockSpec((g_rows, 1, block_q), lambda i, j, *_: (i, 0, j)),
                pl.BlockSpec((g_rows, block_q, dh), lambda i, j, *_: (i, j, 0)),
            ],
            out_specs=[
                pl.BlockSpec((g_rows, block_q, dh), lambda i, j, *_: (i, j, 0)),
                pl.BlockSpec((g_rows, l, dh), lambda i, j, *_: (i, 0, 0)),
                pl.BlockSpec((g_rows, l, dh), lambda i, j, *_: (i, 0, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((bh, l_pad, dh), q.dtype),
            jax.ShapeDtypeStruct((bh, l, dh), k.dtype),
            jax.ShapeDtypeStruct((bh, l, dh), v.dtype),
        ],
        interpret=interpret,
    )(seed.astype(jnp.int32), q3, k3, v3, bias3, lse3, delta3, do3)
    return (
        dq[:, :l, :].reshape(b, h, l, dh),
        dk.reshape(b, h, l, dh),
        dv.reshape(b, h, l, dh),
    )


def _full_keep_mask(seed: jnp.ndarray, bh: int, l: int, dropout_rate: float) -> jnp.ndarray:
    """(bh, l, l) keep mask — the XLA-path equivalent of the in-kernel tiles."""
    return jax.vmap(
        lambda row: dropout_keep_mask(seed, row, jnp.int32(0), l, l, dropout_rate)
    )(jnp.arange(bh, dtype=jnp.int32))


def _reference_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray,
    scale: float,
    dropout_rate: float = 0.0,
    seed: tp.Optional[jnp.ndarray] = None,
) -> tp.Tuple[jnp.ndarray, jnp.ndarray]:
    """XLA-math path with identical semantics (and identical dropout bits).

    Scores and the softmax normalization stay f32; the probability tensor
    (and dropout mask) drop to the INPUT precision for the value
    contraction — under bf16 inputs this halves the (B, H, L, L) HBM
    traffic, which dominates this path at recsys shapes; under f32 inputs
    the cast is a no-op and the math is unchanged.
    """
    b, h, l, _ = q.shape
    # the (B, H, L, L) score buffer is STORED at the input precision (f32
    # accumulation inside the matmul; softmax statistics recomputed in f32
    # from the rounded scores) — under bf16 inputs this halves the dominant
    # HBM stream of this path; under f32 inputs every cast is a no-op
    s = (jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * scale + bias).astype(q.dtype)
    lse = jax.nn.logsumexp(s.astype(jnp.float32), axis=-1)
    p = jnp.exp(s.astype(jnp.float32) - lse[..., None]).astype(q.dtype)
    if dropout_rate > 0.0:
        keep = _full_keep_mask(seed, b * h, l, dropout_rate).reshape(b, h, l, l)
        p = p * (keep * (1.0 / (1.0 - dropout_rate))).astype(q.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", p, v, preferred_element_type=jnp.float32).astype(q.dtype)
    return out, lse


@partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def xla_attention(q, k, v, bias, seed, scale, dropout_rate):
    """`_reference_attention` under a recompute-based VJP.

    Plain autodiff through the XLA path saves ~4 score-sized (B, H, L, L)
    residuals per call between forward and backward; at L=100/B=512 those
    are 82 MB f32 each and the path is bandwidth-bound, not FLOP-bound.
    Recomputing scores and probabilities in the backward (one extra
    O(B*H*L^2*dh) matmul — trivial next to the traffic) keeps only
    (q, k, v, out, lse) live. Bias is treated as a constant mask (the
    Pallas dispatch already routes learnable-bias layers elsewhere).
    """
    out, _ = _reference_attention(q, k, v, bias, scale, dropout_rate, seed)
    return out


def _xla_attention_fwd(q, k, v, bias, seed, scale, dropout_rate):
    out, lse = _reference_attention(q, k, v, bias, scale, dropout_rate, seed)
    return out, (q, k, v, bias, seed, out, lse)


def _xla_attention_bwd(scale, dropout_rate, residuals, d_out):
    q, k, v, bias, seed, out, lse = residuals
    delta = jnp.sum(d_out.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    dq, dk, dv, _ = _xla_bwd_math(q, k, v, bias, seed, lse, delta, d_out, scale, dropout_rate)
    dseed = np.zeros(np.shape(seed), dtype=jax.dtypes.float0)
    return dq, dk, dv, jnp.zeros_like(bias), dseed


xla_attention.defvjp(_xla_attention_fwd, _xla_attention_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def fused_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray,
    seed: jnp.ndarray,  # (1,) int32 dropout seed (ignored when rate == 0)
    scale: float,
    dropout_rate: float = 0.0,
    block_q: int = DEFAULT_BLOCK_Q,
    interpret: bool = False,
    bias_has_grad: bool = True,
) -> jnp.ndarray:
    """Fused softmax attention: dropout(softmax(q k^T * scale + bias)) v.

    Shapes: q/k/v (B, H, L, dh); bias broadcastable (B|1, H|1, L, L).
    ``bias_has_grad=False`` skips the bias-cotangent recompute entirely —
    use it when the bias is a constant mask (every built-in training path);
    with the default True the bias gradient is exact but is computed by an
    XLA recompute that materializes (B, H, L, L) unless XLA dead-code
    eliminates it.
    """
    out, _ = _pallas_attention(q, k, v, bias, seed, scale, dropout_rate, min(block_q, q.shape[2]), interpret)
    return out


def _fused_attention_fwd(q, k, v, bias, seed, scale, dropout_rate, block_q, interpret, bias_has_grad):
    out, lse = _pallas_attention(q, k, v, bias, seed, scale, dropout_rate, min(block_q, q.shape[2]), interpret)
    return out, (q, k, v, bias, seed, out, lse)


def _xla_bwd_math(q, k, v, bias, seed, lse, delta, d_out, scale, dropout_rate):
    """Recompute-based backward in plain XLA (used beyond the VMEM budget and
    for bias gradients)."""
    b, h, l, _ = q.shape
    # every score-sized (B, H, L, L) intermediate is STORED at the input
    # precision (matmul accumulation and the elementwise chain stay f32);
    # halves this recompute's HBM traffic under bf16, no-op under f32
    s = (jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * scale + bias).astype(q.dtype)
    p = jnp.exp(s.astype(jnp.float32) - lse[..., None]).astype(q.dtype)
    dp = jnp.einsum("bhqd,bhkd->bhqk", d_out, v, preferred_element_type=jnp.float32).astype(q.dtype)
    if dropout_rate > 0.0:
        keep = _full_keep_mask(seed, b * h, l, dropout_rate).reshape(b, h, l, l)
        scaled_keep = (keep * (1.0 / (1.0 - dropout_rate))).astype(q.dtype)
        p_dropped = p * scaled_keep
        dp = dp * scaled_keep
    else:
        p_dropped = p
    ds = (p.astype(jnp.float32) * (dp.astype(jnp.float32) - delta[..., None])).astype(q.dtype)
    ds_op = ds
    dq = jnp.einsum("bhqk,bhkd->bhqd", ds_op, k, preferred_element_type=jnp.float32) * scale
    dk = jnp.einsum("bhqk,bhqd->bhkd", ds_op, q, preferred_element_type=jnp.float32) * scale
    dv = jnp.einsum("bhqk,bhqd->bhkd", p_dropped.astype(q.dtype), d_out, preferred_element_type=jnp.float32)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), ds


def _fused_attention_bwd(scale, dropout_rate, block_q, interpret, bias_has_grad, residuals, d_out):
    q, k, v, bias, seed, out, lse = residuals
    delta = jnp.sum(d_out.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)

    # the (groups, q-block) grid keeps every VMEM block O(block_q * L), so
    # the Pallas backward serves every session length the forward does
    dq, dk, dv = _pallas_attention_bwd(
        q, k, v, bias, seed, lse, delta, d_out, scale, dropout_rate, block_q, interpret
    )

    if bias_has_grad:
        # learnable-bias layers need the full score gradient; that is a
        # materialized (B, H, L, L) quantity by definition, so it comes from
        # the XLA recompute (opt-in path, not used by the mask-only default)
        *_unused, ds = _xla_bwd_math(q, k, v, bias, seed, lse, delta, d_out, scale, dropout_rate)
        db = ds.astype(jnp.float32)  # broadcast reductions accumulate in f32
        if bias.shape[0] == 1:
            db = db.sum(axis=0, keepdims=True)
        if bias.shape[1] == 1:
            db = db.sum(axis=1, keepdims=True)
        db = db.astype(bias.dtype)
    else:
        db = jnp.zeros_like(bias)
    dseed = np.zeros(np.shape(seed), dtype=jax.dtypes.float0)
    return dq, dk, dv, db, dseed


fused_attention.defvjp(_fused_attention_fwd, _fused_attention_bwd)


def _prefer_xla_attention(b: int, h: int, l: int) -> bool:
    """Shape dispatch between the Pallas kernel and the XLA-math path.

    Measured on v5e (benchmarks/attention_micro.py, fwd+bwd, f32): at recsys
    shapes the per-program launch overhead dominates the Pallas kernel —
    XLA wins 1.4-1.7x at L=100 even with row grouping (group sizes beyond
    ~16 exceed the scoped-VMEM stack), while the grouped kernel ties XLA at
    L=256 and wins 1.2-1.4x from L=512 up (and is the only option once the
    (B, H, L, L) score tensor stops fitting HBM comfortably). Both paths
    share the counter-hash dropout bits, so dispatch never changes training
    semantics.

    The byte cap is on the SCORE tensor, but the real budget is the XLA
    backward, which holds ~4-5 score-sized tensors live (scores, probs,
    dropout mask, d_probs, d_scores) per transformer block: at
    B=512, H=8, L=200 (655 MB scores) a 2-block train step exhausts 16 GB
    HBM even under remat, while the blockwise Pallas kernel runs it ~20%
    slower per call and never materializes (L, L). 512 MB keeps every
    measured XLA-faster config (KION 82 MB, ML-20M B=256 327 MB) on the
    XLA path and sends only the memory-bound shapes to Pallas.
    """
    score_bytes = b * h * l * l * 4
    return l < 256 and score_bytes <= (1 << 29)


def dot_product_attention(
    q: jnp.ndarray,  # (B, L, H, dh) — "BLHD" layout used by the MHA module
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: tp.Optional[jnp.ndarray],  # (B|1, 1|H, L, L) additive or None
    scale: float,
    use_fused: tp.Optional[bool] = None,
    dropout_rate: float = 0.0,
    dropout_seed: tp.Optional[jnp.ndarray] = None,
    bias_has_grad: bool = False,
) -> jnp.ndarray:
    """Attention entry point for the transformer stack.

    Picks the Pallas fused kernel on TPU (or when forced via ``use_fused``),
    the jnp path otherwise — same math and same dropout bits either way.
    Inputs/outputs use (B, L, H, dh) layout. Bias is treated as a constant
    mask by default (``bias_has_grad=False``); learnable-bias layers must
    opt in.
    """
    b, l, h, dh = q.shape
    if use_fused is None:
        use_fused = jax.default_backend() == "tpu" and not _prefer_xla_attention(b, h, l)
    if dropout_rate > 0.0 and dropout_seed is None:
        raise ValueError("dropout_rate > 0 requires a dropout_seed")
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    if bias is None:
        bias = jnp.zeros((1, 1, l, l), dtype=jnp.float32)
    seed = dropout_seed if dropout_seed is not None else jnp.zeros((1,), jnp.int32)
    if use_fused:
        out = fused_attention(qt, kt, vt, bias, seed, scale, dropout_rate, DEFAULT_BLOCK_Q, False, bias_has_grad)
    elif bias_has_grad:
        # learnable additive bias needs d(bias) = full score gradient; plain
        # autodiff provides it (the recompute VJP below treats bias as a mask)
        out, _ = _reference_attention(qt, kt, vt, bias, scale, dropout_rate, seed)
    else:
        out = xla_attention(qt, kt, vt, bias, seed, scale, dropout_rate)
    return out.transpose(0, 2, 1, 3)
