"""Fused STU (HSTU) attention kernels with a precomputed streamed bias.

HSTU's attention is pointwise-aggregated: SiLU(q k^T + rel_bias) / L with
multiplicative causal/timeline masking — no softmax (reference
rectools/models/nn/transformers/hstu.py:270-288). The reference materializes
the full (B, H, L, L) score tensor; the Pallas kernels here never do — the
(block_q, L) score tiles live only in VMEM, so session length is a config
knob and the kernels are the memory-safe path for shapes whose score tensor
will not fit HBM.

The combined relative bias (log-bucketed time deltas, hstu.py:88-114, plus
the Toeplitz positional bias, hstu.py:116-128) is PRECOMPUTED in XLA and
streamed into both kernels per tile. Computing it in-kernel was measured
VPU-bound (a per-bucket masked-accumulate loop cost 207 ms of a 216 ms
forward at B=64, H=4, L=1024); the XLA construction is gather/scatter-free
in both directions — `_bucket_bias` expresses the 129-entry table lookup as
a fused compare-and-reduce with a matching custom VJP, and `_toeplitz_bias`
builds the positional matrix from pad/tile/reshape ops whose autodiff
adjoint XLA derives without a scatter. The bias is head-shared, so it is
H× smaller than the score tensor it replaces.

The backward runs as two Pallas calls that recompute the (block_q, L)
score tiles from the streamed bias: a (rows, q-block) grid emits dq and
accumulates dk/dv in the consecutively-revisited per-row blocks, and a
(batch, q-block, heads) grid — heads minor — accumulates the head-summed
score gradient, from which the two tiny weight-table gradients are reduced
scatter-free in XLA. Every VMEM block is O(block_q * L), so session length
is unbounded in the backward too (the old one-program-per-row form held
full (L, L) mask/bias blocks and capped at L=512).

Dispatch (`stu_dot_product_attention`): the XLA twin (`_stu_reference`,
identical math — it IS the custom_vjp recompute) is preferred whenever the
(B, H, L, L) score tensor fits a 1 GiB budget, where it measures at least
as fast; the kernels take over beyond that.
"""

import typing as tp
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

DEFAULT_BLOCK_Q = 128


def _bucket(diff: jnp.ndarray, num_buckets: int) -> jnp.ndarray:
    """Log-bucketed |timestamp delta| (reference hstu.py:84-86)."""
    return jnp.clip(
        (jnp.log(jnp.maximum(jnp.abs(diff), 1).astype(jnp.float32)) / 0.301).astype(jnp.int32),
        0,
        num_buckets,
    )


@jax.custom_vjp
def _bucket_bias(tw: jnp.ndarray, buckets: jnp.ndarray) -> jnp.ndarray:
    """``tw[buckets]`` as a fused compare-and-reduce — TPU-sane in BOTH
    directions.

    TPU's gather unit is the wrong tool for a 5M-element lookup into a
    129-entry table (measured 45 ms at B=512, L=100), and autodiff turns the
    gather's backward into a serialized scatter-add (~87 ms). Expressing the
    lookup as ``sum_j tw[j] * [buckets == j]`` lets XLA fuse the virtual
    (B, L, L, n_buckets) one-hot into a VPU select+reduce: 3 ms forward, and
    the custom backward reduces the cotangent the same way. Exact, not
    approximate — the same sums in a hardware-friendly order.
    """
    oh = buckets[..., None] == jnp.arange(tw.shape[0], dtype=buckets.dtype)
    return jnp.where(oh, tw.astype(jnp.float32), 0.0).sum(axis=-1)


def _bucket_bias_fwd(tw, buckets):
    # (nb,)-shaped zeros carry both the table size and dtype through the
    # residuals (np.dtype objects are not valid JAX residual types)
    return _bucket_bias(tw, buckets), (buckets, jnp.zeros_like(tw))


def _bucket_bias_bwd(res, g):
    buckets, tw_like = res
    oh = buckets[..., None] == jnp.arange(tw_like.shape[0], dtype=buckets.dtype)
    axes = tuple(range(g.ndim))
    dtw = jnp.where(oh, g.astype(jnp.float32)[..., None], 0.0).sum(axis=axes)
    return dtw.astype(tw_like.dtype), None


_bucket_bias.defvjp(_bucket_bias_fwd, _bucket_bias_bwd)


def _stu_kernel(
    q_ref,  # (1, block_q, ad)
    k_ref,  # (1, L, ad)
    v_ref,  # (1, L, lh)
    tl_q_ref,  # (1, 1, block_q) timeline mask rows for this q block
    tl_k_ref,  # (1, 1, L) timeline mask
    allowed_ref,  # (1, block_q, L) multiplicative attention mask (0/1)
    bias_ref,  # (1, block_q, L) combined relative bias (time + pos), f32
    out_ref,  # (1, block_q, lh)
    *,
    l_total: int,
    block_q: int,
):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (block_q, L)

    # relative time+pos bias arrives PRECOMPUTED from XLA (the scatter-free
    # `_bucket_bias` compare-reduce + the Toeplitz pad/tile trick): the old
    # in-kernel per-bucket masked-accumulate loop was VPU-bound (measured
    # 207 ms forward at B=64, H=4, L=1024 vs ~9 ms without the time bias)
    s = s + bias_ref[0]

    a = jax.nn.silu(s) / l_total

    tl = tl_k_ref[0, 0]  # (L,)
    tl_q = tl_q_ref[0, 0]
    mask = allowed_ref[0] * tl_q[:, None] * tl[None, :]
    a = a * mask

    out_ref[0] = jnp.dot(a, v, preferred_element_type=jnp.float32).astype(out_ref.dtype)


def _toeplitz_bias(pos_weights: jnp.ndarray, l: int) -> jnp.ndarray:
    """(2L-1,) weights -> (L, L) Toeplitz bias w[k - q + L - 1] via the
    pad/tile trick (reference hstu.py:116-128): only pad/tile/reshape/slice
    ops, so both the construction AND its autodiff adjoint avoid TPU's
    gather/scatter units entirely."""
    t = jnp.pad(pos_weights[: 2 * l - 1].astype(jnp.float32), (0, l))
    t = jnp.tile(t, l)[:-l].reshape(l, 3 * l - 2)
    r = (2 * l - 1) // 2
    return t[:, r : t.shape[1] - r]


def _combined_bias(
    ts: jnp.ndarray,  # (B, L + 2) int32
    time_weights: jnp.ndarray,
    pos_weights: jnp.ndarray,
    l: int,
    num_buckets: int,
    use_time: bool,
    use_pos: bool,
) -> tp.Tuple[jnp.ndarray, bool]:
    """Combined relative bias for the kernels: ((B or 1), L, L) f32 plus a
    flag saying whether it varies per batch row."""
    if use_time:
        buckets = _bucket(ts[:, 1 : l + 1, None] - ts[:, None, :l], num_buckets)
        bias = _bucket_bias(time_weights, buckets)  # (B, L, L)
        if use_pos:
            bias = bias + _toeplitz_bias(pos_weights, l)[None]
        return bias, True
    if use_pos:
        return _toeplitz_bias(pos_weights, l)[None], False
    return jnp.zeros((1, l, l), jnp.float32), False


def _stu_pallas(
    q: jnp.ndarray,  # (B, H, L, ad)
    k: jnp.ndarray,
    v: jnp.ndarray,  # (B, H, L, lh)
    ts: jnp.ndarray,  # (B, L + 2) int32
    timeline: jnp.ndarray,  # (B, L) float32
    time_weights: jnp.ndarray,  # (nb + 1,)
    pos_weights: jnp.ndarray,  # (2L - 1,)
    allowed: jnp.ndarray,  # (1, L, L) multiplicative mask, shared across batch
    num_buckets: int,
    use_time: bool,
    use_pos: bool,
    block_q: int,
    interpret: bool = False,
) -> jnp.ndarray:
    b, h, l, ad = q.shape
    lh = v.shape[-1]
    bh = b * h
    block_q = min(block_q, l)
    n_q = pl.cdiv(l, block_q)

    q3 = q.reshape(bh, l, ad)
    k3 = k.reshape(bh, l, ad)
    v3 = v.reshape(bh, l, lh)
    # pad L up to a block_q multiple so q-window blocks tile evenly
    l_padded = n_q * block_q
    tl_q = timeline
    if l_padded > l:
        tl_q = jnp.pad(timeline, ((0, 0), (0, l_padded - l)))
    tl_q3 = tl_q[:, None, :]
    tl_k3 = timeline[:, None, :]

    bias, bias_per_batch = _combined_bias(ts, time_weights, pos_weights, l, num_buckets, use_time, use_pos)
    if l_padded > l:
        bias = jnp.pad(bias, ((0, 0), (0, l_padded - l), (0, 0)))
    if bias_per_batch:
        bias_index = lambda i, j: (i // h, j, 0)  # noqa: E731
    else:
        bias_index = lambda i, j: (0, j, 0)  # noqa: E731

    out = pl.pallas_call(
        partial(_stu_kernel, l_total=l, block_q=block_q),
        grid=(bh, n_q),
        in_specs=[
            pl.BlockSpec((1, block_q, ad), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, l, ad), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, l, lh), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, block_q), lambda i, j: (i // h, 0, j)),
            pl.BlockSpec((1, 1, l), lambda i, j: (i // h, 0, 0)),
            pl.BlockSpec((1, block_q, l), lambda i, j: (0, j, 0)),
            pl.BlockSpec((1, block_q, l), bias_index),
        ],
        out_specs=pl.BlockSpec((1, block_q, lh), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, l, lh), q.dtype),
        interpret=interpret,
    )(q3, k3, v3, tl_q3, tl_k3, allowed.astype(jnp.float32), bias)
    return out.reshape(b, h, l, lh)


def _stu_reference(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    ts: jnp.ndarray,
    timeline: jnp.ndarray,
    time_weights: jnp.ndarray,
    pos_weights: jnp.ndarray,
    allowed: jnp.ndarray,
    num_buckets: int,
    use_time: bool,
    use_pos: bool,
) -> jnp.ndarray:
    """XLA-math path (used on CPU and as custom_vjp backward recompute).

    The score pipeline runs at the INPUT precision after the f32 score
    accumulation + bias add: under bf16 compute the (B, H, L, L) silu/mask
    streams (and the autodiff residuals carried to the backward) halve —
    they dominate this path's HBM traffic at long L. f32 inputs keep the
    exact f32 pipeline.
    """
    b, h, l, _ = q.shape
    work = q.dtype if q.dtype == jnp.bfloat16 else jnp.float32
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    if use_time:
        t_q = ts[:, 1 : l + 1]
        t_k = ts[:, :l]
        buckets = _bucket(t_q[:, :, None] - t_k[:, None, :], num_buckets)
        s = s + _bucket_bias(time_weights, buckets)[:, None, :, :]
    if use_pos:
        # pad/tile Toeplitz construction: forward AND autodiff adjoint stay
        # off TPU's gather/scatter units (the rel_idx gather's backward is a
        # (L*L -> 2L-1) scatter that XLA serializes)
        s = s + _toeplitz_bias(pos_weights, l)[None, None, :, :]
    a = jax.nn.silu(s.astype(work)) / l
    mask = allowed.astype(work)[None] * (timeline[:, None, :, None] * timeline[:, None, None, :]).astype(work)
    a = a * mask
    return jnp.einsum("bhqk,bhkd->bhqd", a, v, preferred_element_type=jnp.float32).astype(q.dtype)


def _stu_score_grad_tile(q_blk, k, do_blk, v, tl_q, tl_k, allowed_blk, bias_blk, l_total):
    """Recompute one (block_q, L) score tile and return (a, ds)."""
    s = jax.lax.dot_general(
        q_blk, k, dimension_numbers=(((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = s + bias_blk
    sig = jax.nn.sigmoid(s)
    mask = allowed_blk * tl_q[:, None] * tl_k[None, :]
    a = (s * sig) * (mask / l_total)
    da = jax.lax.dot_general(
        do_blk, v, dimension_numbers=(((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = (da * mask / l_total) * (sig * (1.0 + s * (1.0 - sig)))
    return a, ds


def _stu_bwd_kernel(
    q_ref,  # (1, block_q, ad) — this q block
    k_ref,  # (1, L, ad)
    v_ref,  # (1, L, lh)
    do_ref,  # (1, block_q, lh)
    tl_q_ref,  # (1, 1, block_q) — padded rows hold 0, killing their gradient
    tl_k_ref,  # (1, 1, L)
    allowed_ref,  # (1, block_q, L)
    bias_ref,  # (1, block_q, L) combined PRECOMPUTED relative bias (time + pos)
    dq_ref,  # (1, block_q, ad)
    dk_ref,  # (1, L, ad) — accumulated over the q-block (minor) grid dim
    dv_ref,  # (1, L, lh) — accumulated likewise
    *,
    l_total: int,
):
    """Grid (bh, n_q): one program per (batch*head row, q block). dk/dv
    blocks are indexed by the row only, so they stay VMEM-resident across
    the CONSECUTIVE q-block programs and accumulate there; every VMEM block
    is O(block_q * L) or smaller, so session length is unbounded by VMEM
    (the old single-program-per-row form held full (L_pad, L) mask/bias
    blocks and stopped fitting past L=512)."""
    j = pl.program_id(1)
    k = k_ref[0]
    v = v_ref[0]

    @pl.when(j == 0)
    def _init():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    a, ds = _stu_score_grad_tile(
        q_ref[0], k, do_ref[0], v, tl_q_ref[0, 0], tl_k_ref[0, 0], allowed_ref[0], bias_ref[0], l_total
    )
    dv_ref[0] += jax.lax.dot_general(
        a, do_ref[0], dimension_numbers=(((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dv_ref.dtype)
    dq_ref[0] = jnp.dot(ds, k, preferred_element_type=jnp.float32).astype(dq_ref.dtype)
    dk_ref[0] += jax.lax.dot_general(
        ds, q_ref[0], dimension_numbers=(((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dk_ref.dtype)


def _stu_ds_kernel(
    q_ref,  # (1, block_q, ad)
    k_ref,  # (1, L, ad)
    v_ref,  # (1, L, lh)
    do_ref,  # (1, block_q, lh)
    tl_q_ref,  # (1, 1, block_q)
    tl_k_ref,  # (1, 1, L)
    allowed_ref,  # (1, block_q, L)
    bias_ref,  # (1, block_q, L)
    ds_bsum_ref,  # (1, block_q, L): score grads summed over heads
    *,
    l_total: int,
):
    """Grid (b, n_q, h) with heads MINOR: the (b, q-block) output block stays
    VMEM-resident across the consecutive head programs and accumulates the
    head-summed score gradient (needed only for the two bias-table grads).
    Recomputes the score tile a second time — two extra MXU passes buy
    strictly consecutive output revisits, which is the only accumulation
    pattern Pallas TPU guarantees."""
    hh = pl.program_id(2)

    @pl.when(hh == 0)
    def _init():
        ds_bsum_ref[0] = jnp.zeros_like(ds_bsum_ref[0])

    _, ds = _stu_score_grad_tile(
        q_ref[0], k_ref[0], do_ref[0], v_ref[0], tl_q_ref[0, 0], tl_k_ref[0, 0],
        allowed_ref[0], bias_ref[0], l_total,
    )
    ds_bsum_ref[0] += ds


def _stu_pallas_bwd(
    q: jnp.ndarray,  # (B, H, L, ad)
    k: jnp.ndarray,
    v: jnp.ndarray,  # (B, H, L, lh)
    ts: jnp.ndarray,  # (B, L + 2) int32
    timeline: jnp.ndarray,  # (B, L)
    time_weights: jnp.ndarray,
    pos_weights: jnp.ndarray,
    allowed: jnp.ndarray,  # (1, L, L)
    d_out: jnp.ndarray,
    num_buckets: int,
    use_time: bool,
    use_pos: bool,
    block_q: int,
    interpret: bool = False,
) -> tp.Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    b, h, l, ad = q.shape
    lh = v.shape[-1]
    bh = b * h
    block_q = min(block_q, l)
    n_q = pl.cdiv(l, block_q)
    l_pad = n_q * block_q
    track_ds = use_time or use_pos

    def pad_rows(x: jnp.ndarray, axis: int) -> jnp.ndarray:
        if l_pad == l:
            return x
        widths = [(0, 0)] * x.ndim
        widths[axis] = (0, l_pad - l)
        return jnp.pad(x, widths)

    q3 = pad_rows(q.reshape(bh, l, ad), 1)
    do3 = pad_rows(d_out.reshape(bh, l, lh), 1)
    k3 = k.reshape(bh, l, ad)
    v3 = v.reshape(bh, l, lh)
    tl_q3 = pad_rows(timeline, 1)[:, None, :]
    tl_k3 = timeline[:, None, :]
    allowed3 = pad_rows(allowed.astype(jnp.float32), 1)

    bias, bias_per_batch = _combined_bias(ts, time_weights, pos_weights, l, num_buckets, use_time, use_pos)
    bias = pad_rows(bias, 1)

    dq, dk, dv = pl.pallas_call(
        partial(_stu_bwd_kernel, l_total=l),
        grid=(bh, n_q),
        in_specs=[
            pl.BlockSpec((1, block_q, ad), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, l, ad), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, l, lh), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, block_q, lh), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, 1, block_q), lambda i, j: (i // h, 0, j)),
            pl.BlockSpec((1, 1, l), lambda i, j: (i // h, 0, 0)),
            pl.BlockSpec((1, block_q, l), lambda i, j: (0, j, 0)),
            pl.BlockSpec(
                (1, block_q, l),
                (lambda i, j: (i // h, j, 0)) if bias_per_batch else (lambda i, j: (0, j, 0)),
            ),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, ad), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, l, ad), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, l, lh), lambda i, j: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, l_pad, ad), q.dtype),
            jax.ShapeDtypeStruct((bh, l, ad), k.dtype),
            jax.ShapeDtypeStruct((bh, l, lh), v.dtype),
        ],
        interpret=interpret,
    )(q3, k3, v3, do3, tl_q3, tl_k3, allowed3, bias)

    dq = dq[:, :l, :].reshape(b, h, l, ad)
    dk = dk.reshape(b, h, l, ad)
    dv = dv.reshape(b, h, l, lh)

    dtw = jnp.zeros_like(time_weights)
    dpw = jnp.zeros_like(pos_weights)
    if track_ds:
        # second pass, heads minor: head-summed score gradient for the two
        # bias tables, accumulated in the consecutively-revisited (b, j) block
        ds_bsum = pl.pallas_call(
            partial(_stu_ds_kernel, l_total=l),
            grid=(b, n_q, h),
            in_specs=[
                pl.BlockSpec((1, block_q, ad), lambda bi, j, hh: (bi * h + hh, j, 0)),
                pl.BlockSpec((1, l, ad), lambda bi, j, hh: (bi * h + hh, 0, 0)),
                pl.BlockSpec((1, l, lh), lambda bi, j, hh: (bi * h + hh, 0, 0)),
                pl.BlockSpec((1, block_q, lh), lambda bi, j, hh: (bi * h + hh, j, 0)),
                pl.BlockSpec((1, 1, block_q), lambda bi, j, hh: (bi, 0, j)),
                pl.BlockSpec((1, 1, l), lambda bi, j, hh: (bi, 0, 0)),
                pl.BlockSpec((1, block_q, l), lambda bi, j, hh: (0, j, 0)),
                pl.BlockSpec(
                    (1, block_q, l),
                    (lambda bi, j, hh: (bi, j, 0)) if bias_per_batch else (lambda bi, j, hh: (0, j, 0)),
                ),
            ],
            out_specs=pl.BlockSpec((1, block_q, l), lambda bi, j, hh: (bi, j, 0)),
            out_shape=jax.ShapeDtypeStruct((b, l_pad, l), jnp.float32),
            interpret=interpret,
        )(q3, k3, v3, do3, tl_q3, tl_k3, allowed3, bias)[:, :l, :]
        if use_time:
            # scatter-free table gradient: same compare-and-reduce as
            # `_bucket_bias`'s custom VJP (segment_sum serializes on TPU)
            buckets = _bucket(ts[:, 1 : l + 1, None] - ts[:, None, :l], num_buckets)
            dtw = _bucket_bias_bwd((buckets, jnp.zeros_like(time_weights)), ds_bsum)[0]
        if use_pos:
            # adjoint of the pad/tile Toeplitz construction: XLA derives it
            # from pad/tile/reshape/slice — no scatter anywhere
            _, toeplitz_vjp = jax.vjp(lambda pw: _toeplitz_bias(pw, l), pos_weights)
            dpw = toeplitz_vjp(ds_bsum.sum(axis=0))[0].astype(pos_weights.dtype)
    return dq, dk, dv, dtw, dpw


@partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12))
def stu_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    ts: jnp.ndarray,
    timeline: jnp.ndarray,
    allowed: jnp.ndarray,
    time_weights: jnp.ndarray,
    pos_weights: jnp.ndarray,
    num_buckets: int,
    use_time: bool,
    use_pos: bool,
    block_q: int = DEFAULT_BLOCK_Q,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused HSTU attention; see module docstring for semantics."""
    return _stu_pallas(
        q, k, v, ts, timeline, time_weights, pos_weights, allowed,
        num_buckets, use_time, use_pos, block_q, interpret,
    )


def _stu_fwd(
    q, k, v, ts, timeline, allowed, time_weights, pos_weights, num_buckets, use_time, use_pos, block_q, interpret
):
    out = _stu_pallas(
        q, k, v, ts, timeline, time_weights, pos_weights, allowed,
        num_buckets, use_time, use_pos, block_q, interpret,
    )
    return out, (q, k, v, ts, timeline, allowed, time_weights, pos_weights)


def _stu_bwd(num_buckets, use_time, use_pos, block_q, interpret, residuals, d_out):
    q, k, v, ts, timeline, allowed, time_weights, pos_weights = residuals
    # the Pallas backward's VMEM blocks are O(block_q * L), so it serves
    # every session length the forward does (no XLA-recompute fallback)
    dq, dk, dv, dtw, dpw = _stu_pallas_bwd(
        q, k, v, ts, timeline, time_weights, pos_weights, allowed, d_out,
        num_buckets, use_time, use_pos, block_q, interpret,
    )
    return dq, dk, dv, jnp.zeros_like(ts), jnp.zeros_like(timeline), jnp.zeros_like(allowed), dtw, dpw


stu_attention.defvjp(_stu_fwd, _stu_bwd)


def stu_dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    ts: tp.Optional[jnp.ndarray],
    timeline: jnp.ndarray,
    allowed: jnp.ndarray,  # (L, L) or (1, L, L) multiplicative mask
    time_weights: tp.Optional[jnp.ndarray],
    pos_weights: tp.Optional[jnp.ndarray],
    num_buckets: int,
    use_fused: tp.Optional[bool] = None,
) -> jnp.ndarray:
    """Dispatching STU attention entry point.

    ``ts`` / ``time_weights`` / ``pos_weights`` may be None when the
    corresponding bias is disabled. ``allowed`` is batch-independent (causal
    or any static pattern); batch-dependent masks must use the layer's
    materialized fallback path.
    """
    b, h, l, _ = q.shape
    if use_fused is None:
        # Shape dispatch, measured on v5e: the XLA twin (same math — it IS
        # the custom_vjp recompute — with the scatter-free `_bucket_bias`
        # lookup) beats the Pallas kernel at every shape that fits memory:
        # KION B=512/L=100 ~15 ms step vs 269 ms fused; B=64/H=4/L=1024
        # fwd+bwd 52 ms vs 164 ms (the kernel's per-bucket masked-accumulate
        # loop is VPU-bound). The Pallas kernel remains the fallback for
        # shapes whose (B, H, L, L) score tensor would not fit HBM — there
        # it is the only option, since it never materializes (L, L).
        score_bytes = b * h * l * l * 4
        use_fused = jax.default_backend() == "tpu" and score_bytes > (1 << 30)
    use_time = time_weights is not None
    use_pos = pos_weights is not None
    if ts is None:
        ts = jnp.zeros((b, l + 2), dtype=jnp.int32)
    else:
        ts = ts.astype(jnp.int32)
    if allowed.ndim == 2:
        allowed = allowed[None]
    tw = time_weights if use_time else jnp.zeros((num_buckets + 1,), jnp.float32)
    pw = pos_weights if use_pos else jnp.zeros((2 * l - 1,), jnp.float32)
    if use_fused:
        # Mosaic only supports minor-dim insertion (the kernels' tl[:, None]
        # broadcasts) for 32-bit types: under bf16 compute the timeline /
        # allowed masks arrive bf16 and must enter the kernel as f32.
        timeline = timeline.astype(jnp.float32)
        allowed = allowed.astype(jnp.float32)
        return stu_attention(q, k, v, ts, timeline, allowed, tw, pw, num_buckets, use_time, use_pos)
    return _stu_reference(q, k, v, ts, timeline, tw, pw, allowed[0], num_buckets, use_time, use_pos)
