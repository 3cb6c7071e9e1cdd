"""Fused attention kernel (Pallas) with additive bias.

The transformer stack's hot op. The reference computes dense O(L^2) attention
through torch MHA (rectools/models/nn/transformers/torch_backbone.py:249-259);
here the whole per-head attention — scores, additive bias (causal/key-padding
masks and HSTU-style relative biases are all additive float biases in this
framework), softmax, and the value contraction — runs in one Pallas kernel:
q blocks stream through VMEM while K/V stay resident, so the (L, L) score
matrix never round-trips to HBM. Sessions are short (L ~ 100-1000 padded to
lane multiples), so K/V fit VMEM comfortably and blockwise-q fusion is the
speed-of-light layout; the q-block loop also makes long-session scaling a
config knob (SURVEY.md §5 long-context note).

Backward runs as standard XLA einsum math reusing the forward's logsumexp
(memory is dominated by activations elsewhere; fusing the backward too is a
further optimization, not a correctness need).

Dispatch: `dot_product_attention` uses the Pallas kernel on TPU when there is
no attention-probability dropout; otherwise (CPU tests, prob-dropout training)
it falls back to the jnp path with identical semantics.
"""

import typing as tp
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 128


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, out_ref, lse_ref, *, scale: float):
    """One (batch*head, q-block) program: fused scores+bias+softmax+PV."""
    q = q_ref[0]  # (block_q, dh)
    k = k_ref[0]  # (L, dh)
    v = v_ref[0]  # (L, dh)
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (block_q, L)
    s = s * scale + bias_ref[0]
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    out = jnp.dot(p, v, preferred_element_type=jnp.float32) / denom
    out_ref[0] = out.astype(out_ref.dtype)
    lse_ref[0] = (m[:, 0] + jnp.log(denom[:, 0]))[None, :]


def _pallas_attention(
    q: jnp.ndarray,  # (B, H, L, dh)
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray,  # (Bb, Hb, L, L), Bb in {1, B}, Hb in {1, H}
    scale: float,
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

    def bias_index(i, j):
        # broadcast over batch and/or head without materializing
        if bias_b == 1 and bias_h == 1:
            return (0, j, 0)
        if bias_b == 1:
            return (i % h, j, 0)  # bias is (1, H, L, L) -> flat (H, L, L)
        if bias_h == 1:
            return (i // h, j, 0)  # bias is (B, 1, L, L) -> flat (B, L, L)
        return (i, j, 0)

    out, lse = pl.pallas_call(
        partial(_attn_kernel, scale=scale),
        grid=(bh, n_q_blocks),
        in_specs=[
            pl.BlockSpec((1, block_q, dh), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, l, dh), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, l, dh), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, block_q, l), bias_index),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, dh), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, 1, block_q), lambda i, j: (i, 0, j)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, l, dh), q.dtype),
            jax.ShapeDtypeStruct((bh, 1, l), jnp.float32),
        ],
        interpret=interpret,
    )(q3, k3, v3, bias3)
    return out.reshape(b, h, l, dh), lse.reshape(b, h, l)


def _reference_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, bias: jnp.ndarray, scale: float
) -> tp.Tuple[jnp.ndarray, jnp.ndarray]:
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * scale + bias
    lse = jax.nn.logsumexp(s, axis=-1)
    p = jnp.exp(s - lse[..., None])
    out = jnp.einsum("bhqk,bhkd->bhqd", p, v, preferred_element_type=jnp.float32).astype(q.dtype)
    return out, lse


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def fused_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray,
    scale: float,
    block_q: int = DEFAULT_BLOCK_Q,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused softmax attention: softmax(q k^T * scale + bias) v.

    Shapes: q/k/v (B, H, L, dh); bias broadcastable (B|1, H|1, L, L).
    """
    out, _ = _pallas_attention(q, k, v, bias, scale, min(block_q, q.shape[2]), interpret)
    return out


def _fused_attention_fwd(q, k, v, bias, scale, block_q, interpret):
    out, lse = _pallas_attention(q, k, v, bias, scale, min(block_q, q.shape[2]), interpret)
    return out, (q, k, v, bias, out, lse)


def _fused_attention_bwd(scale, block_q, interpret, residuals, d_out):
    q, k, v, bias, out, lse = residuals
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * scale + bias
    p = jnp.exp(s - lse[..., None])
    dv = jnp.einsum("bhqk,bhqd->bhkd", p, d_out, preferred_element_type=jnp.float32)
    dp = jnp.einsum("bhqd,bhkd->bhqk", d_out, v, preferred_element_type=jnp.float32)
    delta = jnp.sum(d_out * out, axis=-1, keepdims=True)
    ds = p * (dp - delta)
    dq = jnp.einsum("bhqk,bhkd->bhqd", ds, k, preferred_element_type=jnp.float32) * scale
    dk = jnp.einsum("bhqk,bhqd->bhkd", ds, q, preferred_element_type=jnp.float32) * scale
    # reduce over broadcast axes of bias
    db = ds
    if bias.shape[0] == 1:
        db = db.sum(axis=0, keepdims=True)
    if bias.shape[1] == 1:
        db = db.sum(axis=1, keepdims=True)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), db.astype(bias.dtype)


fused_attention.defvjp(_fused_attention_fwd, _fused_attention_bwd)


def dot_product_attention(
    q: jnp.ndarray,  # (B, L, H, dh) — "BLHD" layout used by the MHA module
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: tp.Optional[jnp.ndarray],  # (B|1, 1|H, L, L) additive or None
    scale: float,
    use_fused: tp.Optional[bool] = None,
) -> jnp.ndarray:
    """Attention entry point for the transformer stack.

    Picks the Pallas fused kernel on TPU (or when forced via ``use_fused``),
    the jnp path otherwise. Inputs/outputs use (B, L, H, dh) layout.
    """
    b, l, h, dh = q.shape
    if use_fused is None:
        use_fused = jax.default_backend() == "tpu"
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    if bias is None:
        bias = jnp.zeros((1, 1, l, l), dtype=jnp.float32)
    if use_fused:
        out = fused_attention(qt, kt, vt, bias, scale)
    else:
        out, _ = _reference_attention(qt, kt, vt, bias, scale)
    return out.transpose(0, 2, 1, 3)
