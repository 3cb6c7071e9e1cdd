"""Fused LayerNorm (Pallas) — one kernel per direction instead of XLA's split.

The towers micro-bench (benchmarks/towers_micro.py) measured 5 LayerNorms at
3.1 ms fwd+bwd per KION train step — ~3x their HBM-traffic bound — because
XLA splits the backward into several reduction kernels that re-stream the
(M, D) activations. Here the forward is one pass (row mean/var via lane
reductions, normalize, affine) and the backward is one pass per m-block that
recomputes the row statistics in-register (cheaper than saving them) and
accumulates dgamma/dbeta in a VMEM-resident block revisited consecutively
across the whole grid.

Math follows flax ``nn.LayerNorm`` (reductions in f32, output cast back to
the input dtype) so the module swap is numerically inert; reference behavior
for the transformer stacks is pinned by tests/parity against the reference's
own torch layers (rectools/models/nn/transformers/net_blocks.py:119-130).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

DEFAULT_BLOCK_M = 1024


def _fwd_kernel(x_ref, g_ref, b_ref, y_ref, *, eps: float):
    x = x_ref[...].astype(jnp.float32)
    mu = jnp.mean(x, axis=1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps) * g_ref[0][None, :] + b_ref[0][None, :]
    y_ref[...] = y.astype(y_ref.dtype)


def _bwd_kernel(x_ref, g_ref, dy_ref, dx_ref, dg_ref, db_ref, *, eps: float):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dg_ref[...] = jnp.zeros_like(dg_ref[...])
        db_ref[...] = jnp.zeros_like(db_ref[...])

    x = x_ref[...].astype(jnp.float32)
    dy = dy_ref[...].astype(jnp.float32)
    mu = jnp.mean(x, axis=1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = xc * rstd

    dg_ref[...] += jnp.sum(dy * xhat, axis=0)[None, :]
    db_ref[...] += jnp.sum(dy, axis=0)[None, :]

    dxhat = dy * g_ref[0][None, :]
    m1 = jnp.mean(dxhat, axis=1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=1, keepdims=True)
    dx_ref[...] = (rstd * (dxhat - m1 - xhat * m2)).astype(dx_ref.dtype)


def _pad_rows(x: jnp.ndarray, multiple: int) -> jnp.ndarray:
    rows = x.shape[0]
    target = -(-rows // multiple) * multiple
    if target == rows:
        return x
    return jnp.pad(x, ((0, target - rows), (0, 0)))


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_layer_norm(
    x: jnp.ndarray,  # (M, D)
    gamma: jnp.ndarray,  # (D,)
    beta: jnp.ndarray,  # (D,)
    eps: float = 1e-6,
    block_m: int = DEFAULT_BLOCK_M,
    interpret: bool = False,
) -> jnp.ndarray:
    """LayerNorm over the last axis of a 2-D input, Pallas fwd+bwd."""
    return _fwd_call(x, gamma, beta, eps, block_m, interpret)


def _fwd_call(x, gamma, beta, eps, block_m, interpret):
    m_rows, d = x.shape
    block_m = min(block_m, -(-m_rows // 8) * 8)
    x_pad = _pad_rows(x, block_m)
    n_m = x_pad.shape[0] // block_m
    y = pl.pallas_call(
        partial(_fwd_kernel, eps=eps),
        grid=(n_m,),
        in_specs=[
            pl.BlockSpec((block_m, d), lambda i: (i, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_m, d), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct(x_pad.shape, x.dtype),
        interpret=interpret,
    )(x_pad, gamma.reshape(1, d).astype(jnp.float32), beta.reshape(1, d).astype(jnp.float32))
    return y[:m_rows]


def _fln_fwd(x, gamma, beta, eps, block_m, interpret):
    return _fwd_call(x, gamma, beta, eps, block_m, interpret), (x, gamma)


def _fln_bwd(eps, block_m, interpret, residuals, dy):
    x, gamma = residuals
    m_rows, d = x.shape
    block_m = min(block_m, -(-m_rows // 8) * 8)
    x_pad = _pad_rows(x, block_m)
    dy_pad = _pad_rows(dy, block_m)  # zero rows contribute nothing to dg/db
    n_m = x_pad.shape[0] // block_m
    dx, dg, db = pl.pallas_call(
        partial(_bwd_kernel, eps=eps),
        grid=(n_m,),
        in_specs=[
            pl.BlockSpec((block_m, d), lambda i: (i, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
            pl.BlockSpec((block_m, d), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((block_m, d), lambda i: (i, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(x_pad.shape, x.dtype),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
        ],
        interpret=interpret,
    )(x_pad, gamma.reshape(1, d).astype(jnp.float32), dy_pad)
    return dx[:m_rows], dg[0].astype(gamma.dtype), db[0].astype(gamma.dtype)


fused_layer_norm.defvjp(_fln_fwd, _fln_bwd)


def reference_layer_norm(x: jnp.ndarray, gamma: jnp.ndarray, beta: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """XLA-math twin (flax nn.LayerNorm semantics) for CPU/testing."""
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps) * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    return y.astype(x.dtype)
