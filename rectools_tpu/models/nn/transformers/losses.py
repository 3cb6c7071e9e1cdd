"""Training losses for sequential transformers.

Pure jnp functions; math follows reference
rectools/models/nn/transformers/lightning.py:144-212 exactly:

- softmax: CE over full catalog, pad target (id 0) ignored, weighted by yw,
  normalized by the count of contributing positions.
- BCE: positive at candidate index 0 vs n negatives.
- gBCE: gSASRec calibration of the positive logit (arXiv 2308.07192) then BCE.
- sampled_softmax: positive swapped to index 1, CE with pad-ignore.
"""

import typing as tp
from functools import partial

import jax
import jax.numpy as jnp

# (block_m, chunk_n) the streaming-lse CE uses, by feature width and dtype:
# (512, 4096) swept fastest end-to-end with the partials fwd kernel on v5e
# at BOTH d=128 (45.8k vs 44.2k ex/s at (256, 4096)) and d=256 (9.86k vs
# 9.23k at the old (512, 2048) default) — median-of-5, PERF_r04. Under f32
# inputs the probability/select tiles double and (512, 4096) exceeds the
# 16 MB scoped-VMEM stack, so f32 keeps the smaller known-fitting blocks.
_NARROW_D_TILING = (512, 4096)
_NARROW_D_TILING_F32 = (256, 4096)
_WIDE_D_TILING = (512, 4096)


def softmax_loss(logits: jnp.ndarray, y: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """CE over catalog. logits (B, L, N); y (B, L) int targets; w (B, L) weights.

    Positions with y == 0 (PAD) are excluded; loss = sum(w * CE) / count of
    positions with nonzero contribution (reference lightning.py:145-162).
    """
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(logprobs, y[..., None], axis=-1)[..., 0]  # (B, L)
    ce = jnp.where(y == 0, 0.0, ce)
    loss = ce * w
    n = (loss > 0).astype(loss.dtype)
    return jnp.sum(loss) / jnp.maximum(jnp.sum(n), 1.0)


def bce_loss(logits: jnp.ndarray, y: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """BCE vs 1 positive (index 0) + negatives. logits (B, L, 1 + n_neg)
    (reference lightning.py:188-199)."""
    mask = (y != 0).astype(logits.dtype)
    target = jnp.zeros_like(logits).at[:, :, 0].set(1.0)
    # log-sigmoid BCE, numerically stable
    per_logit = jnp.maximum(logits, 0.0) - logits * target + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    loss = per_logit.mean(axis=-1) * mask * w
    return jnp.sum(loss) / jnp.maximum(jnp.sum(mask), 1.0)


def gbce_loss(
    logits: jnp.ndarray, y: jnp.ndarray, w: jnp.ndarray, n_actual_items: int, n_negatives: int, gbce_t: float
) -> jnp.ndarray:
    """gBCE: reduce positive-logit overconfidence then BCE
    (reference lightning.py:164-205)."""
    alpha = n_negatives / (n_actual_items - 1)
    beta = alpha * (gbce_t * (1 - 1 / alpha) + 1 / alpha)

    pos_logits = logits[:, :, 0:1].astype(jnp.float32)
    neg_logits = logits[:, :, 1:].astype(jnp.float32)
    epsilon = 1e-10
    pos_probs = jnp.clip(jax.nn.sigmoid(pos_logits), epsilon, 1 - epsilon)
    pos_probs_adjusted = jnp.clip(pos_probs**(-beta), 1 + epsilon, jnp.finfo(jnp.float32).max)
    pos_probs_adjusted = jnp.clip(1.0 / (pos_probs_adjusted - 1), epsilon, jnp.finfo(jnp.float32).max)
    pos_logits_transformed = jnp.log(pos_probs_adjusted)
    calibrated = jnp.concatenate([pos_logits_transformed, neg_logits], axis=-1)
    return bce_loss(calibrated, y, w)


def sampled_softmax_loss(logits: jnp.ndarray, y: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Sampled softmax: positive moved to class index 1 (index 0 = ignore)
    (reference lightning.py:207-212)."""
    logits = jnp.asarray(logits)
    swapped = logits.at[:, :, 0].set(logits[:, :, 1]).at[:, :, 1].set(logits[:, :, 0])
    target = (y != 0).astype(jnp.int32)
    return softmax_loss(swapped, target, w)


def fused_softmax_loss(
    session_towers: jnp.ndarray,  # (B, L, D)
    item_towers: jnp.ndarray,  # (N, D)
    y: jnp.ndarray,  # (B, L)
    w: jnp.ndarray,  # (B, L)
    chunk: int = 4096,
    use_pallas: tp.Optional[bool] = None,
) -> jnp.ndarray:
    """`softmax_loss` without materializing the (B, L, N) logits tensor.

    On TPU the logsumexp runs as one Pallas reduction (ops.softmax_lse):
    item chunks stream through VMEM against resident session blocks and the
    (B*L, chunk) partial-logit tiles never reach HBM in forward OR backward.
    Elsewhere an XLA chunk scan with `jax.checkpoint` gives the same value
    and gradients with O(B*L*chunk) peak memory. Pad-ignore and weighting
    semantics match `softmax_loss` exactly.

    Contract: sample weights ``w`` must be non-negative — the fused backward
    computes ``log(w * |g|)``, so a negative weight would NaN every gradient.
    `SequenceDataset.from_interactions` enforces this once at data-preparation
    time; callers feeding custom weights must uphold it.
    """
    b, length, d = session_towers.shape
    n = item_towers.shape[0]
    s2 = session_towers.reshape(b * length, d)

    if use_pallas is None:
        # the kernel's fixed per-block costs beat the scan only once the
        # catalog spans several chunks (measured: ~9% slower at 3.7k items,
        # 1.56x faster at 15.9k)
        use_pallas = jax.default_backend() == "tpu" and n >= 8192
    if use_pallas:
        from ....ops.softmax_lse import DEFAULT_BLOCK_M, DEFAULT_CHUNK_N

        # wider item chunks amortize the streaming better but grow the
        # per-program VMEM probability tile; at narrow feature dims the
        # tiling below measured fastest for fwd+bwd combined on v5e
        # (sweeps in PERF_r03/PERF_r04)
        if d <= 128:
            block_m, chunk_n = _NARROW_D_TILING if s2.dtype == jnp.bfloat16 else _NARROW_D_TILING_F32
        elif s2.dtype == jnp.bfloat16:
            block_m, chunk_n = _WIDE_D_TILING
        else:
            block_m, chunk_n = DEFAULT_BLOCK_M, DEFAULT_CHUNK_N
        return _fused_ce_pallas(s2, item_towers, y.reshape(-1), w.reshape(-1), block_m, chunk_n)
    n_chunks = (n + chunk - 1) // chunk
    n_pad = n_chunks * chunk
    emb = jnp.pad(item_towers, ((0, n_pad - n), (0, 0)))
    # padded fake items must not contribute to the logsumexp
    col_mask = jnp.where(jnp.arange(n_pad) < n, 0.0, -1e30).astype(jnp.float32)
    emb_chunks = emb.reshape(n_chunks, chunk, d)
    mask_chunks = col_mask.reshape(n_chunks, chunk)

    def body(carry: tp.Tuple[jnp.ndarray, jnp.ndarray], inp: tp.Tuple[jnp.ndarray, jnp.ndarray]):
        m, s = carry
        emb_c, mask_c = inp
        part = (
            jnp.einsum("pd,cd->pc", s2, emb_c, preferred_element_type=jnp.float32)
            + mask_c[None, :]
        )
        m_new = jnp.maximum(m, part.max(axis=-1))
        s = s * jnp.exp(m - m_new) + jnp.exp(part - m_new[:, None]).sum(axis=-1)
        return (m_new, s), None

    # finite "minus infinity" keeps backward free of inf-arithmetic NaNs
    init = (jnp.full((b * length,), -1e30, jnp.float32), jnp.zeros((b * length,), jnp.float32))
    (m, s), _ = jax.lax.scan(jax.checkpoint(body), init, (emb_chunks, mask_chunks))
    lse = (m + jnp.log(s)).reshape(b, length)
    return _ce_from_lse(session_towers, item_towers, y, w, lse)


def _ce_pieces(s2, items, y_flat, w_flat, lse):
    """Loss scalar + the per-position pieces both fwd and bwd need."""
    logit_y = jnp.einsum("md,md->m", s2, items[y_flat], preferred_element_type=jnp.float32)
    ce = jnp.where(y_flat == 0, 0.0, lse - logit_y)
    weighted = ce * w_flat
    denom = jnp.maximum(jnp.sum((weighted > 0).astype(jnp.float32)), 1.0)
    return jnp.sum(weighted) / denom, ce, denom


@partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _fused_ce_pallas(s2, items, y_flat, w_flat, block_m, chunk_n):
    """Softmax CE via the streaming-lse kernel with a loss-level VJP.

    Exploits the CE structure: the lse cotangent is ``c = g * w * [y!=0] /
    denom`` — nonnegative up to the single scalar sign of the upstream
    cotangent ``g`` (weights ``w`` must be nonnegative, which every built-in
    preparator guarantees; a negative weight surfaces as NaN rather than a
    silently wrong gradient). Folding ``log c`` into the exp's subtrahend
    lets the backward kernel run two elementwise passes per logit instead of
    the generic VJP's four (ops/softmax_lse.softmax_grads_from_z).
    """
    from ....ops.softmax_lse import streaming_lse

    lse = streaming_lse(s2, items, None, block_m, chunk_n)
    loss, _, _ = _ce_pieces(s2, items, y_flat, w_flat, lse)
    return loss


def _fused_ce_fwd(s2, items, y_flat, w_flat, block_m, chunk_n):
    from ....ops.softmax_lse import streaming_lse

    lse = streaming_lse(s2, items, None, block_m, chunk_n)
    loss, ce, denom = _ce_pieces(s2, items, y_flat, w_flat, lse)
    return loss, (s2, items, y_flat, w_flat, lse, ce, denom)


def _fused_ce_bwd(block_m, chunk_n, residuals, g):
    import numpy as np

    from ....ops.softmax_lse import softmax_ce_grads_from_z

    s2, items, y_flat, w_flat, lse, ce, denom = residuals
    g = jnp.asarray(g, jnp.float32)
    mask = (y_flat != 0).astype(jnp.float32)
    c = w_flat.astype(jnp.float32) * mask / denom  # per-row lse cotangent magnitude
    gsgn = jnp.sign(g)
    cg = c * jnp.abs(g)
    z = lse - jnp.log(cg)  # c == 0 -> z = +inf -> that row's softmax grads vanish
    # the (P - coeff*onehot(y)) label correction runs inside the kernel:
    # no items[y] gather, no segment_sum scatter over the catalog. The
    # backward holds more live tiles per program than the forward (logits,
    # probability, label select, both matmul outputs), so it caps its
    # block_m at 384 — (512, cn) in the bwd exceeds the 16 MB scoped-VMEM
    # stack at d=128 (measured: the HSTU KION config failed compile), while
    # 384 compiles across the suite and measures fastest of the fitting sizes.
    # The item-chunk width is capped by the same budget: per-program VMEM
    # scales with chunk_n * d (items tile + f32 di block), and (384, 4096)
    # at d=256 overflowed the scoped stack in some fusion contexts
    # (ml20m_b512 loss slice, 22 MB requested) — hold chunk_n * d at the
    # d=128 working point.
    chunk_cap = max(1024, (4096 * 128 // max(s2.shape[1], 1)) // 1024 * 1024)
    ds_c, di_c = softmax_ce_grads_from_z(s2, items, z, y_flat, cg, min(block_m, 384), min(chunk_n, chunk_cap))
    ds = gsgn * ds_c
    di = gsgn * di_c
    dw = (g * ce / denom).astype(w_flat.dtype)
    dy = np.zeros(np.shape(y_flat), dtype=jax.dtypes.float0)
    return ds.astype(s2.dtype), di.astype(items.dtype), dy, dw


_fused_ce_pallas.defvjp(_fused_ce_fwd, _fused_ce_bwd)


def _ce_from_lse(
    session_towers: jnp.ndarray, item_towers: jnp.ndarray, y: jnp.ndarray, w: jnp.ndarray, lse: jnp.ndarray
) -> jnp.ndarray:
    logit_y = jnp.einsum(
        "bld,bld->bl", session_towers, item_towers[y], preferred_element_type=jnp.float32
    )
    ce = lse - logit_y
    ce = jnp.where(y == 0, 0.0, ce)
    loss = ce * w
    n_contrib = (loss > 0).astype(loss.dtype)
    return jnp.sum(loss) / jnp.maximum(jnp.sum(n_contrib), 1.0)


def requires_negatives(loss: str) -> tp.Optional[bool]:
    """Whether the loss trains on sampled negatives (reference lightning.py:115-124)."""
    if loss == "softmax":
        return False
    if loss in ("BCE", "gBCE", "sampled_softmax"):
        return True
    return None
