"""Hybrid matrix factorization on TPU: feature-summed embeddings + biases
trained with logistic / BPR / WARP losses.

TPU-native replacement for the LightFM Cython SGD the reference wraps
(rectools/models/lightfm.py:93-320; LightFM: per-interaction SGD with
OpenMP threads). The per-interaction loop becomes one jit-compiled minibatch
step: gather user/item feature rows from padded index tables in HBM, sum
feature embeddings on the VPU, score on the MXU, Adagrad/Adadelta update.
WARP's sequential "sample until violation" loop becomes a parallel draw of
``max_sampled`` negatives per positive with the first violator selected by
argmax — the rank weight log((n_items-1)/trials) is preserved.
"""

import typing as tp
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax
from scipy import sparse

Params = tp.Dict[str, jnp.ndarray]


def pad_feature_table(csr: sparse.csr_matrix) -> tp.Tuple[np.ndarray, np.ndarray]:
    """CSR feature matrix -> padded (n_rows, max_nnz) index + value tables.

    Row representations then compute as ``sum_j emb[idx[r, j]] * val[r, j]``
    with zero-valued padding entries contributing nothing.
    """
    n_rows = csr.shape[0]
    lengths = np.diff(csr.indptr)
    max_len = max(int(lengths.max()) if n_rows else 0, 1)
    idx = np.zeros((n_rows, max_len), dtype=np.int32)
    val = np.zeros((n_rows, max_len), dtype=np.float32)
    if lengths.sum() > 0:
        rows = np.repeat(np.arange(n_rows), lengths)
        cols = np.arange(int(lengths.sum())) - np.repeat(np.cumsum(lengths) - lengths, lengths)
        idx[rows, cols] = csr.indices
        val[rows, cols] = csr.data
    return idx, val


def _repr_of(
    emb: jnp.ndarray, bias: jnp.ndarray, feat_idx: jnp.ndarray, feat_val: jnp.ndarray
) -> tp.Tuple[jnp.ndarray, jnp.ndarray]:
    """Feature-summed representation: (..., P) indices -> (..., d) embedding + scalar bias."""
    vecs = emb[feat_idx] * feat_val[..., None]  # (..., P, d)
    b = bias[feat_idx] * feat_val  # (..., P)
    return vecs.sum(axis=-2), b.sum(axis=-1)


def make_optimizer(
    learning_schedule: str, learning_rate: float, rho: float, epsilon: float
) -> optax.GradientTransformation:
    """LightFM's learning schedules: adagrad (default) or adadelta."""
    if learning_schedule == "adagrad":
        # accumulator starts at ~0 like LightFM's (optax's 0.1 default damps
        # early updates an order of magnitude for minibatch training)
        return optax.adagrad(learning_rate=learning_rate, initial_accumulator_value=1e-10, eps=epsilon)
    if learning_schedule == "adadelta":
        return optax.adadelta(learning_rate=learning_rate, rho=rho, eps=epsilon)
    raise ValueError(f"Unknown learning_schedule: {learning_schedule}")


@partial(
    jax.jit,
    static_argnames=("loss", "max_sampled", "n_items", "tx", "kos_k"),
    donate_argnums=(0, 1),
)
def train_step(
    params: Params,
    opt_state: tp.Any,
    user_feat_idx: jnp.ndarray,  # (B, Pu)
    user_feat_val: jnp.ndarray,
    item_feat_idx: jnp.ndarray,  # (n_items, Pi) full table
    item_feat_val: jnp.ndarray,
    pos_items: jnp.ndarray,  # (B,) int32; for warp-kos: (B, n) sampled positives
    weights: jnp.ndarray,  # (B,) float (sample weight; 0 => padded row)
    rng: jax.Array,
    loss: str,
    max_sampled: int,
    n_items: int,
    tx: optax.GradientTransformation,
    user_alpha: float = 0.0,
    item_alpha: float = 0.0,
    kos_k: int = 5,
) -> tp.Tuple[Params, tp.Any, jnp.ndarray]:
    """One minibatch SGD step. Padded rows (weight 0) contribute nothing."""

    def loss_fn(p: Params) -> jnp.ndarray:
        u_vec, u_b = _repr_of(p["user_emb"], p["user_bias"], user_feat_idx, user_feat_val)
        if loss == "warp-kos":
            # k-th order statistic positive (Weston et al. k-OS WARP; LightFM
            # `loss="warp-kos"` with its k/n params): score the n sampled
            # positives per user and train on the k-th best-scoring one.
            cand_vec, cand_b = _repr_of(
                p["item_emb"], p["item_bias"], item_feat_idx[pos_items], item_feat_val[pos_items]
            )  # (B, n, d), (B, n)
            cand_score = jnp.einsum("bd,bnd->bn", u_vec, cand_vec) + u_b[:, None] + cand_b
            order = jnp.argsort(-cand_score, axis=1)  # descending
            kth = order[:, min(kos_k, pos_items.shape[1]) - 1]  # (B,)
            pos_vec = jnp.take_along_axis(cand_vec, kth[:, None, None], axis=1)[:, 0]
            pos_score = jnp.take_along_axis(cand_score, kth[:, None], axis=1)[:, 0]
        else:
            pos_vec, pos_b = _repr_of(
                p["item_emb"], p["item_bias"], item_feat_idx[pos_items], item_feat_val[pos_items]
            )
            pos_score = jnp.sum(u_vec * pos_vec, axis=-1) + u_b + pos_b  # (B,)
        valid = (weights != 0).astype(jnp.float32)

        if loss == "logistic":
            # observed interactions: label = sign(weight), magnitude = |weight|
            label = jnp.sign(weights)
            y01 = (label + 1.0) / 2.0
            per = jnp.maximum(pos_score, 0.0) - pos_score * y01 + jnp.log1p(jnp.exp(-jnp.abs(pos_score)))
            data_loss = jnp.sum(per * jnp.abs(weights)) / jnp.maximum(jnp.sum(valid), 1.0)
            reg_items = pos_vec
        else:
            neg_items = jax.random.randint(rng, (pos_items.shape[0], max_sampled), 0, n_items)
            neg_vec, neg_b = _repr_of(
                p["item_emb"], p["item_bias"], item_feat_idx[neg_items], item_feat_val[neg_items]
            )  # (B, M, d), (B, M)
            neg_score = jnp.einsum("bd,bmd->bm", u_vec, neg_vec) + u_b[:, None] + neg_b

            if loss == "bpr":
                # first sampled negative (LightFM BPR uses a single draw)
                diff = pos_score - neg_score[:, 0]
                per = jnp.log1p(jnp.exp(-diff))
                data_loss = jnp.sum(per * jnp.abs(weights)) / jnp.maximum(jnp.sum(valid), 1.0)
            else:  # warp / warp-kos (same rank loss, different positive)
                # violation: margin rank loss triggered when 1 - s_pos + s_neg > 0
                violations = neg_score > pos_score[:, None] - 1.0  # (B, M)
                any_violation = violations.any(axis=1)
                first = jnp.argmax(violations, axis=1)  # first violating draw
                trials = first + 1
                # rank estimate: floor((n_items - 1) / trials); weight log(rank)
                rank_w = jnp.log(jnp.maximum(jnp.floor((n_items - 1) / trials), 1.0))
                chosen_neg = jnp.take_along_axis(neg_score, first[:, None], axis=1)[:, 0]
                hinge = jnp.maximum(1.0 - pos_score + chosen_neg, 0.0)
                per = rank_w * hinge * any_violation.astype(jnp.float32)
                data_loss = jnp.sum(per * jnp.abs(weights)) / jnp.maximum(jnp.sum(valid), 1.0)
            reg_items = pos_vec

        reg = user_alpha * jnp.sum(u_vec * u_vec) + item_alpha * jnp.sum(reg_items * reg_items)
        return data_loss + reg / jnp.maximum(jnp.sum(valid), 1.0)

    loss_val, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss_val


def init_params(n_user_features: int, n_item_features: int, no_components: int, seed: int) -> Params:
    """LightFM-style init: uniform(-1, 1)/no_components embeddings, zero biases
    (lightfm's _initialize)."""
    key_u, key_i = jax.random.split(jax.random.PRNGKey(seed))
    scale = 1.0 / no_components
    return {
        "user_emb": jax.random.uniform(key_u, (n_user_features, no_components), jnp.float32, -scale, scale),
        "user_bias": jnp.zeros((n_user_features,), jnp.float32),
        "item_emb": jax.random.uniform(key_i, (n_item_features, no_components), jnp.float32, -scale, scale),
        "item_bias": jnp.zeros((n_item_features,), jnp.float32),
    }
