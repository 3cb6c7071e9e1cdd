"""Closed-form linear algebra on TPU: Gram matrices, EASE solve, truncated SVD.

TPU-native replacements for the reference's LAPACK/ARPACK calls:
- np.linalg.inv for the EASE Gram inverse (reference ease.py:129) becomes a
  Cholesky solve on the MXU (the regularized Gram is SPD).
- scipy/cupy `svds` (reference pure_svd.py:158-164) becomes an eigh of the
  item Gram matrix + a back-projection for the user factors; the Gram is
  accumulated from user-row blocks so the (n_users, n_items) matrix is never
  densified at once.
"""

import math
import typing as tp
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from scipy import sparse

from ..parallel.mesh import DATA_AXIS, MODEL_AXIS

_HI = jax.lax.Precision.HIGHEST


@partial(jax.jit, donate_argnums=(0,))
def _gram_accumulate(gram: jax.Array, block: jax.Array) -> jax.Array:
    return gram + jnp.dot(block.T, block, preferred_element_type=jnp.float32, precision=_HI)


def gram_matrix(
    ui_csr: sparse.csr_matrix, block_rows: int = 8192, mesh: tp.Optional[Mesh] = None
) -> jax.Array:
    """X^T X on device, accumulated over dense row blocks of the CSR matrix.

    With a ``mesh``, each block is row-sharded over all mesh devices so the
    contraction happens as per-shard partial Grams + an XLA psum over ICI
    (the SURVEY §2.9 "sharded Gram for EASE/PureSVD" plan); the accumulated
    Gram itself stays replicated because the downstream Cholesky/eigh is a
    single-device XLA call either way.
    """
    n_users, n_items = ui_csr.shape
    gram = jnp.zeros((n_items, n_items), dtype=jnp.float32)
    block_sharding = None
    if mesh is not None:
        n_dev = mesh.devices.size
        block_rows = ((block_rows + n_dev - 1) // n_dev) * n_dev
        block_sharding = NamedSharding(mesh, P((DATA_AXIS, MODEL_AXIS), None))
        gram = jax.device_put(gram, NamedSharding(mesh, P()))
    for start in range(0, n_users, block_rows):
        block = np.asarray(ui_csr[start : start + block_rows].todense(), dtype=np.float32)
        if block_sharding is not None:
            n_dev = mesh.devices.size
            if block.shape[0] % n_dev:
                pad = ((block.shape[0] + n_dev - 1) // n_dev) * n_dev - block.shape[0]
                block = np.vstack([block, np.zeros((pad, n_items), dtype=np.float32)])
            block_dev = jax.device_put(jnp.asarray(block), block_sharding)
        else:
            block_dev = jnp.asarray(block)
        gram = _gram_accumulate(gram, block_dev)
    return gram


@jax.jit
def _ease_weight_from_gram(gram: jax.Array, regularization: jax.Array) -> jax.Array:
    n = gram.shape[0]
    g = gram + regularization * jnp.eye(n, dtype=jnp.float32)
    # SPD inverse via Cholesky: solve G P = I.
    p = jax.scipy.linalg.cho_solve(jax.scipy.linalg.cho_factor(g, lower=True), jnp.eye(n, dtype=jnp.float32))
    w = p / (-jnp.diag(p))[None, :]
    w = w - jnp.diag(jnp.diag(w))
    return w


def ease_weight(
    ui_csr: sparse.csr_matrix, regularization: float, mesh: tp.Optional[Mesh] = None
) -> np.ndarray:
    """EASE closed-form weights: W = G^-1 / (-diag(G^-1)), zero diagonal
    (same row/column normalization convention as reference ease.py:122-132)."""
    gram = gram_matrix(ui_csr, mesh=mesh)
    w = _ease_weight_from_gram(gram, jnp.float32(regularization))
    return np.asarray(w)


@partial(jax.jit, static_argnames=("factors",))
def _topk_eigh(gram: jax.Array, factors: int) -> tp.Tuple[jax.Array, jax.Array]:
    eigvals, eigvecs = jnp.linalg.eigh(gram)  # ascending
    top = eigvals[-factors:][::-1]
    vecs = eigvecs[:, -factors:][:, ::-1]
    return top, vecs


def truncated_svd(
    ui_csr: sparse.csr_matrix, factors: int, block_rows: int = 8192, mesh: tp.Optional[Mesh] = None
) -> tp.Tuple[np.ndarray, np.ndarray]:
    """Truncated SVD X ~= U diag(s) V^T via eigh of the item Gram.

    Returns (user_factors=U, item_factors=(diag(s) V^T)^T = V diag(s)) with
    the same factor convention as reference pure_svd.py:152-167.
    """
    n_users, n_items = ui_csr.shape
    if factors > min(n_users, n_items) - 1:
        raise ValueError("`factors` must be less than min(n_users, n_items)")
    gram = gram_matrix(ui_csr, block_rows, mesh=mesh)
    eigvals, v = _topk_eigh(gram, factors)
    eigvals = np.asarray(eigvals)
    v = np.asarray(v)
    sigma = np.sqrt(np.clip(eigvals, 0.0, None))
    # U = X V diag(1/sigma); compute in row blocks (host sparse x small dense).
    sigma_safe = np.where(sigma > 0, sigma, 1.0)
    v_scaled = v / sigma_safe[None, :]
    u = np.zeros((n_users, factors), dtype=np.float32)
    for start in range(0, n_users, block_rows):
        u[start : start + block_rows] = ui_csr[start : start + block_rows] @ v_scaled
    item_factors = v * sigma[None, :]
    return u.astype(np.float32), item_factors.astype(np.float32)
