"""Closed-form linear algebra on TPU: Gram matrices, EASE solve, truncated SVD.

TPU-native replacements for the reference's LAPACK/ARPACK calls:
- np.linalg.inv for the EASE Gram inverse (reference ease.py:129) becomes a
  Cholesky solve on the MXU (the regularized Gram is SPD).
- scipy/cupy `svds` (reference pure_svd.py:158-164) becomes an eigh of the
  item Gram matrix + a back-projection for the user factors; the Gram is
  accumulated from user-row blocks so the (n_users, n_items) matrix is never
  densified at once.
"""

import typing as tp
import warnings
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from scipy import sparse

from ..parallel.mesh import DATA_AXIS, MODEL_AXIS

_HI = jax.lax.Precision.HIGHEST

# Solver selection for the factorizations below. "auto" uses the direct XLA
# factorization up to `_DIRECT_SOLVER_MAX_N` and the iterative MXU algorithms
# beyond; "exact" forces the direct path at any size (exact LAPACK-equivalent
# results, but TPU panel factorizations take minutes at n in the thousands);
# "iterative" forces Newton-Schulz / subspace iteration at any size
# (~1e-6..1e-7 relative residual; see `spd_inverse`/`topk_eigh`).
SolverKind = tp.Any  # tpe.Literal["auto", "exact", "iterative"]
_SOLVER_KINDS = ("auto", "exact", "iterative")


def _check_solver(solver: str) -> str:
    if solver not in _SOLVER_KINDS:
        raise ValueError(f"solver must be one of {_SOLVER_KINDS}, got {solver!r}")
    return solver


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
    if mesh is None and n_users > 4 * n_items:
        # Tall sparse matrices: the dense row blocks below would move
        # n_users * n_items * 4 bytes host->device (tens of GB at KION's
        # 962k users x 15.7k items) to compute a Gram whose sparse host
        # product costs one pass over the nnz. Compute X^T X with scipy and
        # upload the (n_items, n_items) result once — f32 accumulation
        # either way. The mesh path keeps device accumulation (its point is
        # sharding the contraction FLOPs, and small-scale parity tests pin
        # the device path bit-for-bit).
        gram_host = (ui_csr.T @ ui_csr).toarray().astype(np.float32)
        return jnp.asarray(gram_host)
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


# Below this size the direct (Cholesky / full-eigh) XLA factorizations are
# fast and bit-stable, and the parity tests pin their exact outputs. Above it,
# TPU's sequential-panel factorizations fall off a cliff (measured at
# n=3706 on v5e: eigh 218 s, cho_solve 33 s) while the iterative MXU-matmul
# algorithms below converge to ~1e-7 in well under a second.
_DIRECT_SOLVER_MAX_N = 1024


@jax.jit
def _newton_seed(a: jax.Array) -> tp.Tuple[jax.Array, jax.Array]:
    """Pick the better convergent seed and return (X0, a stop residual).

    The Jacobi seed X0 = diag(1/diag(A)) starts within a few contractions of
    the answer for diagonally-dominant-ish Grams, but Newton–Schulz only
    converges when the SPECTRAL norm ||I - A X0||_2 < 1 — the elementwise
    max understates it (a max-norm check was tried and diverged on dense
    Grams). Guard with the computable bound
    ||M||_2 <= sqrt(||M||_1 ||M||_inf); the universal seed
    A^T/(|A|_1 |A|_inf) is convergent by construction and remains the
    fallback. One extra (n, n) matmul either way.
    """
    n = a.shape[0]
    eye = jnp.eye(n, dtype=jnp.float32)
    x_uni = a.T / (jnp.max(jnp.sum(jnp.abs(a), axis=0)) * jnp.max(jnp.sum(jnp.abs(a), axis=1)))
    x_jac = jnp.diag(1.0 / jnp.diag(a))
    m_jac = jnp.dot(a, x_jac, precision=_HI) - eye
    abs_jac = jnp.abs(m_jac)
    spectral_bound = jnp.sqrt(jnp.max(jnp.sum(abs_jac, axis=0)) * jnp.max(jnp.sum(abs_jac, axis=1)))
    use_jac = spectral_bound < 0.99
    x0 = jnp.where(use_jac, x_jac, x_uni)
    r_uni = jnp.max(jnp.abs(jnp.dot(a, x_uni, precision=_HI) - eye))
    residual = jnp.where(use_jac, jnp.max(abs_jac), r_uni)
    return x0, residual


@partial(jax.jit, static_argnames=("steps",))
def _newton_chunk(a: jax.Array, x: jax.Array, steps: int) -> tp.Tuple[jax.Array, jax.Array]:
    """``steps`` Newton–Schulz iterations X <- X (2I - A X) + the residual
    max|A X - I| after them. All f32: bf16 iterations were tried and
    DIVERGE in the early phase (the contraction only self-corrects while
    ||I - A X|| < 1, and bf16 rounding tips it over when the residual is
    near 1)."""
    n = a.shape[0]
    eye = jnp.eye(n, dtype=jnp.float32)

    def body(_, x):
        ax = jnp.dot(a, x, precision=_HI)
        return jnp.dot(x, 2.0 * eye - ax, precision=_HI)

    x = jax.lax.fori_loop(0, steps, body, x)
    residual = jnp.max(jnp.abs(jnp.dot(a, x, precision=_HI) - eye))
    return x, residual


def _spd_inverse_newton(a: jax.Array, maxiter: int, tol: float, chunk: int = 8) -> jax.Array:
    """SPD inverse by Newton–Schulz iteration: X <- X (2I - A X).

    Every step is two (n, n) MXU matmuls — the shape TPU factorizations
    cannot reach (they serialize on panels). The loop runs in ``chunk``-step
    device dispatches with the convergence check on host: a single
    while_loop dispatch at n~16k runs minutes of device time, which remote
    TPU runtimes may kill as hung (observed worker crash at n=15706); the
    per-chunk sync costs microseconds against seconds of matmuls.
    """
    x, residual = _newton_seed(a)
    res = float(residual)
    best = res
    done = 0
    while done < maxiter and res > tol:
        x, residual = _newton_chunk(a, x, chunk)
        res = float(residual)
        done += chunk
        # f32-floor detection (measured at n=15706: convergence by iteration
        # ~40 to a ~3e-6 floor, then zero progress — without this check a
        # sub-floor tol burns the whole budget at 0.55 s/iteration). The
        # res < 1e-3 guard keeps the slow EARLY plateau (residual ~= 1 for
        # the first ~25 iterations) from triggering it.
        if res < 1e-3 and res >= best * 0.5:
            if res > tol:
                warnings.warn(
                    f"Newton-Schulz SPD inverse stalled at the f32 residual floor: "
                    f"max|AX - I| = {res:.2e} after {done} iterations (requested tol {tol:.0e}). "
                    f"Pass solver='exact' for the direct factorization if this matters.",
                    RuntimeWarning,
                )
            break
        best = min(best, res)
    return x


@jax.jit
def _spd_inverse_cholesky(a: jax.Array) -> jax.Array:
    n = a.shape[0]
    return jax.scipy.linalg.cho_solve(
        jax.scipy.linalg.cho_factor(a, lower=True), jnp.eye(n, dtype=jnp.float32)
    )


def spd_inverse(
    a: jax.Array, maxiter: int = 200, tol: float = 1e-6, solver: SolverKind = "auto"
) -> jax.Array:
    """Inverse of a symmetric positive-definite matrix on device.

    ``solver="auto"``: direct Cholesky solve up to `_DIRECT_SOLVER_MAX_N`,
    Newton–Schulz beyond (TPU-native: all MXU matmuls, no sequential panel
    factorization). The iterative path targets max|AX - I| <= ``tol`` and
    warns if it stalls at the f32 floor above it (typically ~3e-6 at
    n~16k). Force a path with ``solver="exact"`` / ``solver="iterative"``.
    """
    _check_solver(solver)
    if solver == "exact" or (solver == "auto" and a.shape[0] <= _DIRECT_SOLVER_MAX_N):
        return _spd_inverse_cholesky(a)
    return _spd_inverse_newton(a, maxiter, float(tol))


@jax.jit
def _ease_weight_from_inverse(p: jax.Array) -> jax.Array:
    w = p / (-jnp.diag(p))[None, :]
    return w - jnp.diag(jnp.diag(w))


def ease_weight(
    ui_csr: sparse.csr_matrix,
    regularization: float,
    mesh: tp.Optional[Mesh] = None,
    solver: SolverKind = "auto",
) -> np.ndarray:
    """EASE closed-form weights: W = G^-1 / (-diag(G^-1)), zero diagonal
    (same row/column normalization convention as reference ease.py:122-132)."""
    gram = gram_matrix(ui_csr, mesh=mesh)
    n = gram.shape[0]
    p = spd_inverse(gram + jnp.float32(regularization) * jnp.eye(n, dtype=jnp.float32), solver=solver)
    return np.asarray(_ease_weight_from_inverse(p))


@partial(jax.jit, static_argnames=("factors",))
def _topk_eigh(gram: jax.Array, factors: int) -> tp.Tuple[jax.Array, jax.Array]:
    eigvals, eigvecs = jnp.linalg.eigh(gram)  # ascending
    top = eigvals[-factors:][::-1]
    vecs = eigvecs[:, -factors:][:, ::-1]
    return top, vecs


@partial(jax.jit, static_argnames=("factors", "oversample", "maxiter"))
def _subspace_topk_eigh(
    gram: jax.Array, factors: int, oversample: int, maxiter: int, tol: jax.Array, seed: jax.Array
) -> tp.Tuple[jax.Array, jax.Array]:
    """Top-`factors` eigenpairs of a PSD Gram by randomized subspace iteration.

    Every step is one (n, n) x (n, k) MXU matmul plus a Cholesky-QR
    re-orthonormalization of the tall-skinny block — the factorizations stay
    at size k, never n, so this runs in milliseconds where TPU's full eigh
    takes minutes (measured: 218 s at n=3706 on v5e). Convergence is tracked
    on the per-column Rayleigh quotients of the leading `factors` columns;
    the loop stops when their max relative change drops below ``tol``.
    """
    n = gram.shape[0]
    k = min(factors + oversample, n)
    eye_k = jnp.eye(k, dtype=jnp.float32)

    def ortho(y: jax.Array) -> jax.Array:
        # Cholesky QR: one small (k, k) factorization per step, MXU-friendly.
        b = jnp.dot(y.T, y, precision=_HI)
        shift = 1e-6 * jnp.trace(b) / k
        chol = jnp.linalg.cholesky(b + shift * eye_k)
        return jax.scipy.linalg.solve_triangular(chol, y.T, lower=True).T

    q0 = ortho(jax.random.normal(jax.random.PRNGKey(seed), (n, k), dtype=jnp.float32))
    y0 = jnp.dot(gram, q0, precision=_HI)

    def cond(state):
        i, _, _, delta = state
        return (i < maxiter) & (delta > tol)

    def body(state):
        i, q, y, _ = state
        q_next = ortho(y)
        y_next = jnp.dot(gram, q_next, precision=_HI)
        # Rayleigh quotients come free from the y needed next step.
        rq_prev = jnp.sum(q * y, axis=0)
        rq_next = jnp.sum(q_next * y_next, axis=0)
        lead_prev = jax.lax.top_k(rq_prev, factors)[0]
        lead_next = jax.lax.top_k(rq_next, factors)[0]
        delta = jnp.max(jnp.abs(lead_next - lead_prev) / jnp.maximum(jnp.abs(lead_next), 1e-30))
        return i + 1, q_next, y_next, delta

    _, q, y, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), q0, y0, jnp.float32(jnp.inf)))
    # Rayleigh–Ritz on the converged subspace: a k x k eigh, not n x n.
    b = jnp.dot(q.T, y, precision=_HI)
    b = (b + b.T) / 2.0
    w, u = jnp.linalg.eigh(b)
    vals = w[-factors:][::-1]
    vecs = jnp.dot(q, u, precision=_HI)[:, -factors:][:, ::-1]
    return vals, vecs


def topk_eigh(
    gram: jax.Array,
    factors: int,
    tol: float = 0.0,
    maxiter: tp.Optional[int] = None,
    seed: int = 0,
    solver: SolverKind = "auto",
) -> tp.Tuple[jax.Array, jax.Array]:
    """Leading eigenpairs of a PSD matrix: exact eigh for small matrices,
    randomized subspace iteration (MXU matmuls only) beyond
    `_DIRECT_SOLVER_MAX_N`. ``tol``/``maxiter`` mirror the reference's ARPACK
    knobs (pure_svd.py:158-164): tol 0 means "to numerical convergence"
    (mapped to 1e-7 relative Rayleigh-quotient change). ``solver`` forces the
    exact/iterative path regardless of size (see `SolverKind`)."""
    _check_solver(solver)
    if solver == "exact" or (
        solver == "auto" and gram.shape[0] <= _DIRECT_SOLVER_MAX_N and maxiter is None
    ):
        return _topk_eigh(gram, factors)
    tol_eff = 1e-7 if tol == 0 else float(tol)
    maxiter_eff = 300 if maxiter is None else int(maxiter)
    oversample = int(min(max(16, factors // 2), gram.shape[0] - factors))
    return _subspace_topk_eigh(
        gram, factors, oversample, maxiter_eff, jnp.float32(tol_eff), jnp.uint32(seed)
    )


def truncated_svd(
    ui_csr: sparse.csr_matrix,
    factors: int,
    block_rows: int = 8192,
    mesh: tp.Optional[Mesh] = None,
    tol: float = 0.0,
    maxiter: tp.Optional[int] = None,
    random_state: tp.Optional[int] = None,
    solver: SolverKind = "auto",
) -> tp.Tuple[np.ndarray, np.ndarray]:
    """Truncated SVD X ~= U diag(s) V^T via eigh of the item Gram.

    Returns (user_factors=U, item_factors=(diag(s) V^T)^T = V diag(s)) with
    the same factor convention as reference pure_svd.py:152-167.
    """
    n_users, n_items = ui_csr.shape
    if factors > min(n_users, n_items) - 1:
        raise ValueError("`factors` must be less than min(n_users, n_items)")
    gram = gram_matrix(ui_csr, block_rows, mesh=mesh)
    eigvals, v = topk_eigh(
        gram,
        factors,
        tol=tol,
        maxiter=maxiter,
        seed=0 if random_state is None else int(random_state),
        solver=solver,
    )
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
