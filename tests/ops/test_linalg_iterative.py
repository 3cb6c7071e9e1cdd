"""Iterative large-catalog linalg: Newton-Schulz SPD inverse + subspace eigh.

TPU's direct factorizations serialize on panels (measured on v5e: full eigh
218 s, cho_solve 33 s at n=3706), so above `_DIRECT_SOLVER_MAX_N` the EASE
inverse and the PureSVD Gram eigendecomposition run as MXU-matmul iterations.
These tests pin both against exact host linalg on CPU.
"""

import numpy as np
import pytest
from scipy import sparse

from rectools_tpu.ops import linalg


def _zipf_csr(n_users: int, n_items: int, nnz: int, seed: int = 0) -> sparse.csr_matrix:
    rng = np.random.default_rng(seed)
    rows = rng.integers(0, n_users, nnz)
    cols = (rng.zipf(1.3, nnz) - 1) % n_items
    mat = sparse.csr_matrix((np.ones(nnz, np.float32), (rows, cols)), shape=(n_users, n_items))
    mat.data[:] = 1.0
    return mat


class TestNewtonSchulzInverse:
    def test_matches_exact_inverse(self):
        rng = np.random.default_rng(0)
        a = rng.normal(size=(400, 1300)).astype(np.float32)
        g = (a.T @ a + 50.0 * np.eye(1300)).astype(np.float32)  # SPD, above threshold
        x = np.asarray(linalg.spd_inverse(np.asarray(g)))
        x_ref = np.linalg.inv(g.astype(np.float64))
        assert np.abs(x - x_ref).max() < 1e-6

    def test_small_matrices_use_direct_solver(self):
        rng = np.random.default_rng(1)
        a = rng.normal(size=(100, 60)).astype(np.float32)
        g = (a.T @ a + 5.0 * np.eye(60)).astype(np.float32)
        x = np.asarray(linalg.spd_inverse(np.asarray(g)))
        x_chol = np.asarray(linalg._spd_inverse_cholesky(np.asarray(g)))
        np.testing.assert_array_equal(x, x_chol)

    def test_ease_weights_match_direct_formula(self):
        ui = _zipf_csr(700, 1200, 40000)
        w = linalg.ease_weight(ui, regularization=100.0)
        g = (ui.T @ ui).toarray().astype(np.float64) + 100.0 * np.eye(1200)
        p = np.linalg.inv(g)
        w_ref = p / (-np.diag(p))[None, :]
        np.fill_diagonal(w_ref, 0.0)
        assert np.abs(w - w_ref).max() < 1e-5


class TestSubspaceEigh:
    def test_matches_exact_eigh_above_threshold(self):
        ui = _zipf_csr(1500, 1400, 80000)
        gram = (ui.T @ ui).toarray().astype(np.float32)
        vals, vecs = linalg.topk_eigh(np.asarray(gram), factors=16)
        vals = np.asarray(vals)
        vecs = np.asarray(vecs)
        w_ref = np.linalg.eigvalsh(gram.astype(np.float64))[::-1][:16]
        rel = np.abs(vals - w_ref) / w_ref
        assert rel.max() < 1e-4
        # Eigenvectors: each column lies in the exact leading subspace.
        _, v_full = np.linalg.eigh(gram.astype(np.float64))
        v_top = v_full[:, -20:]
        proj = np.linalg.norm(v_top.T @ vecs, axis=0)
        assert proj.min() > 1 - 1e-4

    def test_truncated_svd_matches_scipy_svds(self):
        from scipy.sparse.linalg import svds

        ui = _zipf_csr(1800, 1300, 60000, seed=2)
        u, item_factors = linalg.truncated_svd(ui, factors=12)
        _, s_ref, vt_ref = svds(ui.astype(np.float64), k=12)
        s_ref = np.sort(s_ref)[::-1]
        sigma = np.linalg.norm(item_factors, axis=0)  # |V diag(s)| columns = s
        rel = np.abs(np.sort(sigma)[::-1] - s_ref) / s_ref
        assert rel.max() < 1e-4
        # Reconstruction: U diag-free product approximates X on the top rank.
        approx = u @ item_factors.T
        x = ui.toarray()
        v = item_factors / np.where(sigma > 0, sigma, 1.0)[None, :]
        x_best = (x @ v) @ v.T  # projection onto the same rank-12 item space
        assert np.abs(approx - x_best).max() < 1e-3

    def test_maxiter_one_is_looser(self):
        ui = _zipf_csr(1500, 1400, 80000, seed=3)
        gram = (ui.T @ ui).toarray().astype(np.float32)
        vals_tight, _ = linalg.topk_eigh(np.asarray(gram), factors=8)
        vals_loose, _ = linalg.topk_eigh(np.asarray(gram), factors=8, maxiter=1)
        w_ref = np.linalg.eigvalsh(gram.astype(np.float64))[::-1][:8]
        err_tight = np.abs(np.asarray(vals_tight) - w_ref) / w_ref
        err_loose = np.abs(np.asarray(vals_loose) - w_ref) / w_ref
        assert err_tight.max() <= err_loose.max() + 1e-12

    def test_small_matrices_exact(self):
        rng = np.random.default_rng(4)
        a = rng.normal(size=(300, 200)).astype(np.float32)
        gram = (a.T @ a).astype(np.float32)
        vals, _ = linalg.topk_eigh(np.asarray(gram), factors=5)
        w_ref = np.linalg.eigvalsh(gram.astype(np.float64))[::-1][:5]
        assert np.abs(np.asarray(vals) - w_ref).max() / w_ref.max() < 1e-5


class TestTallGramHostPath:
    def test_host_sparse_gram_matches_device_blocks(self):
        # n_users > 4 * n_items triggers the host sparse product
        ui = _zipf_csr(6000, 300, 50000, seed=5)
        gram_host = np.asarray(linalg.gram_matrix(ui))
        # force the device block path by keeping the matrix "short"
        gram_blocks = np.asarray(linalg.gram_matrix(ui[:1100]))
        ref = (ui[:1100].T @ ui[:1100]).toarray().astype(np.float32)
        np.testing.assert_allclose(gram_blocks, ref, rtol=1e-5, atol=1e-3)
        full_ref = (ui.T @ ui).toarray().astype(np.float32)
        np.testing.assert_allclose(gram_host, full_ref, rtol=1e-6)

    def test_ease_through_tall_gram(self):
        ui = _zipf_csr(5000, 200, 30000, seed=6)
        w = linalg.ease_weight(ui, regularization=50.0)
        g = (ui.T @ ui).toarray().astype(np.float64) + 50.0 * np.eye(200)
        p = np.linalg.inv(g)
        w_ref = p / (-np.diag(p))[None, :]
        np.fill_diagonal(w_ref, 0.0)
        assert np.abs(w - w_ref).max() < 1e-4
