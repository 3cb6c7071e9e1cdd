"""Exact-parity tests of the TPU top-k MIPS engine vs brute-force numpy."""

import numpy as np
import pytest
from scipy import sparse

from rectools_tpu.models.rank import Distance, TPURanker
from rectools_tpu.ops.topk import rank_topk


def brute_force_rank(subjects, objects, subject_ids, k, distance, filter_csr=None, whitelist=None):
    """Reference implementation in pure numpy."""
    results = []
    obj_ids_all = np.arange(objects.shape[0]) if whitelist is None else np.asarray(whitelist)
    objs = objects if whitelist is None else objects[whitelist]
    for pos, sid in enumerate(subject_ids):
        s = np.asarray(subjects[sid].todense()).ravel() if sparse.issparse(subjects) else subjects[sid]
        if distance == Distance.DOT:
            scores = objs @ s
            order_scores = scores
        elif distance == Distance.COSINE:
            s_norm = np.linalg.norm(s)
            o_norms = np.linalg.norm(objs, axis=1)
            o_norms_safe = np.where(o_norms == 0, 1, o_norms)
            scores = (objs @ s) / o_norms_safe
            if s_norm > 0:
                scores = scores / s_norm
            order_scores = scores
        else:  # EUCLIDEAN
            d = np.linalg.norm(objs - s[None, :], axis=1)
            scores = d
            order_scores = -d
        mask = np.ones(len(objs), dtype=bool)
        if filter_csr is not None:
            seen = filter_csr.indices[filter_csr.indptr[pos] : filter_csr.indptr[pos + 1]]
            if whitelist is not None:
                seen = np.searchsorted(obj_ids_all, seen[np.isin(seen, obj_ids_all)])
            mask[seen] = False
        valid_pos = np.where(mask)[0]
        order = valid_pos[np.argsort(-order_scores[valid_pos], kind="stable")][:k]
        for o in order:
            results.append((sid, obj_ids_all[o], scores[o]))
    subj = np.array([r[0] for r in results], dtype=np.int64)
    obj = np.array([r[1] for r in results], dtype=np.int64)
    sc = np.array([r[2] for r in results], dtype=np.float32)
    return subj, obj, sc


@pytest.fixture
def factors():
    rng = np.random.default_rng(42)
    subjects = rng.normal(size=(20, 16)).astype(np.float32)
    objects = rng.normal(size=(50, 16)).astype(np.float32)
    return subjects, objects


@pytest.mark.parametrize("distance", [Distance.DOT, Distance.COSINE, Distance.EUCLIDEAN])
def test_plain_rank_matches_bruteforce(factors, distance):
    subjects, objects = factors
    subject_ids = np.array([0, 3, 7, 19])
    ranker = TPURanker(distance, subjects, objects)
    subj, obj, scores = ranker.rank(subject_ids, k=5)
    e_subj, e_obj, e_scores = brute_force_rank(subjects, objects, subject_ids, 5, distance)
    np.testing.assert_array_equal(subj, e_subj)
    np.testing.assert_array_equal(obj, e_obj)
    np.testing.assert_allclose(scores, e_scores, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("distance", [Distance.DOT, Distance.COSINE])
def test_filtering_seen(factors, distance):
    subjects, objects = factors
    subject_ids = np.array([1, 2])
    rows = np.array([0, 0, 0, 1, 1])
    cols = np.array([5, 10, 15, 3, 7])
    filter_csr = sparse.csr_matrix(
        (np.ones(5), (rows, cols)), shape=(2, objects.shape[0])
    )
    ranker = TPURanker(distance, subjects, objects)
    subj, obj, scores = ranker.rank(subject_ids, k=8, filter_pairs_csr=filter_csr)
    e_subj, e_obj, e_scores = brute_force_rank(
        subjects, objects, subject_ids, 8, distance, filter_csr=filter_csr
    )
    np.testing.assert_array_equal(obj, e_obj)
    np.testing.assert_allclose(scores, e_scores, rtol=1e-4, atol=1e-5)
    # filtered items never appear
    assert not set(obj[subj == 1]) & {5, 10, 15}


def test_whitelist(factors):
    subjects, objects = factors
    subject_ids = np.array([0, 5])
    whitelist = np.array([2, 8, 13, 21, 34, 44])
    ranker = TPURanker(Distance.DOT, subjects, objects)
    subj, obj, scores = ranker.rank(subject_ids, k=3, sorted_object_whitelist=whitelist)
    e_subj, e_obj, e_scores = brute_force_rank(
        subjects, objects, subject_ids, 3, Distance.DOT, whitelist=whitelist
    )
    np.testing.assert_array_equal(obj, e_obj)
    np.testing.assert_allclose(scores, e_scores, rtol=1e-4, atol=1e-5)
    assert set(obj) <= set(whitelist)


def test_whitelist_and_filter(factors):
    subjects, objects = factors
    subject_ids = np.array([4])
    whitelist = np.array([1, 2, 3, 4, 5])
    filter_csr = sparse.csr_matrix(
        (np.ones(2), (np.array([0, 0]), np.array([2, 4]))), shape=(1, objects.shape[0])
    )
    ranker = TPURanker(Distance.DOT, subjects, objects)
    subj, obj, scores = ranker.rank(
        subject_ids, k=10, filter_pairs_csr=filter_csr, sorted_object_whitelist=whitelist
    )
    assert set(obj) == {1, 3, 5}  # k > available -> returns fewer


def test_sparse_subjects(factors):
    """CSR subject rows x dense object table (EASE/kNN scoring mode)."""
    _, objects = factors
    n_items = objects.shape[0]
    rng = np.random.default_rng(0)
    dense_subjects = (rng.random((6, 16)) < 0.3).astype(np.float32)
    sp_subjects = sparse.csr_matrix(dense_subjects)
    subject_ids = np.array([0, 2, 5])
    ranker_sp = TPURanker(Distance.DOT, sp_subjects, objects)
    ranker_d = TPURanker(Distance.DOT, dense_subjects, objects)
    r_sp = ranker_sp.rank(subject_ids, k=4)
    r_d = ranker_d.rank(subject_ids, k=4)
    np.testing.assert_array_equal(r_sp[1], r_d[1])
    np.testing.assert_allclose(r_sp[2], r_d[2], rtol=1e-5)


def test_k_larger_than_objects(factors):
    subjects, objects = factors
    ranker = TPURanker(Distance.DOT, subjects, objects[:3])
    subj, obj, scores = ranker.rank(np.array([0]), k=10)
    assert len(obj) == 3


def test_filter_mismatched_rows_raises(factors):
    subjects, objects = factors
    filter_csr = sparse.csr_matrix((3, objects.shape[0]))
    ranker = TPURanker(Distance.DOT, subjects, objects)
    with pytest.raises(ValueError):
        ranker.rank(np.array([0]), k=1, filter_pairs_csr=filter_csr)


class TestChunkedTopK:
    def test_chunked_matches_oneshot(self) -> None:
        import jax.numpy as jnp

        from rectools_tpu.ops.topk import TopKEngine, _score_mask_topk, _score_mask_topk_chunked

        rng = np.random.default_rng(0)
        n_obj, d, b, k = 1000, 16, 16, 7
        objects = rng.normal(size=(n_obj, d)).astype(np.float32)
        subjects = rng.normal(size=(b, d)).astype(np.float32)
        seen = rng.integers(0, n_obj, size=(b, 8)).astype(np.int32)
        for distance in (Distance.DOT, Distance.COSINE, Distance.EUCLIDEAN):
            engine = TopKEngine(objects, distance=distance)
            idx1, sc1, v1 = _score_mask_topk(
                jnp.asarray(subjects), engine._objects_t, jnp.asarray(seen),
                engine._obj_norm_sq, engine._n_valid, k, distance.value,
            )
            idx2, sc2, v2 = _score_mask_topk_chunked(
                jnp.asarray(subjects), engine._objects_t, jnp.asarray(seen),
                engine._obj_norm_sq, engine._n_valid, k, distance.value, 128,
            )
            np.testing.assert_array_equal(np.asarray(idx1), np.asarray(idx2))
            np.testing.assert_allclose(np.asarray(sc1), np.asarray(sc2), atol=1e-5)
            np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))

    def test_engine_auto_chunks_and_matches(self) -> None:
        from rectools_tpu.ops import topk as topk_mod
        from rectools_tpu.ops.topk import TopKEngine

        rng = np.random.default_rng(1)
        objects = rng.normal(size=(2000, 8)).astype(np.float32)
        subjects = rng.normal(size=(4, 8)).astype(np.float32)
        big = TopKEngine(objects)
        idx_ref, sc_ref, v_ref = big.query_batch(subjects, 5)
        small = TopKEngine(objects)
        small.max_score_bytes = 8 * 256 * 4  # force chunking
        assert small._pick_chunk(8) is not None
        idx_c, sc_c, v_c = small.query_batch(subjects, 5)
        np.testing.assert_array_equal(idx_ref, idx_c)
        np.testing.assert_allclose(sc_ref, sc_c, atol=1e-5)

    def test_pick_chunk_divides(self) -> None:
        from rectools_tpu.ops.topk import TopKEngine

        rng = np.random.default_rng(2)
        engine = TopKEngine(rng.normal(size=(3333, 8)).astype(np.float32))
        engine.max_score_bytes = 64 * 128 * 4
        chunk = engine._pick_chunk(64)
        assert chunk is not None
        assert engine._n_pad % chunk == 0
        assert chunk % 128 == 0


class TestDeviceResidentFactors:
    """jax-array subjects/objects rank identically to the numpy path and
    never leave the device on the way into the engine (the serving path for
    transformer towers)."""

    @pytest.mark.parametrize("distance", [Distance.DOT, Distance.COSINE])
    def test_rank_topk_jax_inputs_match_numpy(self, distance) -> None:
        import jax.numpy as jnp

        rng = np.random.default_rng(7)
        subjects = rng.normal(size=(37, 16)).astype(np.float32)
        objects = rng.normal(size=(250, 16)).astype(np.float32)
        subject_ids = np.arange(37)
        whitelist = np.sort(rng.choice(250, size=120, replace=False))
        seen = sparse.random(37, 250, density=0.05, format="csr", random_state=3)
        seen.data[:] = 1.0

        ref = rank_topk(subjects, objects, subject_ids, 9, distance,
                        filter_pairs_csr=seen.tocsr(), sorted_object_whitelist=whitelist)
        dev = rank_topk(jnp.asarray(subjects), jnp.asarray(objects), subject_ids, 9, distance,
                        filter_pairs_csr=seen.tocsr(), sorted_object_whitelist=whitelist)
        np.testing.assert_array_equal(ref[0], dev[0])
        np.testing.assert_array_equal(ref[1], dev[1])
        np.testing.assert_allclose(ref[2], dev[2], atol=1e-5)

    def test_engine_jax_objects_match_numpy(self) -> None:
        import jax.numpy as jnp

        from rectools_tpu.ops.topk import TopKEngine

        rng = np.random.default_rng(8)
        objects = rng.normal(size=(300, 8)).astype(np.float32)
        subjects = rng.normal(size=(5, 8)).astype(np.float32)
        e_np = TopKEngine(objects, distance=Distance.COSINE)
        e_dev = TopKEngine(jnp.asarray(objects), distance=Distance.COSINE)
        idx1, sc1, v1 = e_np.query_batch(subjects, 7)
        idx2, sc2, v2 = e_dev.query_batch(jnp.asarray(subjects), 7)
        np.testing.assert_array_equal(idx1, idx2)
        np.testing.assert_allclose(sc1, sc2, atol=1e-5)
        np.testing.assert_array_equal(v1, v2)


class TestExactTopKAlignment:
    """exact_top_k must be a true lax.top_k drop-in at ANY width: unaligned
    n >= 4096 (not a multiple of 128) takes the flat fallback instead of
    crashing in the hierarchical reshape (round-4 advisor finding)."""

    @pytest.mark.parametrize("n", [4097, 5000, 16001])
    def test_unaligned_width_falls_back_exactly(self, n: int) -> None:
        import jax
        import jax.numpy as jnp

        from rectools_tpu.ops.topk import _hier_chunk, exact_top_k

        assert _hier_chunk(n, 100) is None
        rng = np.random.default_rng(11)
        scores = jnp.asarray(rng.normal(size=(3, n)).astype(np.float32))
        got_s, got_i = exact_top_k(scores, 100)
        ref_s, ref_i = jax.lax.top_k(scores, 100)
        np.testing.assert_array_equal(np.asarray(got_s), np.asarray(ref_s))
        np.testing.assert_array_equal(np.asarray(got_i), np.asarray(ref_i))

    def test_aligned_width_still_hierarchical(self) -> None:
        from rectools_tpu.ops.topk import _hier_chunk

        chunk = _hier_chunk(15872, 100)
        assert chunk is not None and 15872 % chunk == 0
