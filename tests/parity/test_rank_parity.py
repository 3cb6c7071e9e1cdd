"""Ranking-engine parity: the reference ImplicitRanker (running on the exact
numpy topk stub) and TPURanker return the same (subject, item, score)
triplets for every distance, with seen-pair filters, whitelists, and sparse
CSR subjects (the EASE/kNN serving path)."""

import numpy as np
import pytest
from scipy import sparse


@pytest.fixture(scope="module")
def factors():
    rng = np.random.default_rng(17)
    subjects = rng.normal(size=(40, 16)).astype(np.float32)
    objects = rng.normal(size=(70, 16)).astype(np.float32)
    seen = sparse.random(40, 70, density=0.1, random_state=3, format="csr")
    seen.data[:] = 1.0
    return subjects, objects, seen.astype(np.float32)


def _rank_both(distance_name, subjects, objects, subject_ids, k, filter_csr=None, whitelist=None):
    from rectools.models.rank import Distance as RefDistance, ImplicitRanker

    from rectools_tpu.models.rank import Distance, TPURanker

    ref_ranker = ImplicitRanker(
        distance=getattr(RefDistance, distance_name), subjects_factors=subjects, objects_factors=objects
    )
    ref = ref_ranker.rank(
        subject_ids=subject_ids, k=k, filter_pairs_csr=filter_csr, sorted_object_whitelist=whitelist
    )
    tpu_ranker = TPURanker(
        distance=getattr(Distance, distance_name), subjects_factors=subjects, objects_factors=objects
    )
    tpu = tpu_ranker.rank(
        subject_ids=np.asarray(subject_ids), k=k, filter_pairs_csr=filter_csr, sorted_object_whitelist=whitelist
    )
    return ref, tpu


def _assert_triplets_equal(ref, tpu, score_atol=1e-4):
    ref_subj, ref_items, ref_scores = np.asarray(ref[0]), np.asarray(ref[1]), np.asarray(ref[2])
    tpu_subj, tpu_items, tpu_scores = tpu
    assert len(ref_subj) == len(tpu_subj)
    # compare as per-subject ordered lists (ties can swap: compare score sets)
    order_ref = np.lexsort((ref_items, ref_subj))
    order_tpu = np.lexsort((tpu_items, tpu_subj))
    np.testing.assert_array_equal(ref_subj[order_ref], tpu_subj[order_tpu])
    np.testing.assert_array_equal(ref_items[order_ref], tpu_items[order_tpu])
    np.testing.assert_allclose(ref_scores[order_ref], tpu_scores[order_tpu], atol=score_atol, rtol=1e-4)


class TestRankerParity:
    @pytest.mark.parametrize("distance", ["DOT", "COSINE", "EUCLIDEAN"])
    def test_plain(self, factors, distance) -> None:
        subjects, objects, _ = factors
        ref, tpu = _rank_both(distance, subjects, objects, list(range(25)), k=8)
        _assert_triplets_equal(ref, tpu)

    @pytest.mark.parametrize("distance", ["DOT", "COSINE", "EUCLIDEAN"])
    def test_seen_filter(self, factors, distance) -> None:
        subjects, objects, seen = factors
        ids = list(range(40))
        ref, tpu = _rank_both(distance, subjects, objects, ids, k=8, filter_csr=seen)
        _assert_triplets_equal(ref, tpu)
        # no recommended pair may be a seen pair
        tpu_subj, tpu_items, _ = tpu
        assert not any(seen[s, i] for s, i in zip(tpu_subj, tpu_items))

    @pytest.mark.parametrize("distance", ["DOT", "COSINE"])
    def test_whitelist_with_filter(self, factors, distance) -> None:
        subjects, objects, seen = factors
        whitelist = np.arange(0, 70, 3)
        ids = list(range(0, 40, 2))
        ref, tpu = _rank_both(
            distance, subjects, objects, ids, k=6,
            filter_csr=seen[ids], whitelist=whitelist,
        )
        _assert_triplets_equal(ref, tpu)
        assert set(np.asarray(tpu[1])).issubset(set(whitelist))

    def test_sparse_subjects(self, factors) -> None:
        # CSR user-history rows scored against an item-item table (EASE path)
        _, objects, _ = factors
        rng = np.random.default_rng(5)
        history = sparse.random(30, 70, density=0.15, random_state=8, format="csr").astype(np.float32)
        item_item = rng.normal(size=(70, 70)).astype(np.float32)

        from rectools.models.rank import Distance as RefDistance, ImplicitRanker

        from rectools_tpu.models.rank import Distance, TPURanker

        ref = ImplicitRanker(RefDistance.DOT, history, item_item).rank(list(range(30)), k=10)
        tpu = TPURanker(Distance.DOT, history, item_item).rank(np.arange(30), k=10)
        _assert_triplets_equal(ref, tpu)

    def test_k_larger_than_catalog(self, factors) -> None:
        subjects, objects, _ = factors
        ref, tpu = _rank_both("DOT", subjects, objects, [0, 1, 2], k=500)
        _assert_triplets_equal(ref, tpu)
        assert len(tpu[0]) == 3 * 70
