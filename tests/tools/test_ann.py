"""ANN-tool replacement tests (pattern of reference tests/tools/test_ann.py;
ours is exact so results are deterministic)."""

import pickle

import numpy as np
import pytest

from rectools_tpu.dataset import IdMap
from rectools_tpu.tools import ItemToItemAnnRecommender, UserToItemAnnRecommender


def _vectors():
    rng = np.random.default_rng(0)
    item_vectors = rng.normal(size=(20, 8)).astype(np.float32)
    user_vectors = rng.normal(size=(10, 8)).astype(np.float32)
    item_id_map = IdMap.from_values([f"i{i}" for i in range(20)])
    user_id_map = IdMap.from_values([f"u{i}" for i in range(10)])
    return user_vectors, item_vectors, user_id_map, item_id_map


def _brute_force_cosine_top(user_vec, item_vectors, n):
    norms = np.linalg.norm(item_vectors, axis=1) * np.linalg.norm(user_vec)
    sims = item_vectors @ user_vec / np.where(norms == 0, 1, norms)
    return list(np.argsort(-sims)[:n])


class TestUserToItemAnnRecommender:
    def test_matches_brute_force(self) -> None:
        user_vectors, item_vectors, user_id_map, item_id_map = _vectors()
        rec = UserToItemAnnRecommender(user_vectors, item_vectors, user_id_map, item_id_map).fit()
        got = rec.get_item_list_for_user("u0", top_n=5)
        expected_internal = _brute_force_cosine_top(user_vectors[0], item_vectors, 5)
        np.testing.assert_array_equal(got, item_id_map.convert_to_external(expected_internal))

    def test_batch_with_whitelists(self) -> None:
        user_vectors, item_vectors, user_id_map, item_id_map = _vectors()
        rec = UserToItemAnnRecommender(
            user_vectors, item_vectors, user_id_map, item_id_map, index_top_k=20
        ).fit()
        whitelists = [["i0", "i1", "i2"], ["i3", "i4"]]
        got = rec.get_item_list_for_user_batch(["u0", "u1"], top_n=2, item_ids=whitelists)
        assert set(got[0]) <= {"i0", "i1", "i2"}
        assert set(got[1]) <= {"i3", "i4"}

    def test_pickling(self) -> None:
        user_vectors, item_vectors, user_id_map, item_id_map = _vectors()
        rec = UserToItemAnnRecommender(user_vectors, item_vectors, user_id_map, item_id_map).fit()
        restored = pickle.loads(pickle.dumps(rec))
        np.testing.assert_array_equal(
            rec.get_item_list_for_user("u3", top_n=4), restored.get_item_list_for_user("u3", top_n=4)
        )

    def test_dim_mismatch(self) -> None:
        user_vectors, item_vectors, user_id_map, item_id_map = _vectors()
        with pytest.raises(ValueError):
            UserToItemAnnRecommender(user_vectors[:, :4], item_vectors, user_id_map, item_id_map)


class TestItemToItemAnnRecommender:
    def test_excludes_self(self) -> None:
        _, item_vectors, _, item_id_map = _vectors()
        rec = ItemToItemAnnRecommender(item_vectors, item_id_map).fit()
        got = rec.get_item_list_for_item("i0", top_n=5)
        assert "i0" not in got
        assert len(got) == 5

    def test_batch(self) -> None:
        _, item_vectors, _, item_id_map = _vectors()
        rec = ItemToItemAnnRecommender(item_vectors, item_id_map).fit()
        got = rec.get_item_list_for_item_batch(["i0", "i1"], top_n=3)
        assert len(got) == 2
        assert all(len(g) == 3 for g in got)


class TestApproximateMode:
    """approximate=True routes ranking through jax.lax.approx_max_k — the
    TPU-native analogue of the reference's HNSW approximate search
    (nmslib, reference tools/ann.py:99). On CPU the op is exact."""

    def test_high_recall_vs_exact(self) -> None:
        rng = np.random.default_rng(0)
        items = rng.normal(size=(2000, 32)).astype(np.float32)
        users = rng.normal(size=(20, 32)).astype(np.float32)
        umap = IdMap.from_values(np.arange(20))
        imap = IdMap.from_values(np.arange(2000))
        exact = UserToItemAnnRecommender(users, items, umap, imap).fit()
        approx = UserToItemAnnRecommender(users, items, umap, imap, approximate=True).fit()
        overlaps = []
        for u in range(20):
            ex = set(exact.get_item_list_for_user(u, top_n=20))
            ap = set(approx.get_item_list_for_user(u, top_n=20))
            overlaps.append(len(ex & ap) / 20)
        assert np.mean(overlaps) >= 0.9

    def test_pickle_keeps_flag(self) -> None:
        import pickle

        rng = np.random.default_rng(0)
        items = rng.normal(size=(300, 8)).astype(np.float32)
        imap = IdMap.from_values(np.arange(300))
        rec = ItemToItemAnnRecommender(items, imap, approximate=True).fit()
        restored = pickle.loads(pickle.dumps(rec))
        assert restored.approximate is True
        assert list(restored.get_item_list_for_item(0, top_n=5)) == list(
            rec.get_item_list_for_item(0, top_n=5)
        )


class TestDistancesAndTuning:
    def test_dot_distance_matches_brute_force(self) -> None:
        user_vectors, item_vectors, user_id_map, item_id_map = _vectors()
        from rectools_tpu.models import Distance

        rec = UserToItemAnnRecommender(
            user_vectors, item_vectors, user_id_map, item_id_map, distance=Distance.DOT
        ).fit()
        got = rec.get_item_list_for_user("u2", top_n=5)
        expected = list(np.argsort(-(item_vectors @ user_vectors[2]))[:5])
        np.testing.assert_array_equal(got, item_id_map.convert_to_external(expected))

    def test_recall_target_roundtrips_through_pickle(self) -> None:
        user_vectors, item_vectors, user_id_map, item_id_map = _vectors()
        rec = UserToItemAnnRecommender(
            user_vectors, item_vectors, user_id_map, item_id_map,
            approximate=True, recall_target=0.85,
        ).fit()
        restored = pickle.loads(pickle.dumps(rec))
        assert restored.approximate and restored.recall_target == 0.85
        # engine is rebuilt lazily with the restored tuning
        restored.get_item_list_for_user("u0", top_n=3)
        assert restored._engine.recall_target == 0.85

    def test_i2i_excludes_self_even_with_overfetch(self) -> None:
        _, item_vectors, _, item_id_map = _vectors()
        rec = ItemToItemAnnRecommender(item_vectors, item_id_map, index_top_k=10).fit()
        for item in ("i0", "i5", "i19"):
            got = rec.get_item_list_for_item(item, top_n=6)
            assert item not in got
            assert len(got) == 6

    def test_i2i_whitelist_with_self_in_whitelist(self) -> None:
        _, item_vectors, _, item_id_map = _vectors()
        rec = ItemToItemAnnRecommender(item_vectors, item_id_map, index_top_k=20).fit()
        allowed = ["i0", "i1", "i2", "i3"]
        got = rec.get_item_list_for_item_batch(["i0"], top_n=3, item_available_ids=[allowed])
        # self is dropped even when whitelisted
        assert "i0" not in got[0]
        assert set(got[0]) <= set(allowed) - {"i0"}

    def test_dict_id_maps_accepted(self) -> None:
        user_vectors, item_vectors, *_ = _vectors()
        rec = UserToItemAnnRecommender(
            user_vectors,
            item_vectors,
            {f"u{i}": i for i in range(10)},
            {f"i{i}": i for i in range(20)},
        ).fit()
        got = rec.get_item_list_for_user("u1", top_n=4)
        assert len(got) == 4
