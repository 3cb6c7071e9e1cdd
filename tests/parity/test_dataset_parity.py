"""Data-layer parity: IdMap, Interactions, SparseFeatures and Dataset
construction behave identically to the reference on the same raw inputs."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def raw():
    rng = np.random.default_rng(9)
    n = 2000
    inter = pd.DataFrame(
        {
            "user_id": rng.choice([f"u{i}" for i in range(60)], n),
            "item_id": rng.integers(100, 160, n),
            "weight": rng.random(n).round(3),
            "datetime": pd.to_datetime("2024-02-01") + pd.to_timedelta(rng.integers(0, 5000, n), unit="m"),
        }
    )
    item_ids = np.unique(inter["item_id"])
    features = pd.DataFrame(
        {
            "id": np.concatenate([item_ids, item_ids]),
            "feature": ["genre"] * len(item_ids) + ["year"] * len(item_ids),
            "value": list(rng.choice(list("abc"), len(item_ids))) + list(rng.integers(1990, 2020, len(item_ids))),
        }
    )
    return inter, features


class TestIdMapParity:
    def test_from_values_order_and_conversion(self, raw) -> None:
        from rectools.dataset import IdMap as RefIdMap

        from rectools_tpu.dataset import IdMap

        inter, _ = raw
        ref_map = RefIdMap.from_values(inter["user_id"].values)
        tpu_map = IdMap.from_values(inter["user_id"].values)
        np.testing.assert_array_equal(ref_map.external_ids, tpu_map.external_ids)
        probe = inter["user_id"].values[:50]
        np.testing.assert_array_equal(
            ref_map.convert_to_internal(probe), tpu_map.convert_to_internal(probe)
        )
        internal = np.arange(10)
        np.testing.assert_array_equal(
            ref_map.convert_to_external(internal), tpu_map.convert_to_external(internal)
        )

    def test_add_ids_appends_consistently(self, raw) -> None:
        from rectools.dataset import IdMap as RefIdMap

        from rectools_tpu.dataset import IdMap

        inter, _ = raw
        base = inter["user_id"].values[:100]
        extra = np.array(["z1", "z2", "u0"])  # one duplicate
        ref_map = RefIdMap.from_values(base).add_ids(extra, raise_if_already_present=False)
        tpu_map = IdMap.from_values(base).add_ids(extra, raise_if_already_present=False)
        np.testing.assert_array_equal(ref_map.external_ids, tpu_map.external_ids)


class TestDatasetParity:
    def test_user_item_matrix_equal(self, raw) -> None:
        from rectools.dataset import Dataset as RefDataset

        from rectools_tpu.dataset import Dataset

        inter, _ = raw
        ref_ds = RefDataset.construct(inter)
        tpu_ds = Dataset.construct(inter)
        ref_csr = ref_ds.get_user_item_matrix(include_weights=True)
        tpu_csr = tpu_ds.get_user_item_matrix(include_weights=True)
        assert ref_csr.shape == tpu_csr.shape
        assert (ref_csr != tpu_csr).nnz == 0

    def test_sparse_features_structure(self, raw) -> None:
        from rectools.dataset import Dataset as RefDataset

        from rectools_tpu.dataset import Dataset

        inter, features = raw
        ref_ds = RefDataset.construct(
            inter, item_features_df=features, cat_item_features=["genre"], make_dense_item_features=False
        )
        tpu_ds = Dataset.construct(
            inter, item_features_df=features, cat_item_features=["genre"], make_dense_item_features=False
        )
        ref_f = ref_ds.item_features
        tpu_f = tpu_ds.item_features
        assert [tuple(n) for n in ref_f.names] == [tuple(n) for n in tpu_f.names]
        assert (ref_f.values != tpu_f.values).nnz == 0
        np.testing.assert_array_equal(
            np.sort(ref_f.cat_feature_indices), np.sort(tpu_f.cat_feature_indices)
        )

    def test_filter_interactions_fold_dataset(self, raw) -> None:
        from rectools.dataset import Dataset as RefDataset

        from rectools_tpu.dataset import Dataset

        inter, _ = raw
        ref_ds = RefDataset.construct(inter)
        tpu_ds = Dataset.construct(inter)
        keep = np.arange(0, len(inter), 2)
        ref_fold = ref_ds.filter_interactions(keep)
        tpu_fold = tpu_ds.filter_interactions(keep)
        np.testing.assert_array_equal(
            ref_fold.user_id_map.external_ids, tpu_fold.user_id_map.external_ids
        )
        np.testing.assert_array_equal(
            ref_fold.item_id_map.external_ids, tpu_fold.item_id_map.external_ids
        )
        assert len(ref_fold.interactions.df) == len(tpu_fold.interactions.df)

    def test_get_raw_interactions_round_trip(self, raw) -> None:
        from rectools.dataset import Dataset as RefDataset

        from rectools_tpu.dataset import Dataset

        inter, _ = raw
        ref_raw = RefDataset.construct(inter).get_raw_interactions()
        tpu_raw = Dataset.construct(inter).get_raw_interactions()
        cols = ["user_id", "item_id", "weight"]
        ref_sorted = ref_raw.sort_values(cols).reset_index(drop=True)
        tpu_sorted = tpu_raw.sort_values(cols).reset_index(drop=True)
        for col in cols:
            np.testing.assert_array_equal(ref_sorted[col].to_numpy(), tpu_sorted[col].to_numpy())
