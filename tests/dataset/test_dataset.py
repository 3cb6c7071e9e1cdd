import numpy as np
import pandas as pd
import pytest
from scipy import sparse

from rectools_tpu import Columns
from rectools_tpu.dataset import (
    Dataset,
    DenseFeatures,
    IdMap,
    Interactions,
    SparseFeatures,
    get_context,
)


@pytest.fixture
def interactions_df():
    return pd.DataFrame(
        [
            ["u1", "i1", 2, "2021-09-09"],
            ["u1", "i2", 2, "2021-09-05"],
            ["u2", "i1", 5, "2021-09-08"],
            ["u2", "i3", 5, "2021-09-05"],
            ["u3", "i2", 1, "2021-09-05"],
        ],
        columns=Columns.Interactions,
    )


class TestIdMap:
    def test_from_values_first_appearance_order(self):
        idmap = IdMap.from_values(["b", "a", "b", "c"])
        assert list(idmap.external_ids) == ["b", "a", "c"]
        np.testing.assert_array_equal(idmap.convert_to_internal(["a", "c"]), [1, 2])
        np.testing.assert_array_equal(idmap.convert_to_external([0, 2]), ["b", "c"])

    def test_strict_missing_raises(self):
        idmap = IdMap.from_values(["a"])
        with pytest.raises(KeyError):
            idmap.convert_to_internal(["zzz"])

    def test_non_strict_return_missing(self):
        idmap = IdMap.from_values(["a", "b"])
        internal, missing = idmap.convert_to_internal(["a", "x"], strict=False, return_missing=True)
        np.testing.assert_array_equal(internal, [0])
        np.testing.assert_array_equal(missing, ["x"])

    def test_add_ids_appends_warm(self):
        idmap = IdMap.from_values(["a", "b"])
        new = idmap.add_ids(["b", "c", "d"])
        assert list(new.external_ids) == ["a", "b", "c", "d"]

    def test_from_dict(self):
        idmap = IdMap.from_dict({"x": 1, "y": 0})
        np.testing.assert_array_equal(idmap.convert_to_internal(["y", "x"]), [0, 1])

    def test_from_dict_invalid_internal(self):
        with pytest.raises(ValueError):
            IdMap.from_dict({"x": 1, "y": 2})


class TestInteractions:
    def test_from_raw_and_matrix(self, interactions_df):
        umap = IdMap.from_values(interactions_df[Columns.User].to_numpy())
        imap = IdMap.from_values(interactions_df[Columns.Item].to_numpy())
        interactions = Interactions.from_raw(interactions_df, umap, imap)
        mat = interactions.get_user_item_matrix()
        expected = np.array(
            [
                [2, 2, 0],
                [5, 0, 5],
                [0, 1, 0],
            ],
            dtype=np.float32,
        )
        np.testing.assert_array_equal(mat.toarray(), expected)

    def test_matrix_without_weights(self, interactions_df):
        umap = IdMap.from_values(interactions_df[Columns.User].to_numpy())
        imap = IdMap.from_values(interactions_df[Columns.Item].to_numpy())
        interactions = Interactions.from_raw(interactions_df, umap, imap)
        mat = interactions.get_user_item_matrix(include_weights=False)
        assert mat.max() == 1

    def test_to_external_roundtrip(self, interactions_df):
        umap = IdMap.from_values(interactions_df[Columns.User].to_numpy())
        imap = IdMap.from_values(interactions_df[Columns.Item].to_numpy())
        interactions = Interactions.from_raw(interactions_df, umap, imap)
        ext = interactions.to_external(umap, imap)
        np.testing.assert_array_equal(ext[Columns.User].to_numpy(), interactions_df[Columns.User].to_numpy())
        np.testing.assert_array_equal(ext[Columns.Item].to_numpy(), interactions_df[Columns.Item].to_numpy())


class TestFeatures:
    def test_sparse_from_flatten(self):
        idmap = IdMap.from_values(["o1", "o2"])
        df = pd.DataFrame(
            {
                "id": ["o1", "o1", "o2", "o2", "o2"],
                "feature": ["age", "genre", "age", "genre", "genre"],
                "value": [30, "rock", 40, "rock", "jazz"],
            }
        )
        features = SparseFeatures.from_flatten(df, idmap, cat_features=["genre"])
        dense = features.get_dense()
        # columns: age(direct), genre=rock, genre=jazz
        assert features.names[0][0] == "age"
        expected = np.array([[30, 1, 0], [40, 1, 1]], dtype=np.float32)
        np.testing.assert_array_equal(dense, expected)
        np.testing.assert_array_equal(features.cat_feature_indices, [1, 2])

    def test_sparse_direct_sum_and_weight(self):
        idmap = IdMap.from_values(["o1", "o2"])
        df = pd.DataFrame(
            {
                "id": ["o1", "o1", "o2"],
                "feature": ["f1", "f1", "f1"],
                "value": [10.0, 15.0, 20.0],
                "weight": [1.0, 1.0, 1.5],
            }
        )
        features = SparseFeatures.from_flatten(df, idmap)
        np.testing.assert_array_equal(features.get_dense(), [[25.0], [30.0]])

    def test_dense_features(self):
        idmap = IdMap.from_values(["o1", "o2"])
        df = pd.DataFrame({"id": ["o2", "o1"], "f1": [1.0, 2.0], "f2": [3.0, 4.0]})
        features = DenseFeatures.from_dataframe(df, idmap)
        np.testing.assert_array_equal(features.values, [[2.0, 4.0], [1.0, 3.0]])
        taken = features.take(np.array([1]))
        np.testing.assert_array_equal(taken.values, [[1.0, 3.0]])


class TestDataset:
    def test_construct(self, interactions_df):
        ds = Dataset.construct(interactions_df)
        assert ds.user_id_map.size == 3
        assert ds.item_id_map.size == 3
        assert ds.n_hot_users == 3
        assert ds.n_hot_items == 3

    def test_warm_items_via_features(self, interactions_df):
        item_features = pd.DataFrame(
            {
                "id": ["i1", "i2", "i3", "i_warm"],
                "feature": ["genre"] * 4,
                "value": ["a", "b", "a", "b"],
            }
        )
        ds = Dataset.construct(interactions_df, item_features_df=item_features, cat_item_features=["genre"])
        assert ds.item_id_map.size == 4
        assert ds.n_hot_items == 3
        hot = ds.get_hot_item_features()
        assert len(hot) == 3

    def test_matrix_include_warm(self, interactions_df):
        item_features = pd.DataFrame(
            {"id": ["i1", "i2", "i3", "iw"], "feature": ["f"] * 4, "value": ["x"] * 4}
        )
        ds = Dataset.construct(interactions_df, item_features_df=item_features, cat_item_features=["f"])
        mat = ds.get_user_item_matrix(include_warm_items=True)
        assert mat.shape == (3, 4)
        assert mat[:, 3].nnz == 0

    def test_schema(self, interactions_df):
        ds = Dataset.construct(interactions_df)
        schema = ds.get_schema()
        assert schema["n_interactions"] == 5
        assert schema["users"]["n_hot"] == 3
        assert schema["items"]["id_map"]["size"] == 3

    def test_filter_interactions(self, interactions_df):
        ds = Dataset.construct(interactions_df)
        filtered = ds.filter_interactions(np.array([0, 1, 4]))  # u1 x2, u3
        assert filtered.user_id_map.size == 2
        assert list(filtered.user_id_map.external_ids) == ["u1", "u3"]
        assert filtered.interactions.df.shape[0] == 3
        raw = filtered.get_raw_interactions()
        assert set(raw[Columns.User]) == {"u1", "u3"}

    def test_get_raw_interactions_roundtrip(self, interactions_df):
        ds = Dataset.construct(interactions_df)
        raw = ds.get_raw_interactions()
        np.testing.assert_array_equal(raw[Columns.User].to_numpy(), interactions_df[Columns.User].to_numpy())


class TestContext:
    def test_get_context(self, interactions_df):
        ctx = get_context(interactions_df)
        assert len(ctx) == 3
        assert Columns.Item not in ctx.columns
        u1_row = ctx[ctx[Columns.User] == "u1"]
        assert u1_row[Columns.Datetime].iloc[0] == pd.Timestamp("2021-09-05")
