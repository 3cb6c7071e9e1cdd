"""Dense/SparseFeatures behavioral tests (pattern of reference
tests/dataset/test_features.py)."""

import numpy as np
import pandas as pd
import pytest
from scipy import sparse

from rectools_tpu.dataset import IdMap
from rectools_tpu.dataset.features import (
    DIRECT_FEATURE_VALUE,
    AbsentIdError,
    DenseFeatures,
    SparseFeatures,
)


class TestDenseFeatures:
    def test_from_dataframe_aligns_to_internal_order(self) -> None:
        id_map = IdMap.from_values(np.array(["b", "a"]))
        df = pd.DataFrame({"id": ["a", "b"], "f1": [1.0, 2.0], "f2": [3.0, 4.0]})
        features = DenseFeatures.from_dataframe(df, id_map)
        # internal 0 = "b" -> (2, 4); internal 1 = "a" -> (1, 3)
        np.testing.assert_array_equal(features.get_dense(), [[2.0, 4.0], [1.0, 3.0]])
        assert features.names == ("f1", "f2")

    def test_missing_id_raises(self) -> None:
        id_map = IdMap.from_values(np.array(["a", "b"]))
        df = pd.DataFrame({"id": ["a"], "f1": [1.0]})
        with pytest.raises(AbsentIdError):
            DenseFeatures.from_dataframe(df, id_map)

    def test_unknown_id_raises(self) -> None:
        id_map = IdMap.from_values(np.array(["a"]))
        df = pd.DataFrame({"id": ["a", "zz"], "f1": [1.0, 2.0]})
        with pytest.raises(AbsentIdError):
            DenseFeatures.from_dataframe(df, id_map)

    def test_duplicate_ids_raise(self) -> None:
        id_map = IdMap.from_values(np.array(["a"]))
        df = pd.DataFrame({"id": ["a", "a"], "f1": [1.0, 2.0]})
        with pytest.raises(ValueError):
            DenseFeatures.from_dataframe(df, id_map)

    def test_take(self) -> None:
        features = DenseFeatures.from_iterables([[1, 2], [3, 4], [5, 6]], ["x", "y"])
        taken = features.take(np.array([2, 0]))
        np.testing.assert_array_equal(taken.get_dense(), [[5, 6], [1, 2]])

    def test_name_length_mismatch_raises(self) -> None:
        with pytest.raises(ValueError):
            DenseFeatures(values=np.zeros((2, 3), dtype=np.float32), names=("a",))


class TestSparseFeatures:
    def _features(self) -> SparseFeatures:
        id_map = IdMap.from_values(np.array([1, 2, 3]))
        df = pd.DataFrame(
            {
                "id": [1, 1, 2, 3, 3],
                "feature": ["age", "genre", "age", "genre", "genre"],
                "value": [30, "rock", 40, "rock", "jazz"],
            }
        )
        return SparseFeatures.from_flatten(df, id_map, cat_features=["genre"])

    def test_direct_and_cat_blocks(self) -> None:
        features = self._features()
        assert features.names == (("age", DIRECT_FEATURE_VALUE), ("genre", "rock"), ("genre", "jazz"))
        dense = features.get_dense()
        np.testing.assert_array_equal(dense[:, 0], [30, 40, 0])  # direct age
        np.testing.assert_array_equal(dense[:, 1], [1, 0, 1])  # one-hot rock
        np.testing.assert_array_equal(dense[:, 2], [0, 0, 1])  # one-hot jazz

    def test_cat_col_mask_and_indices(self) -> None:
        features = self._features()
        np.testing.assert_array_equal(features.cat_col_mask, [False, True, True])
        np.testing.assert_array_equal(features.cat_feature_indices, [1, 2])

    def test_get_cat_features(self) -> None:
        cat = self._features().get_cat_features()
        assert cat.names == (("genre", "rock"), ("genre", "jazz"))
        assert cat.values.shape == (3, 2)

    def test_weights_multiply(self) -> None:
        id_map = IdMap.from_values(np.array([1]))
        df = pd.DataFrame(
            {"id": [1, 1], "feature": ["age", "age"], "value": [10, 5], "weight": [2.0, 1.0]}
        )
        features = SparseFeatures.from_flatten(df, id_map)
        # direct feature entries sum per object: 10*2 + 5*1
        assert features.get_dense()[0, 0] == 25.0

    def test_non_numeric_direct_value_raises(self) -> None:
        id_map = IdMap.from_values(np.array([1]))
        df = pd.DataFrame({"id": [1], "feature": ["age"], "value": ["old"]})
        with pytest.raises(TypeError):
            SparseFeatures.from_flatten(df, id_map)

    def test_absent_id_raises(self) -> None:
        id_map = IdMap.from_values(np.array([1]))
        df = pd.DataFrame({"id": [99], "feature": ["age"], "value": [1.0]})
        with pytest.raises(AbsentIdError):
            SparseFeatures.from_flatten(df, id_map)

    def test_missing_columns_raise(self) -> None:
        id_map = IdMap.from_values(np.array([1]))
        with pytest.raises(KeyError):
            SparseFeatures.from_flatten(pd.DataFrame({"id": [1]}), id_map)

    def test_take(self) -> None:
        features = self._features()
        taken = features.take(np.array([2]))
        np.testing.assert_array_equal(taken.get_dense(), features.get_dense()[[2]])

    def test_get_sparse_round_trip(self) -> None:
        features = self._features()
        assert sparse.issparse(features.get_sparse())
        np.testing.assert_array_equal(features.get_sparse().toarray(), features.get_dense())
