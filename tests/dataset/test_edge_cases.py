"""Behavioral edge cases for the data layer, modeled on the reference's
tests/dataset suite (validation errors, extra-column plumbing, conversion
flag combinations — reference tests/dataset/test_interactions.py,
test_identifiers.py, test_dataset.py)."""

import numpy as np
import pandas as pd
import pytest

from rectools_tpu import Columns
from rectools_tpu.dataset import Dataset, IdMap, Interactions
from rectools_tpu.dataset.context import get_context


@pytest.fixture
def raw_df() -> pd.DataFrame:
    return pd.DataFrame(
        {
            Columns.User: ["u1", "u2", "u1", "u3"],
            Columns.Item: ["i1", "i1", "i2", "i3"],
            Columns.Weight: [1, 2, 3, 4],
            Columns.Datetime: pd.to_datetime(
                ["2021-01-02", "2021-01-01", "2021-01-03", "2021-01-04"]
            ),
            "channel": ["app", "web", "app", "tv"],
        }
    )


class TestIdMapConversions:
    def test_external_dtype_preserved(self):
        for values, kind in [(["a", "b"], "U"), ([10, 20], "i"), ([1.5, 2.5], "f")]:
            id_map = IdMap.from_values(values)
            assert id_map.external_dtype.kind == kind

    def test_to_internal_and_to_external_series(self):
        id_map = IdMap.from_values(["b", "a", "c"])
        pd.testing.assert_series_equal(
            id_map.to_internal, pd.Series([0, 1, 2], index=pd.Index(["b", "a", "c"]))
        )
        pd.testing.assert_series_equal(
            id_map.to_external, pd.Series(["b", "a", "c"], index=np.arange(3))
        )

    def test_sorted_views(self):
        id_map = IdMap.from_values([30, 10, 20])
        np.testing.assert_array_equal(id_map.get_sorted_internal(), [0, 1, 2])
        np.testing.assert_array_equal(id_map.get_external_sorted_by_internal(), [30, 10, 20])

    def test_convert_to_internal_return_missing(self):
        id_map = IdMap.from_values(["a", "b"])
        found, missing = id_map.convert_to_internal(["b", "zz", "a"], strict=False, return_missing=True)
        np.testing.assert_array_equal(found, [1, 0])
        np.testing.assert_array_equal(missing, ["zz"])

    def test_convert_to_external_return_missing(self):
        id_map = IdMap.from_values(["a", "b"])
        found, missing = id_map.convert_to_external([1, 7, 0, -1], strict=False, return_missing=True)
        np.testing.assert_array_equal(found, ["b", "a"])
        np.testing.assert_array_equal(missing, [7, -1])

    @pytest.mark.parametrize("direction", ["internal", "external"])
    def test_return_missing_requires_non_strict(self, direction):
        id_map = IdMap.from_values(["a"])
        convert = getattr(id_map, f"convert_to_{direction}")
        with pytest.raises(ValueError):
            convert(["a"] if direction == "internal" else [0], strict=True, return_missing=True)

    def test_add_ids_raise_if_already_present(self):
        id_map = IdMap.from_values(["a", "b"])
        with pytest.raises(ValueError):
            id_map.add_ids(["b", "c"], raise_if_already_present=True)

    def test_add_ids_dedups_new_values(self):
        id_map = IdMap.from_values(["a"]).add_ids(["c", "b", "c", "a"])
        np.testing.assert_array_equal(id_map.external_ids, ["a", "c", "b"])

    def test_from_dict_rejects_non_permutation(self):
        with pytest.raises(ValueError):
            IdMap.from_dict({"a": 0, "b": 2})

    def test_empty_map(self):
        id_map = IdMap.from_values([])
        assert id_map.size == 0
        np.testing.assert_array_equal(id_map.add_ids(["x"]).external_ids, ["x"])


class TestInteractionsValidation:
    def test_missing_column_raises(self, raw_df):
        user_map = IdMap.from_values(raw_df[Columns.User])
        item_map = IdMap.from_values(raw_df[Columns.Item])
        with pytest.raises(KeyError):
            Interactions.from_raw(raw_df.drop(columns=[Columns.Weight]), user_map, item_map)

    @pytest.mark.parametrize("col", [Columns.User, Columns.Item])
    def test_non_integer_internal_ids_raise(self, col):
        df = pd.DataFrame(
            {
                Columns.User: [0, 1],
                Columns.Item: [0, 1],
                Columns.Weight: [1.0, 1.0],
                Columns.Datetime: pd.to_datetime(["2021-01-01"] * 2),
            }
        )
        df[col] = df[col].astype(float)
        with pytest.raises(TypeError):
            Interactions(df)

    @pytest.mark.parametrize("col", [Columns.User, Columns.Item])
    def test_negative_internal_ids_raise(self, col):
        df = pd.DataFrame(
            {
                Columns.User: [0, 1],
                Columns.Item: [0, 1],
                Columns.Weight: [1.0, 1.0],
                Columns.Datetime: pd.to_datetime(["2021-01-01"] * 2),
            }
        )
        df.loc[0, col] = -1
        with pytest.raises(ValueError):
            Interactions(df)

    def test_non_numeric_weight_raises(self):
        df = pd.DataFrame(
            {
                Columns.User: [0],
                Columns.Item: [0],
                Columns.Weight: ["heavy"],
                Columns.Datetime: pd.to_datetime(["2021-01-01"]),
            }
        )
        with pytest.raises(TypeError):
            Interactions(df)

    def test_bad_datetime_raises(self):
        df = pd.DataFrame(
            {
                Columns.User: [0],
                Columns.Item: [0],
                Columns.Weight: [1.0],
                Columns.Datetime: ["not-a-date"],
            }
        )
        with pytest.raises(TypeError):
            Interactions(df)

    def test_integer_weight_coerced_to_float(self):
        df = pd.DataFrame(
            {
                Columns.User: [0],
                Columns.Item: [0],
                Columns.Weight: [3],
                Columns.Datetime: pd.to_datetime(["2021-01-01"]),
            }
        )
        inter = Interactions(df)
        assert np.issubdtype(inter.df[Columns.Weight].dtype, np.floating)


class TestExtraColumns:
    def test_from_raw_drops_extra_cols_by_default(self, raw_df):
        user_map = IdMap.from_values(raw_df[Columns.User])
        item_map = IdMap.from_values(raw_df[Columns.Item])
        inter = Interactions.from_raw(raw_df, user_map, item_map)
        assert "channel" not in inter.df.columns

    def test_from_raw_keeps_extra_cols(self, raw_df):
        user_map = IdMap.from_values(raw_df[Columns.User])
        item_map = IdMap.from_values(raw_df[Columns.Item])
        inter = Interactions.from_raw(raw_df, user_map, item_map, keep_extra_cols=True)
        np.testing.assert_array_equal(inter.df["channel"], raw_df["channel"])

    @pytest.mark.parametrize("include_weight", [True, False])
    @pytest.mark.parametrize("include_datetime", [True, False])
    @pytest.mark.parametrize("include_extra_cols", [True, False])
    def test_to_external_flags(self, raw_df, include_weight, include_datetime, include_extra_cols):
        user_map = IdMap.from_values(raw_df[Columns.User])
        item_map = IdMap.from_values(raw_df[Columns.Item])
        inter = Interactions.from_raw(raw_df, user_map, item_map, keep_extra_cols=True)
        res = inter.to_external(
            user_map,
            item_map,
            include_weight=include_weight,
            include_datetime=include_datetime,
            include_extra_cols=include_extra_cols,
        )
        assert (Columns.Weight in res.columns) == include_weight
        assert (Columns.Datetime in res.columns) == include_datetime
        assert ("channel" in res.columns) == include_extra_cols
        np.testing.assert_array_equal(res[Columns.User], raw_df[Columns.User])
        np.testing.assert_array_equal(res[Columns.Item], raw_df[Columns.Item])

    def test_construct_keep_extra_cols_round_trip(self, raw_df):
        ds = Dataset.construct(raw_df, keep_extra_cols=True)
        raw_back = ds.get_raw_interactions()
        np.testing.assert_array_equal(raw_back["channel"], raw_df["channel"])


class TestDatasetConstructValidation:
    @pytest.mark.parametrize("col", [Columns.User, Columns.Item])
    def test_missing_id_column_raises(self, raw_df, col):
        with pytest.raises(KeyError):
            Dataset.construct(raw_df.drop(columns=[col]))

    def test_empty_interactions(self):
        df = pd.DataFrame(
            {
                Columns.User: pd.Series([], dtype=np.int64),
                Columns.Item: pd.Series([], dtype=np.int64),
                Columns.Weight: pd.Series([], dtype=float),
                Columns.Datetime: pd.Series([], dtype="datetime64[ns]"),
            }
        )
        ds = Dataset.construct(df)
        assert ds.user_id_map.size == 0 and ds.item_id_map.size == 0

    def test_user_item_matrix_duplicate_pairs_sum(self):
        df = pd.DataFrame(
            {
                Columns.User: ["u", "u", "v"],
                Columns.Item: ["i", "i", "i"],
                Columns.Weight: [1.0, 2.0, 5.0],
                Columns.Datetime: pd.to_datetime(["2021-01-01"] * 3),
            }
        )
        csr = Dataset.construct(df).get_user_item_matrix()
        assert csr[0, 0] == 3.0 and csr[1, 0] == 5.0


class TestContextEdgeCases:
    def test_wrong_datetime_type_raises(self):
        df = pd.DataFrame({Columns.User: [1], Columns.Datetime: ["nope"], Columns.Item: [5]})
        with pytest.raises(TypeError):
            get_context(df)

    def test_missing_weight_filled(self):
        df = pd.DataFrame(
            {
                Columns.User: [1, 1, 2],
                Columns.Item: [5, 6, 7],
                Columns.Datetime: pd.to_datetime(["2021-01-02", "2021-01-01", "2021-01-03"]),
            }
        )
        ctx = get_context(df)
        assert Columns.Weight in ctx.columns
        assert Columns.Item not in ctx.columns
        # earliest row per user survives
        assert ctx.loc[ctx[Columns.User] == 1, Columns.Datetime].iloc[0] == pd.Timestamp("2021-01-01")
