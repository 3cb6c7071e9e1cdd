"""Utility-layer tests (reference strategy: tests/utils/*).

Covers the host-side id/set helpers (rectools/utils/array_set_ops.py,
indexing.py, misc.py behavioral parity).
"""

import typing as tp

import numpy as np
import pandas as pd
import pytest

from rectools_tpu.utils import (
    fast_2d_2col_int_unique,
    fast_2d_int_unique,
    fast_isin,
    fast_isin_for_sorted_test_elements,
    get_element_ids,
    get_from_series_by_index,
    import_object,
    is_instance,
    isin_2d_int,
    log_at_base,
    make_dict_flat,
    pairwise,
    select_by_type,
    unflatten_dict,
)


class TestFastIsin:
    def test_int_arrays(self) -> None:
        np.testing.assert_array_equal(
            fast_isin(np.array([1, 2, 5]), np.array([2, 3, 5])), [False, True, True]
        )

    def test_invert(self) -> None:
        np.testing.assert_array_equal(
            fast_isin(np.array([1, 2, 5]), np.array([2, 3, 5]), invert=True), [True, False, False]
        )

    def test_object_dtype(self) -> None:
        elements = np.array(["a", 1, "b"], dtype=object)
        test = np.array(["b", 1], dtype=object)
        np.testing.assert_array_equal(fast_isin(elements, test), [False, True, True])
        np.testing.assert_array_equal(fast_isin(elements, test, invert=True), [True, False, False])


class TestFastIsinForSortedTestElements:
    def test_basic(self) -> None:
        res = fast_isin_for_sorted_test_elements(np.array([10, 3, 2]), np.array([2, 5, 10]))
        np.testing.assert_array_equal(res, [True, False, True])

    def test_invert(self) -> None:
        res = fast_isin_for_sorted_test_elements(np.array([10, 3]), np.array([2, 5, 10]), invert=True)
        np.testing.assert_array_equal(res, [False, True])


class TestFast2dUnique:
    def test_unique_rows_and_inverse(self) -> None:
        arr = np.array([[1, 2], [3, 4], [1, 2]])
        unique, inverse = fast_2d_int_unique(arr)
        assert len(unique) == 2
        np.testing.assert_array_equal(unique[inverse], arr)

    def test_2col_sorted_unique(self) -> None:
        arr = np.array([[10, 30], [10, 555], [10, 30], [10, 30], [1, 2], [1, 2]])
        np.testing.assert_array_equal(fast_2d_2col_int_unique(arr), [[1, 2], [10, 30], [10, 555]])

    def test_2col_empty(self) -> None:
        arr = np.empty((0, 2), dtype=np.int64)
        assert fast_2d_2col_int_unique(arr).shape == (0, 2)

    @pytest.mark.parametrize(
        "bad,err",
        [
            (np.array([[1.5, 2.0]]), TypeError),
            (np.array([1, 2, 3]), ValueError),
            (np.array([[1, 2, 3]]), ValueError),
        ],
    )
    def test_2col_validation(self, bad: np.ndarray, err: type) -> None:
        with pytest.raises(err):
            fast_2d_2col_int_unique(bad)


class TestIsin2dInt:
    def test_row_membership(self) -> None:
        ar1 = np.array([[1, 2], [3, 4], [5, 6]])
        ar2 = np.array([[3, 4], [7, 8]])
        np.testing.assert_array_equal(isin_2d_int(ar1, ar2), [False, True, False])


class TestIndexing:
    def test_get_from_series_by_index(self) -> None:
        s = pd.Series([10, 20, 30], index=["a", "b", "c"])
        np.testing.assert_array_equal(get_from_series_by_index(s, ["c", "a"]), [30, 10])

    def test_get_from_series_missing_raises(self) -> None:
        s = pd.Series([10], index=["a"])
        with pytest.raises(KeyError):
            get_from_series_by_index(s, ["zz"])

    def test_get_element_ids(self) -> None:
        res = get_element_ids(np.array([20, 10]), np.array([10, 20, 30]))
        np.testing.assert_array_equal(res, [1, 0])


class TestMisc:
    def test_pairwise(self) -> None:
        assert list(pairwise(range(4))) == [(0, 1), (1, 2), (2, 3)]
        assert list(pairwise([])) == []

    def test_is_instance_generics(self) -> None:
        number = tp.Union[int, float]
        assert is_instance(1, number)
        assert is_instance(0.5, number)
        assert not is_instance("abc", number)
        assert is_instance("abc", (number, str))

    def test_select_by_type_generics(self) -> None:
        number = tp.Union[int, float]
        assert select_by_type({1: 10, 2: 0.5, 3: "abc", 4: [1, 2]}, (number, str)) == {
            1: 10,
            2: 0.5,
            3: "abc",
        }

    def test_log_at_base(self) -> None:
        np.testing.assert_allclose(log_at_base(np.array([1, 2, 32]), 2), [0.0, 1.0, 5.0])

    def test_flat_round_trip(self) -> None:
        nested = {"a": {"b": 1, "c": {"d": 2}}, "e": 3}
        flat = make_dict_flat(nested)
        assert flat == {"a.b": 1, "a.c.d": 2, "e": 3}
        assert unflatten_dict(flat) == nested

    def test_import_object(self) -> None:
        assert import_object("numpy.ndarray") is np.ndarray


class TestTopLevelExports:
    def test_type_aliases_exported(self) -> None:
        import rectools_tpu as rt

        for name in ("AnyIds", "AnySequence", "ExternalIds", "InternalIds", "__version__"):
            assert hasattr(rt, name)
