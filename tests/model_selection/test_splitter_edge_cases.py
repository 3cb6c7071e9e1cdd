"""Edge-case pins for splitters + cross_validate, mirroring the reference's
test style (literal expected folds / stats; reference
tests/model_selection/test_*.py)."""

import numpy as np
import pandas as pd
import pytest

from rectools_tpu import Columns
from rectools_tpu.dataset import Dataset, Interactions
from rectools_tpu.metrics import Precision, Recall
from rectools_tpu.model_selection import (
    LastNSplitter,
    RandomSplitter,
    TimeRangeSplitter,
    cross_validate,
)
from rectools_tpu.models import PopularModel, RandomModel


def _interactions(rows) -> Interactions:
    df = pd.DataFrame(rows, columns=Columns.Interactions).astype({Columns.Datetime: "datetime64[ns]"})
    return Dataset.construct(df).interactions


class TestTimeRangeBorders:
    def test_last_dt_exactly_on_boundary_gets_extra_unit(self) -> None:
        # last interaction at exactly midnight: the ceiled border equals the
        # value, so one extra unit is added (reference time_split.py border
        # construction) — the last fold must still CONTAIN that interaction
        inter = _interactions(
            [
                [1, 1, 1, "2021-09-01 10:00"],
                [2, 2, 1, "2021-09-02 00:00"],
            ]
        )
        splitter = TimeRangeSplitter("1D", 1, False, False, False)
        borders = splitter.get_test_fold_borders(inter)
        assert borders == [(pd.Timestamp("2021-09-02"), pd.Timestamp("2021-09-03"))]
        (train, test, _), = list(splitter.split(inter))
        np.testing.assert_array_equal(train, [0])
        np.testing.assert_array_equal(test, [1])

    def test_hour_unit(self) -> None:
        inter = _interactions(
            [
                [1, 1, 1, "2021-09-01 03:30"],
                [1, 2, 1, "2021-09-01 07:10"],
                [2, 1, 1, "2021-09-01 11:40"],
            ]
        )
        splitter = TimeRangeSplitter("4H", 2, False, False, False)
        borders = splitter.get_test_fold_borders(inter)
        assert borders[0][0] == pd.Timestamp("2021-09-01 04:00")
        assert borders[1][1] == pd.Timestamp("2021-09-01 12:00")
        folds = list(splitter.split(inter))
        np.testing.assert_array_equal(folds[0][1], [1])
        np.testing.assert_array_equal(folds[1][1], [2])

    def test_empty_test_fold_yields_empty_arrays(self) -> None:
        # a fold window with no interactions must still be yielded (empty),
        # not skipped — fold count is the n_splits contract
        inter = _interactions(
            [
                [1, 1, 1, "2021-09-01"],
                [2, 2, 1, "2021-09-04"],
            ]
        )
        splitter = TimeRangeSplitter("1D", 3, False, False, False)
        folds = list(splitter.split(inter))
        assert len(folds) == 3
        assert folds[0][1].size == 0  # 2021-09-02 window
        assert folds[1][1].size == 0  # 2021-09-03 window
        np.testing.assert_array_equal(folds[2][1], [1])


class TestFilterComposition:
    ROWS = [
        [1, 1, 1, "2021-09-01"],  # 0 train
        [2, 1, 1, "2021-09-01"],  # 1 train
        [1, 1, 1, "2021-09-02"],  # 2 test: hot user, hot item, already seen
        [1, 2, 1, "2021-09-02"],  # 3 test: hot user, cold item
        [3, 1, 1, "2021-09-02"],  # 4 test: cold user, hot item
        [2, 1, 1, "2021-09-02"],  # 5 test: hot/hot, already seen
        [2, 2, 1, "2021-09-02"],  # 6 test: hot user, cold item
    ]

    def test_cold_user_only(self) -> None:
        inter = _interactions(self.ROWS)
        splitter = TimeRangeSplitter(
            "1D", 1, filter_cold_users=True, filter_cold_items=False, filter_already_seen=False
        )
        (_, test, _), = list(splitter.split(inter))
        np.testing.assert_array_equal(test, [2, 3, 5, 6])

    def test_cold_item_only(self) -> None:
        inter = _interactions(self.ROWS)
        splitter = TimeRangeSplitter(
            "1D", 1, filter_cold_users=False, filter_cold_items=True, filter_already_seen=False
        )
        (_, test, _), = list(splitter.split(inter))
        np.testing.assert_array_equal(test, [2, 4, 5])

    def test_already_seen_only(self) -> None:
        inter = _interactions(self.ROWS)
        splitter = TimeRangeSplitter(
            "1D", 1, filter_cold_users=False, filter_cold_items=False, filter_already_seen=True
        )
        (_, test, _), = list(splitter.split(inter))
        np.testing.assert_array_equal(test, [3, 4, 6])

    def test_all_filters(self) -> None:
        inter = _interactions(self.ROWS)
        splitter = TimeRangeSplitter("1D", 1)
        (_, test, _), = list(splitter.split(inter))
        np.testing.assert_array_equal(test, np.array([], dtype=int))

    def test_fold_stats_fields(self) -> None:
        inter = _interactions(self.ROWS)
        splitter = TimeRangeSplitter(
            "1D", 1, filter_cold_users=True, filter_cold_items=False, filter_already_seen=False
        )
        (_, _, info), = list(splitter.split(inter, collect_fold_stats=True))
        assert info["train"] == 2
        assert info["train_users"] == 2
        assert info["train_items"] == 1
        assert info["test"] == 4
        assert info["test_users"] == 2
        assert info["test_items"] == 2
        assert "start" in info and "end" in info


class TestLastNTies:
    def test_tied_datetimes_keep_table_order(self) -> None:
        # rank(method="first"): for equal datetimes the LATER table row is the
        # "more recent" interaction and goes to the test fold
        inter = _interactions(
            [
                [1, 1, 1, "2021-09-01"],  # 0
                [1, 2, 1, "2021-09-01"],  # 1  <- tied, later row => test
                [2, 3, 1, "2021-09-01"],  # 2
                [2, 4, 1, "2021-09-01"],  # 3  <- tied, later row => test
            ]
        )
        splitter = LastNSplitter(1, 1, False, False, False)
        (train, test, _), = list(splitter.split(inter))
        np.testing.assert_array_equal(train, [0, 2])
        np.testing.assert_array_equal(test, [1, 3])

    def test_users_with_fewer_than_n_go_entirely_to_test(self) -> None:
        inter = _interactions(
            [
                [1, 1, 1, "2021-09-01"],  # 0: user 1 has only 1 interaction
                [2, 1, 1, "2021-09-01"],  # 1
                [2, 2, 1, "2021-09-02"],  # 2
                [2, 3, 1, "2021-09-03"],  # 3
            ]
        )
        splitter = LastNSplitter(2, 1, False, False, False)
        (train, test, _), = list(splitter.split(inter))
        np.testing.assert_array_equal(train, [1])
        np.testing.assert_array_equal(test, [0, 2, 3])


class TestRandomSplitterSizes:
    def _inter(self, n: int) -> Interactions:
        rows = [[u % 7, u % 5, 1, "2021-09-01"] for u in range(n)]
        return _interactions(rows)

    def test_exact_fold_sizes_and_partition(self) -> None:
        inter = self._inter(20)
        splitter = RandomSplitter(0.25, 3, random_state=7, filter_cold_users=False,
                                  filter_cold_items=False, filter_already_seen=False)
        folds = list(splitter.split(inter))
        assert all(te.size == 5 for _, te, _ in folds)
        assert all(tr.size == 15 for tr, _, _ in folds)
        all_test = np.concatenate([te for _, te, _ in folds])
        assert np.unique(all_test).size == all_test.size  # non-overlapping

    def test_tiny_frac_empty_test_raises(self) -> None:
        inter = self._inter(10)
        splitter = RandomSplitter(0.01, filter_cold_users=False,
                                  filter_cold_items=False, filter_already_seen=False)
        with pytest.raises(ValueError, match="empty test"):
            list(splitter.split(inter))

    def test_too_many_folds_raise(self) -> None:
        # 0.4 * 10 = 4 per fold; 2 folds = 8 <= 10 OK at ctor time? ctor
        # checks frac*n<=1 (0.8), but 3 folds would exceed — ctor rejects
        with pytest.raises(ValueError):
            RandomSplitter(0.4, n_splits=3)


class TestCrossValidateOptions:
    DF = pd.DataFrame(
        [
            [1, 1, 1, "2021-09-01"],
            [2, 1, 1, "2021-09-01"],
            [2, 2, 1, "2021-09-02"],
            [3, 1, 1, "2021-09-02"],
            [3, 3, 1, "2021-09-03"],
            [1, 2, 1, "2021-09-04"],
            [2, 3, 1, "2021-09-04"],
            [3, 2, 1, "2021-09-04"],
        ],
        columns=Columns.Interactions,
    ).astype({Columns.Datetime: "datetime64[ns]"})

    def test_validate_ref_models_includes_ref_rows(self) -> None:
        dataset = Dataset.construct(self.DF)
        splitter = TimeRangeSplitter("1D", 1, False, False, False)
        models = {"popular": PopularModel(), "random": RandomModel(random_state=1)}
        result = cross_validate(
            dataset=dataset,
            splitter=splitter,
            metrics={"p@2": Precision(k=2)},
            models=models,
            k=2,
            filter_viewed=False,
            ref_models=["popular"],
            validate_ref_models=True,
            on_unsupported_targets="ignore",
        )
        assert {row["model"] for row in result["metrics"]} == {"popular", "random"}

    def test_items_to_recommend_restricts_catalog(self) -> None:
        dataset = Dataset.construct(self.DF)
        splitter = TimeRangeSplitter("1D", 1, False, False, False)
        # only item 1 allowed -> popular recommendations all hit item 1; recall
        # is the share of test users whose held-out item is item 1 (none: test
        # rows are items 2/3/2) => recall 0, but the run must not crash and
        # ranks must be within the whitelist
        result = cross_validate(
            dataset=dataset,
            splitter=splitter,
            metrics={"r@2": Recall(k=2)},
            models={"popular": PopularModel()},
            k=2,
            filter_viewed=False,
            items_to_recommend=[1],
            on_unsupported_targets="ignore",
        )
        assert result["metrics"][0]["r@2"] == 0.0

    def test_models_refit_per_fold(self) -> None:
        # the same model object is reused across folds: fit must fully reset
        dataset = Dataset.construct(self.DF)
        splitter = TimeRangeSplitter("1D", 2, False, False, False)
        model = PopularModel()
        result = cross_validate(
            dataset=dataset,
            splitter=splitter,
            metrics={"p@2": Precision(k=2)},
            models={"popular": model},
            k=2,
            filter_viewed=False,
            on_unsupported_targets="ignore",
        )
        assert len(result["metrics"]) == 2
        # after the run the model holds the LAST fold's popularity list —
        # refitting on the full dataset must change it cleanly
        model.fit(Dataset.construct(self.DF))
        assert model.is_fitted
