"""Splitters + cross_validate tests
(pattern of reference tests/model_selection/*)."""

import numpy as np
import pandas as pd

from rectools_tpu import Columns
from rectools_tpu.dataset import Dataset, Interactions
from rectools_tpu.metrics import MAP, Intersection, Precision, Recall
from rectools_tpu.model_selection import (
    LastNSplitter,
    RandomSplitter,
    TimeRangeSplitter,
    cross_validate,
    get_not_seen_mask,
)
from rectools_tpu.models import PopularModel, RandomModel

DF = pd.DataFrame(
    [
        [1, 2, 1, "2021-09-01"],
        [2, 1, 1, "2021-09-02"],
        [2, 3, 1, "2021-09-03"],
        [3, 2, 1, "2021-09-03"],
        [3, 3, 1, "2021-09-04"],
        [4, 4, 1, "2021-09-04"],
        [1, 2, 1, "2021-09-05"],
        [4, 2, 1, "2021-09-05"],
    ],
    columns=Columns.Interactions,
).astype({Columns.Datetime: "datetime64[ns]"})


def _interactions() -> Interactions:
    ds = Dataset.construct(DF)
    return ds.interactions


class TestGetNotSeenMask:
    def test_basic(self) -> None:
        mask = get_not_seen_mask(
            np.array([0, 1]), np.array([5, 6]), np.array([0, 0, 1]), np.array([5, 7, 6])
        )
        np.testing.assert_array_equal(mask, [False, True, False])

    def test_empty_train(self) -> None:
        mask = get_not_seen_mask(np.array([]), np.array([]), np.array([1]), np.array([2]))
        np.testing.assert_array_equal(mask, [True])


class TestTimeRangeSplitter:
    def test_folds(self) -> None:
        interactions = _interactions()
        splitter = TimeRangeSplitter(
            "1D", 2, filter_cold_users=False, filter_cold_items=False, filter_already_seen=False
        )
        folds = list(splitter.split(interactions))
        assert len(folds) == 2
        train_0, test_0, info_0 = folds[0]
        np.testing.assert_array_equal(train_0, [0, 1, 2, 3])
        np.testing.assert_array_equal(test_0, [4, 5])
        assert info_0["i_split"] == 0

    def test_filters(self) -> None:
        interactions = _interactions()
        splitter = TimeRangeSplitter("1D", 2)
        folds = list(splitter.split(interactions, collect_fold_stats=True))
        # fold 0: test row 5 (user 4 cold) filtered out; row 4 kept (user/item hot)
        _, test_0, info_0 = folds[0]
        np.testing.assert_array_equal(test_0, [4])
        assert info_0["test"] == 1
        # fold 1: test rows 6 (already seen pair 1-2), 7 kept
        _, test_1, _ = folds[1]
        np.testing.assert_array_equal(test_1, [7])

    def test_bad_test_size(self) -> None:
        import pytest

        with pytest.raises(ValueError):
            TimeRangeSplitter("1W")


class TestLastNSplitter:
    def test_folds(self) -> None:
        df = pd.DataFrame(
            [
                [1, 1, 1, "2021-09-01"],
                [1, 2, 1, "2021-09-02"],
                [1, 1, 1, "2021-09-03"],
                [1, 2, 1, "2021-09-04"],
                [1, 2, 1, "2021-09-05"],
                [2, 1, 1, "2021-08-20"],
                [2, 2, 1, "2021-08-21"],
                [2, 2, 1, "2021-08-22"],
            ],
            columns=Columns.Interactions,
        ).astype({Columns.Datetime: "datetime64[ns]"})
        interactions = Dataset.construct(df).interactions
        splitter = LastNSplitter(2, 2, False, False, False)
        folds = list(splitter.split(interactions))
        np.testing.assert_array_equal(folds[0][0], [0])
        np.testing.assert_array_equal(folds[0][1], [1, 2, 5])
        np.testing.assert_array_equal(folds[1][0], [0, 1, 2, 5])
        np.testing.assert_array_equal(folds[1][1], [3, 4, 6, 7])


class TestRandomSplitter:
    def test_reproducible_non_overlapping(self) -> None:
        interactions = _interactions()
        splitter = RandomSplitter(
            0.25, 2, random_state=42, filter_cold_users=False, filter_cold_items=False, filter_already_seen=False
        )
        folds_1 = list(splitter.split(interactions))
        folds_2 = list(RandomSplitter(0.25, 2, random_state=42, filter_cold_users=False,
                                      filter_cold_items=False, filter_already_seen=False).split(interactions))
        for (tr1, te1, _), (tr2, te2, _) in zip(folds_1, folds_2):
            np.testing.assert_array_equal(tr1, tr2)
            np.testing.assert_array_equal(te1, te2)
        assert not set(folds_1[0][1]) & set(folds_1[1][1])

    def test_invalid_frac(self) -> None:
        import pytest

        with pytest.raises(ValueError):
            RandomSplitter(0.0)
        with pytest.raises(ValueError):
            RandomSplitter(0.6, n_splits=2)


class TestCrossValidate:
    def test_basic(self) -> None:
        dataset = Dataset.construct(DF)
        splitter = TimeRangeSplitter("1D", 2, False, False, False)
        models = {
            "popular": PopularModel(),
            "random": RandomModel(random_state=42),
        }
        metrics = {"precision@2": Precision(k=2), "recall@2": Recall(k=2), "map@2": MAP(k=2)}
        result = cross_validate(
            dataset=dataset,
            splitter=splitter,
            metrics=metrics,
            models=models,
            k=2,
            filter_viewed=False,
            on_unsupported_targets="ignore",
        )
        assert len(result["splits"]) == 2
        assert len(result["metrics"]) == 4  # 2 models x 2 folds
        for row in result["metrics"]:
            assert set(row) == {"model", "i_split"} | set(metrics)

    def test_ref_models_intersection(self) -> None:
        dataset = Dataset.construct(DF)
        splitter = TimeRangeSplitter("1D", 1, False, False, False)
        models = {
            "popular": PopularModel(),
            "random": RandomModel(random_state=42),
        }
        metrics = {"int@2": Intersection(k=2)}
        result = cross_validate(
            dataset=dataset,
            splitter=splitter,
            metrics=metrics,
            models=models,
            k=2,
            filter_viewed=False,
            ref_models=["popular"],
            on_unsupported_targets="ignore",
        )
        # only "random" is validated; intersection vs ref model "popular"
        assert len(result["metrics"]) == 1
        assert "int@2_popular" in result["metrics"][0]
