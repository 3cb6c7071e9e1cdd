"""Pinned-literal edge-case tests for the recommend orchestration (the
reference pins exact DataFrames for these combinations in tests/models/*;
SURVEY.md §4 calls them the de-facto conformance suite).

Canonical dataset popularity order (n_users):
11 -> 4, 12 -> 3, 14 -> 2, 15 -> 2, 13 -> 1, 17 -> 1
user 10 saw {11, 12, 14}; 20 saw {11, 12, 15}; 30 saw {11, 12, 13, 14};
40 saw {11, 15, 17}.
"""

import numpy as np
import pandas as pd
import pytest

from rectools_tpu import Columns
from rectools_tpu.models import PopularModel, RandomModel

from .data import DATASET, INTERACTIONS


def _expect(rows):
    return pd.DataFrame(rows, columns=Columns.Recommendations).astype(
        {Columns.User: np.int64, Columns.Item: np.int64, Columns.Score: np.float64, Columns.Rank: np.int64}
    )


def _assert_frame(actual: pd.DataFrame, expected: pd.DataFrame) -> None:
    actual = actual.reset_index(drop=True).astype(expected.dtypes.to_dict())
    pd.testing.assert_frame_equal(actual[expected.columns], expected)


class TestPopularPinned:
    def test_filter_viewed(self) -> None:
        reco = PopularModel().fit(DATASET).recommend([10, 20], DATASET, k=4, filter_viewed=True)
        _assert_frame(
            reco,
            _expect(
                [
                    [10, 15, 2.0, 1],
                    [10, 13, 1.0, 2],
                    [10, 17, 1.0, 3],
                    [20, 14, 2.0, 1],
                    [20, 13, 1.0, 2],
                    [20, 17, 1.0, 3],
                ]
            ),
        )

    def test_whitelist_with_filter_viewed(self) -> None:
        reco = PopularModel().fit(DATASET).recommend(
            [10], DATASET, k=4, filter_viewed=True, items_to_recommend=[12, 13, 17]
        )
        # 12 is seen by user 10 -> only 13 and 17 remain, ranks stay dense
        _assert_frame(reco, _expect([[10, 13, 1.0, 1], [10, 17, 1.0, 2]]))

    def test_whitelist_without_filter_viewed(self) -> None:
        reco = PopularModel().fit(DATASET).recommend(
            [10], DATASET, k=4, filter_viewed=False, items_to_recommend=[12, 13, 17]
        )
        _assert_frame(reco, _expect([[10, 12, 3.0, 1], [10, 13, 1.0, 2], [10, 17, 1.0, 3]]))

    def test_mixed_hot_and_cold_targets(self) -> None:
        reco = PopularModel().fit(DATASET).recommend(
            [10, 99], DATASET, k=3, filter_viewed=True, on_unsupported_targets="ignore"
        )
        # hot user filtered by history; cold user gets the raw popularity head
        _assert_frame(
            reco,
            _expect(
                [
                    [10, 15, 2.0, 1],
                    [10, 13, 1.0, 2],
                    [10, 17, 1.0, 3],
                    [99, 11, 4.0, 1],
                    [99, 12, 3.0, 2],
                    [99, 14, 2.0, 3],
                ]
            ),
        )

    def test_cold_with_whitelist(self) -> None:
        reco = PopularModel().fit(DATASET).recommend(
            [99], DATASET, k=3, filter_viewed=False, items_to_recommend=[13, 15, 17],
            on_unsupported_targets="ignore",
        )
        _assert_frame(reco, _expect([[99, 15, 2.0, 1], [99, 13, 1.0, 2], [99, 17, 1.0, 3]]))

    def test_k_exceeds_available_after_filters(self) -> None:
        reco = PopularModel().fit(DATASET).recommend(
            [30], DATASET, k=10, filter_viewed=True
        )  # user 30 saw 4 of 6 items
        _assert_frame(reco, _expect([[30, 15, 2.0, 1], [30, 17, 1.0, 2]]))

    def test_i2i_filter_itself_pinned(self) -> None:
        reco = PopularModel().fit(DATASET).recommend_to_items([11, 13], DATASET, k=3)
        expected = pd.DataFrame(
            [
                [11, 12, 3.0, 1],
                [11, 14, 2.0, 2],
                [11, 15, 2.0, 3],
                [13, 11, 4.0, 1],
                [13, 12, 3.0, 2],
                [13, 14, 2.0, 3],
            ],
            columns=[Columns.TargetItem, Columns.Item, Columns.Score, Columns.Rank],
        )
        actual = reco.reset_index(drop=True).astype(
            {Columns.TargetItem: np.int64, Columns.Item: np.int64, Columns.Score: np.float64, Columns.Rank: np.int64}
        )
        pd.testing.assert_frame_equal(actual[expected.columns], expected.astype(actual.dtypes.to_dict()))

    def test_i2i_keep_itself(self) -> None:
        reco = PopularModel().fit(DATASET).recommend_to_items([11], DATASET, k=3, filter_itself=False)
        assert list(reco[Columns.Item]) == [11, 12, 14]
        assert list(reco[Columns.Rank]) == [1, 2, 3]


class TestRandomPinned:
    def test_whitelist_filter_and_determinism(self) -> None:
        model = RandomModel(random_state=32).fit(DATASET)
        reco = model.recommend([10, 20], DATASET, k=3, filter_viewed=True, items_to_recommend=[12, 13, 14, 15])
        seen = {10: {11, 12, 14}, 20: {11, 12, 15}}
        for user, group in reco.groupby(Columns.User):
            assert set(group[Columns.Item]).issubset({12, 13, 14, 15})
            assert not (set(group[Columns.Item]) & seen[user])
            assert list(group[Columns.Rank]) == list(range(1, len(group) + 1))
        again = RandomModel(random_state=32).fit(DATASET).recommend(
            [10, 20], DATASET, k=3, filter_viewed=True, items_to_recommend=[12, 13, 14, 15]
        )
        pd.testing.assert_frame_equal(reco.reset_index(drop=True), again.reset_index(drop=True))

    def test_cold_targets_get_random_whitelist_items(self) -> None:
        model = RandomModel(random_state=7).fit(DATASET)
        reco = model.recommend(
            [99, 98], DATASET, k=2, filter_viewed=False, items_to_recommend=[13, 17],
            on_unsupported_targets="ignore",
        )
        assert set(reco[Columns.User]) == {98, 99}
        for _, group in reco.groupby(Columns.User):
            assert set(group[Columns.Item]).issubset({13, 17})


class TestRankColumnInvariants:
    @pytest.mark.parametrize("filter_viewed", [True, False])
    def test_ranks_dense_and_scores_monotone(self, filter_viewed) -> None:
        reco = PopularModel().fit(DATASET).recommend(
            INTERACTIONS[Columns.User].unique(), DATASET, k=5, filter_viewed=filter_viewed
        )
        for _, group in reco.groupby(Columns.User):
            assert list(group[Columns.Rank]) == list(range(1, len(group) + 1))
            assert (group[Columns.Score].diff().dropna() <= 0).all()


class TestRecoTableRank:
    def test_rank_matches_groupby_cumcount_any_order(self) -> None:
        from rectools_tpu.models.base import ModelBase

        rng = np.random.default_rng(0)
        targets = rng.integers(0, 50, 2000)  # repeated, NON-contiguous targets
        items = rng.integers(0, 500, 2000)
        scores = rng.random(2000).astype(np.float32)
        df = ModelBase._make_reco_table((targets, items, scores), Columns.User, add_rank_col=True)
        expected = (
            pd.DataFrame({Columns.User: targets}).groupby(Columns.User, sort=False).cumcount() + 1
        )
        np.testing.assert_array_equal(df[Columns.Rank].to_numpy(), expected.to_numpy())

    def test_rank_empty(self) -> None:
        from rectools_tpu.models.base import ModelBase

        df = ModelBase._make_reco_table(
            (np.array([], dtype=np.int64), np.array([], dtype=np.int64), np.array([], dtype=np.float32)),
            Columns.User,
            add_rank_col=True,
        )
        assert len(df) == 0 and Columns.Rank in df.columns
