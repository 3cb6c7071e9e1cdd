"""Numeric edge cases for the metrics layer, modeled on the reference's
per-metric test files (empty recommendations, users missing from one side,
k larger than the list, per-user NaN semantics)."""

import numpy as np
import pandas as pd
import pytest

from rectools_tpu import Columns
from rectools_tpu.metrics import (
    MAP,
    MRR,
    NDCG,
    CatalogCoverage,
    HitRate,
    Intersection,
    MeanInvUserFreq,
    Precision,
    Recall,
)


def make_reco(rows):
    return pd.DataFrame(rows, columns=[Columns.User, Columns.Item, Columns.Rank])


def make_inter(rows):
    return pd.DataFrame(rows, columns=[Columns.User, Columns.Item])


RECO = make_reco([[1, 10, 1], [1, 11, 2], [2, 10, 1], [3, 12, 1]])
INTER = make_inter([[1, 10], [1, 12], [2, 99], [4, 10]])


class TestMissingUsers:
    def test_user_in_interactions_but_not_reco_counts_zero(self):
        # user 4 has relevant items but no recommendations: per-user value 0
        per_user = Recall(k=2).calc_per_user(RECO, INTER)
        assert per_user[4] == 0.0

    def test_user_in_reco_but_not_interactions_is_nan(self):
        # user 3 got recommendations but has no ground truth: excluded (NaN)
        per_user = Recall(k=2).calc_per_user(RECO, INTER)
        assert 3 not in per_user.index or np.isnan(per_user[3])

    def test_mean_skips_excluded_users(self):
        # users 1 (hit 1 of 2), 2 (0 of 1), 4 (0) -> (0.5 + 0 + 0) / 3
        assert Recall(k=2).calc(RECO, INTER) == pytest.approx(0.5 / 3)


class TestEmptyInputs:
    def test_empty_reco_gives_zero(self):
        empty = make_reco([])
        assert Precision(k=2).calc(empty, INTER) == 0.0

    def test_empty_interactions_gives_nan(self):
        empty = make_inter([])
        result = MAP(k=2).calc(RECO, empty)
        assert np.isnan(result)


class TestKLargerThanList:
    def test_k_exceeds_reco_length(self):
        # k=10 with only 2 recommended items: metric uses what exists
        assert HitRate(k=10).calc(RECO, INTER) == pytest.approx(1.0 / 3)

    def test_rank_beyond_k_ignored(self):
        reco = make_reco([[1, 12, 3]])  # relevant but at rank 3
        inter = make_inter([[1, 12]])
        assert Recall(k=2).calc(reco, inter) == 0.0
        assert Recall(k=3).calc(reco, inter) == 1.0


class TestRankingEdge:
    def test_mrr_first_relevant_position(self):
        reco = make_reco([[1, 10, 1], [1, 11, 2], [1, 12, 3]])
        inter = make_inter([[1, 11], [1, 12]])
        assert MRR(k=3).calc(reco, inter) == pytest.approx(0.5)

    def test_map_divides_by_full_relevant_count(self):
        reco = make_reco([[1, 10, 1]])
        inter = make_inter([[1, 10], [1, 11], [1, 12]])
        # AP normalizes by n_rel (3), not min(k, n_rel) — reference semantics
        assert MAP(k=2).calc(reco, inter) == pytest.approx(1 / 3)
        # divide_by_k: denominator becomes k
        assert MAP(k=2, divide_by_k=True).calc(reco, inter) == pytest.approx(0.5)
        reco2 = make_reco([[1, 10, 1], [1, 11, 2]])
        inter2 = make_inter([[1, 10]])
        assert MAP(k=2).calc(reco2, inter2) == pytest.approx(1.0)
        assert MAP(k=2, divide_by_k=True).calc(reco2, inter2) == pytest.approx(0.5)

    def test_ndcg_log_base_cancels_in_ratio(self):
        reco = make_reco([[1, 10, 1], [1, 11, 2]])
        inter = make_inter([[1, 11]])
        # binary relevance: 1/log_b(x) = ln b / ln x, so the base scales DCG
        # and IDCG identically and the NDCG ratio is base-invariant
        ndcg2 = NDCG(k=2, log_base=2).calc(reco, inter)
        ndcg3 = NDCG(k=2, log_base=3).calc(reco, inter)
        assert ndcg2 == pytest.approx(ndcg3)
        ideal = 1 / np.log2(2) + 1 / np.log2(3)
        assert ndcg2 == pytest.approx((1 / np.log2(3)) / ideal)

    def test_ndcg_divide_by_achievable(self):
        reco = make_reco([[1, 10, 1], [1, 11, 2]])
        inter = make_inter([[1, 11]])
        # only 1 relevant item: ideal DCG = 1 (at rank 1), not k positions
        val = NDCG(k=2, divide_by_achievable=True).calc(reco, inter)
        assert val == pytest.approx(1 / np.log2(3))


class TestBeyondAccuracyEdge:
    def test_catalog_coverage_counts_unique_reco(self):
        catalog = np.arange(100)
        # default: unique-item COUNT; normalize=True: share of catalog
        assert CatalogCoverage(k=2).calc(RECO, catalog) == 3
        assert CatalogCoverage(k=2, normalize=True).calc(RECO, catalog) == pytest.approx(3 / 100)

    def test_miuf_higher_for_rare_items(self):
        prev = make_inter([[1, 10], [2, 10], [3, 10], [1, 12]])
        reco_pop = make_reco([[5, 10, 1]])
        reco_rare = make_reco([[5, 12, 1]])
        miuf = MeanInvUserFreq(k=1)
        assert miuf.calc(reco_rare, prev) > miuf.calc(reco_pop, prev)

    def test_intersection_with_itself_is_one(self):
        metric = Intersection(k=2)
        assert metric.calc(RECO, RECO) == pytest.approx(1.0)
