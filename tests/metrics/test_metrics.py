"""Metrics suite tests — numeric cases mirror reference tests/metrics/*."""

import numpy as np
import pandas as pd
import pytest

from rectools_tpu import Columns
from rectools_tpu.metrics import (
    MAP,
    MCC,
    MRR,
    NDCG,
    PAP,
    Accuracy,
    AvgRecPopularity,
    CatalogCoverage,
    CoveredUsers,
    DebiasConfig,
    F1Beta,
    HitRate,
    Intersection,
    IntraListDiversity,
    MeanInvUserFreq,
    PairwiseHammingDistanceCalculator,
    PartialAUC,
    Precision,
    Recall,
    Serendipity,
    SufficientReco,
    UnrepeatedReco,
    calc_metrics,
    debias_interactions,
)

RECO = pd.DataFrame(
    {
        Columns.User: [1, 1, 2, 2, 3, 3, 3, 3, 4, 4, 4],
        Columns.Item: [7, 8, 1, 2, 1, 2, 3, 4, 1, 2, 3],
        Columns.Rank: [1, 2, 1, 2, 1, 2, 3, 4, 1, 2, 3],
    }
)
INTERACTIONS = pd.DataFrame(
    {
        Columns.User: [1, 1, 2, 3, 3, 3, 4, 4, 4],
        Columns.Item: [1, 2, 1, 1, 3, 4, 1, 2, 3],
    }
)
CATALOG = list(range(1, 9))


class TestClassification:
    def test_precision(self) -> None:
        np.testing.assert_allclose(
            Precision(k=3).calc_per_user(RECO, INTERACTIONS).values,
            [0.0, 1 / 3, 2 / 3, 1.0],
        )

    def test_r_precision(self) -> None:
        np.testing.assert_allclose(
            Precision(k=3, r_precision=True).calc_per_user(RECO, INTERACTIONS).values,
            [0.0, 1.0, 2 / 3, 1.0],
        )

    def test_recall(self) -> None:
        np.testing.assert_allclose(
            Recall(k=3).calc_per_user(RECO, INTERACTIONS).values,
            [0.0, 1.0, 2 / 3, 1.0],
        )

    def test_hit_rate(self) -> None:
        np.testing.assert_allclose(
            HitRate(k=1).calc_per_user(RECO, INTERACTIONS).values, [0.0, 1.0, 1.0, 1.0]
        )

    def test_accuracy(self) -> None:
        per_user = Accuracy(k=1).calc_per_user(RECO, INTERACTIONS, CATALOG)
        # user 2: tp=1, fn=0, tn=8-1-0=7 -> 8/8=1
        assert per_user.loc[2] == pytest.approx(1.0)

    def test_f1(self) -> None:
        vals = F1Beta(k=3).calc_per_user(RECO, INTERACTIONS).values
        assert vals[0] == 0.0
        assert vals[1] == pytest.approx(2 * (1 / 3) * 1.0 / (1 / 3 + 1.0))

    def test_mcc_zero_denominator(self) -> None:
        vals = MCC(k=3).calc_per_user(RECO, INTERACTIONS, CATALOG).values
        assert np.isfinite(vals).all()


class TestRanking:
    def test_map(self) -> None:
        np.testing.assert_allclose(
            MAP(k=3).calc_per_user(RECO, INTERACTIONS).values,
            [0.0, 1.0, 0.55555556, 1.0],
            rtol=1e-6,
        )

    def test_map_divide_by_k(self) -> None:
        np.testing.assert_allclose(
            MAP(k=3, divide_by_k=True).calc_per_user(RECO, INTERACTIONS).values,
            [0.0, 0.33333333, 0.55555556, 1.0],
            rtol=1e-6,
        )

    def test_ndcg(self) -> None:
        np.testing.assert_allclose(
            NDCG(k=3).calc_per_user(RECO, INTERACTIONS).values,
            [0.0, 0.46927873, 0.70391809, 1.0],
            rtol=1e-6,
        )

    def test_ndcg_divide_by_achievable(self) -> None:
        vals = NDCG(k=3, divide_by_achievable=True).calc_per_user(RECO, INTERACTIONS).values
        assert vals[1] == pytest.approx(1.0)  # single relevant item at rank 1

    def test_mrr(self) -> None:
        reco = pd.DataFrame(
            {
                Columns.User: [1, 1, 2, 2, 3, 3, 3, 3, 4, 4, 4],
                Columns.Item: [7, 8, 1, 2, 2, 1, 3, 4, 7, 8, 3],
                Columns.Rank: [1, 2, 1, 2, 1, 2, 3, 4, 1, 2, 3],
            }
        )
        np.testing.assert_allclose(
            MRR(k=3).calc_per_user(reco, INTERACTIONS).values,
            [0.0, 1.0, 0.5, 1 / 3],
            rtol=1e-6,
        )


class TestAUC:
    RECO = pd.DataFrame(
        {
            Columns.User: [1, 1, 2, 2, 2, 3, 3],
            Columns.Item: [1, 2, 3, 1, 2, 3, 2],
            Columns.Rank: [1, 2, 1, 2, 3, 1, 2],
        }
    )
    INTERACTIONS = pd.DataFrame(
        {
            Columns.User: [1, 1, 2, 2, 3, 3],
            Columns.Item: [1, 2, 1, 3, 1, 2],
        }
    )

    def test_partial_auc(self) -> None:
        np.testing.assert_allclose(
            PartialAUC(k=3).calc_per_user(self.RECO, self.INTERACTIONS).values,
            [1.0, 1.0, 0.33333333],
            rtol=1e-6,
        )

    def test_partial_auc_exclude(self) -> None:
        np.testing.assert_allclose(
            PartialAUC(k=3, insufficient_handling="exclude").calc_per_user(self.RECO, self.INTERACTIONS).values,
            [1.0, 1.0],
        )

    def test_pap(self) -> None:
        np.testing.assert_allclose(
            PAP(k=3).calc_per_user(self.RECO, self.INTERACTIONS).values,
            [1.0, 1.0, 0.33333333],
            rtol=1e-6,
        )

    def test_raise_on_insufficient(self) -> None:
        with pytest.raises(ValueError):
            PartialAUC(k=3, insufficient_handling="raise").calc_per_user(self.RECO, self.INTERACTIONS)


class TestOtherMetrics:
    def test_miuf(self) -> None:
        reco = pd.DataFrame(
            {
                Columns.User: [1, 2, 2, 3, 3],
                Columns.Item: [3, 2, 3, 1, 2],
                Columns.Rank: [1, 1, 2, 1, 2],
            }
        )
        prev = pd.DataFrame({Columns.User: [1, 1, 2, 3], Columns.Item: [1, 2, 1, 1]})
        np.testing.assert_allclose(
            MeanInvUserFreq(k=3).calc_per_user(reco, prev).values,
            [1.5849625, 1.5849625, 0.79248125],
            rtol=1e-6,
        )

    def test_avg_rec_popularity(self) -> None:
        reco = pd.DataFrame(
            {
                Columns.User: [1, 1, 2, 2, 2, 3, 3],
                Columns.Item: [1, 2, 3, 1, 2, 3, 2],
                Columns.Rank: [1, 2, 1, 2, 3, 1, 2],
            }
        )
        prev = pd.DataFrame({Columns.User: [1, 1, 2, 2, 3, 3], Columns.Item: [1, 2, 1, 3, 1, 2]})
        np.testing.assert_allclose(
            AvgRecPopularity(k=3).calc_per_user(reco, prev).values, [2.5, 2.0, 1.5]
        )

    def test_catalog_coverage(self) -> None:
        # top-3 items across users: {7, 8, 1, 2, 3}
        assert CatalogCoverage(k=3).calc(RECO, CATALOG) == 5
        assert CatalogCoverage(k=3, normalize=True).calc(RECO, CATALOG) == pytest.approx(5 / 8)

    def test_intersection(self) -> None:
        vals = Intersection(k=3).calc_per_user(RECO, RECO.copy())
        np.testing.assert_allclose(vals.values, np.ones(4))

    def test_ild_hamming(self) -> None:
        features = pd.DataFrame(
            [[0, 0], [0, 1], [1, 1]], index=[1, 2, 3], columns=["f1", "f2"]
        )
        calc = PairwiseHammingDistanceCalculator(features)
        reco = pd.DataFrame(
            {
                Columns.User: [1, 1, 2, 2],
                Columns.Item: [1, 2, 1, 3],
                Columns.Rank: [1, 2, 1, 2],
            }
        )
        vals = IntraListDiversity(k=2, distance_calculator=calc).calc_per_user(reco)
        np.testing.assert_allclose(vals.values, [1.0, 2.0])

    def test_serendipity(self) -> None:
        reco = pd.DataFrame(
            {
                Columns.User: ["u1", "u1", "u2", "u2", "u3", "u4", "u4"],
                Columns.Item: ["i1", "i2", "i2", "i3", "i3", "i2", "i3"],
                Columns.Rank: [1, 2, 1, 2, 1, 1, 2],
            }
        )
        interactions = pd.DataFrame(
            {
                Columns.User: ["u1", "u1", "u2", "u2", "u3", "u4"],
                Columns.Item: ["i1", "i2", "i2", "i3", "i2", "i2"],
            }
        )
        prev = pd.DataFrame(
            {
                Columns.User: ["u1", "u1", "u2", "u2", "u3"],
                Columns.Item: ["i1", "i2", "i1", "i2", "i1"],
            }
        )
        vals = Serendipity(k=2).calc_per_user(reco, interactions, prev, ("i1", "i2", "i3", "i4"))
        np.testing.assert_allclose(vals.values, [0.0, 0.5, 0.0, 0.125])


class TestDQ:
    RECO = pd.DataFrame(
        {
            Columns.User: [1, 1, 2, 2, 2, 3, 3, 3, 3, 3],
            Columns.Item: [1, 2, 1, 1, 3, 1, 2, 2, 1, 5],
            Columns.Rank: [1, 2, 1, 2, 3, 1, 2, 3, 4, 5],
        }
    )

    def test_sufficient(self) -> None:
        np.testing.assert_array_equal(SufficientReco(k=4).calc_per_user(self.RECO).values, [0, 0, 1])
        np.testing.assert_allclose(
            SufficientReco(k=4, deep=True).calc_per_user(self.RECO).values, [0.5, 0.75, 1.0]
        )

    def test_unrepeated(self) -> None:
        np.testing.assert_array_equal(UnrepeatedReco(k=4).calc_per_user(self.RECO).values, [1, 0, 0])
        np.testing.assert_allclose(
            UnrepeatedReco(k=4, deep=True).calc_per_user(self.RECO).values, [1.0, 2 / 3, 0.5]
        )

    def test_covered_users(self) -> None:
        reco = pd.DataFrame(
            {Columns.User: [1, 1, 2], Columns.Item: [1, 2, 1], Columns.Rank: [1, 2, 2]}
        )
        interactions = pd.DataFrame({Columns.User: [1, 2, 3, 4], Columns.Item: [1, 1, 1, 1]})
        np.testing.assert_array_equal(CoveredUsers(k=2).calc_per_user(reco, interactions).values, [1, 1, 0, 0])


class TestDebias:
    def test_downsamples_popular_items(self) -> None:
        # one item with 20 users, ten items with 1 user each: Q1=Q3=1 ->
        # border = 1, the popular item is down-sampled to 1 interaction
        interactions = pd.DataFrame(
            {
                Columns.User: list(range(20)) + list(range(10)),
                Columns.Item: [100] * 20 + list(range(10)),
            }
        )
        debiased = debias_interactions(interactions, DebiasConfig(iqr_coef=1.5, random_state=0))
        assert (debiased[Columns.Item] == 100).sum() == 1
        assert set(debiased[Columns.Item]) >= set(range(10))

    def test_debiased_metric_equals_metric_on_debiased_interactions(self) -> None:
        config = DebiasConfig(iqr_coef=1.5, random_state=0)
        interactions = pd.concat([INTERACTIONS] * 3, ignore_index=True)
        debiased = debias_interactions(interactions, config)
        expected = Precision(k=3).calc(RECO, debiased)
        got = Precision(k=3, debias_config=config).calc(RECO, interactions)
        assert got == pytest.approx(expected)


class TestCalcMetrics:
    def test_batch(self) -> None:
        metrics = {
            "prec@3": Precision(k=3),
            "recall@3": Recall(k=3),
            "map@3": MAP(k=3),
            "ndcg@3": NDCG(k=3),
            "mrr@3": MRR(k=3),
            "pauc@3": PartialAUC(k=3),
            "miuf@3": MeanInvUserFreq(k=3),
            "arp@3": AvgRecPopularity(k=3),
            "coverage@3": CatalogCoverage(k=3),
            "sufficient@2": SufficientReco(k=2),
            "covered@3": CoveredUsers(k=3),
        }
        result = calc_metrics(
            metrics,
            reco=RECO,
            interactions=INTERACTIONS,
            prev_interactions=INTERACTIONS,
            catalog=CATALOG,
        )
        assert set(result) == set(metrics)
        assert result["map@3"] == pytest.approx((0 + 1 + 0.55555556 + 1) / 4)

    def test_intersection_with_dict(self) -> None:
        result = calc_metrics(
            {"int@3": Intersection(k=3)},
            reco=RECO,
            ref_reco={"a": RECO.copy(), "b": RECO.copy()},
        )
        assert set(result) == {"int@3_a", "int@3_b"}

    def test_missing_inputs_raise(self) -> None:
        with pytest.raises(ValueError):
            calc_metrics({"prec@1": Precision(k=1)}, reco=RECO)
        with pytest.raises(ValueError):
            calc_metrics({"miuf@1": MeanInvUserFreq(k=1)}, reco=RECO)
        with pytest.raises(ValueError):
            calc_metrics({"int@1": Intersection(k=1)}, reco=RECO)


class TestCalcMetricsDebias:
    def test_debiased_and_plain_coexist(self) -> None:
        config = DebiasConfig(iqr_coef=1.5, random_state=0)
        interactions = pd.concat([INTERACTIONS] * 3, ignore_index=True)
        result = calc_metrics(
            {
                "prec@3": Precision(k=3),
                "prec_debiased@3": Precision(k=3, debias_config=config),
                "map@3": MAP(k=3),
                "map_debiased@3": MAP(k=3, debias_config=config),
                "pauc@3": PartialAUC(k=3),
                "pauc_debiased@3": PartialAUC(k=3, debias_config=config),
            },
            reco=RECO,
            interactions=interactions,
        )
        assert set(result) == {
            "prec@3", "prec_debiased@3", "map@3", "map_debiased@3", "pauc@3", "pauc_debiased@3"
        }
        # debiased variants equal direct computation on debiased interactions
        debiased = debias_interactions(interactions, config)
        assert result["prec_debiased@3"] == pytest.approx(Precision(k=3).calc(RECO, debiased))
        assert result["map_debiased@3"] == pytest.approx(MAP(k=3).calc(RECO, debiased))
        assert result["pauc_debiased@3"] == pytest.approx(PartialAUC(k=3).calc(RECO, debiased))

    def test_raises_without_auto_debias(self) -> None:
        config = DebiasConfig(iqr_coef=1.5, random_state=0)
        from rectools_tpu.metrics import make_confusions

        confusion_df = make_confusions(RECO, INTERACTIONS, k=3)
        with pytest.raises(ValueError, match="de-biased"):
            Precision(k=3, debias_config=config).calc_from_confusion_df(confusion_df, is_debiased=False)
