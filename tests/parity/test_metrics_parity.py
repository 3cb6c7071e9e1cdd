"""Metric-layer parity: every metric family computed by the reference's
pandas implementations and by rectools_tpu on identical reco/interaction
tables must agree numerically (per-user and averaged)."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def tables():
    rng = np.random.default_rng(11)
    n_users, n_items, k = 120, 60, 10
    users = np.repeat(np.arange(n_users), k)
    reco = pd.DataFrame(
        {
            "user_id": users,
            "item_id": np.concatenate([rng.choice(n_items, k, replace=False) for _ in range(n_users)]),
            "rank": np.tile(np.arange(1, k + 1), n_users),
        }
    )
    n_inter = 3000
    interactions = pd.DataFrame(
        {
            "user_id": rng.integers(0, n_users, n_inter),
            "item_id": (rng.zipf(1.4, n_inter) - 1) % n_items,
        }
    ).drop_duplicates()
    prev = pd.DataFrame(
        {
            "user_id": rng.integers(0, n_users, n_inter),
            "item_id": (rng.zipf(1.4, n_inter) - 1) % n_items,
        }
    ).drop_duplicates()
    catalog = np.arange(n_items)
    return reco, interactions, prev, catalog


def _both(name, *args, **kwargs):
    import rectools.metrics as ref_metrics

    import rectools_tpu.metrics as tpu_metrics

    return getattr(ref_metrics, name)(*args, **kwargs), getattr(tpu_metrics, name)(*args, **kwargs)


SIMPLE_CASES = [
    ("Precision", {"k": 10}),
    ("Recall", {"k": 10}),
    ("F1Beta", {"k": 10}),
    ("HitRate", {"k": 10}),
    ("MAP", {"k": 10}),
    ("MAP", {"k": 10, "divide_by_k": True}),
    ("NDCG", {"k": 10}),
    ("NDCG", {"k": 10, "divide_by_achievable": True}),
    ("MRR", {"k": 10}),
]


class TestRelevanceMetricsParity:
    @pytest.mark.parametrize("name,kwargs", SIMPLE_CASES, ids=lambda p: str(p))
    def test_calc_matches(self, tables, name, kwargs) -> None:
        reco, interactions, _, _ = tables
        ref_metric, tpu_metric = _both(name, **kwargs)
        ref_val = ref_metric.calc(reco, interactions)
        tpu_val = tpu_metric.calc(reco, interactions)
        assert ref_val == pytest.approx(tpu_val, abs=1e-9)
        ref_pu = ref_metric.calc_per_user(reco, interactions).sort_index()
        tpu_pu = tpu_metric.calc_per_user(reco, interactions).sort_index()
        np.testing.assert_allclose(ref_pu.to_numpy(), tpu_pu.to_numpy(), atol=1e-9)

    @pytest.mark.parametrize("name", ["Accuracy", "MCC"])
    def test_catalog_classification(self, tables, name) -> None:
        reco, interactions, _, catalog = tables
        ref_metric, tpu_metric = _both(name, k=10)
        assert ref_metric.calc(reco, interactions, catalog) == pytest.approx(
            tpu_metric.calc(reco, interactions, catalog), abs=1e-9
        )

    @pytest.mark.parametrize("name", ["PartialAUC", "PAP"])
    @pytest.mark.xfail(
        reason="reference AUC implementation raises on pandas>=3 (object-dtype groupby cumsum "
        "in its outer merge); rectools_tpu AUC is validated against numeric oracles in "
        "tests/metrics instead",
        raises=TypeError,
        strict=False,
    )
    def test_auc(self, tables, name) -> None:
        reco, interactions, _, _ = tables
        ref_metric, tpu_metric = _both(name, k=10)
        assert ref_metric.calc(reco, interactions) == pytest.approx(tpu_metric.calc(reco, interactions), abs=1e-9)


class TestBeyondAccuracyParity:
    def test_miuf(self, tables) -> None:
        reco, _, prev, _ = tables
        ref_metric, tpu_metric = _both("MeanInvUserFreq", k=10)
        assert ref_metric.calc(reco, prev) == pytest.approx(tpu_metric.calc(reco, prev), abs=1e-9)

    def test_avg_rec_popularity(self, tables) -> None:
        reco, _, prev, _ = tables
        ref_metric, tpu_metric = _both("AvgRecPopularity", k=10)
        assert ref_metric.calc(reco, prev) == pytest.approx(tpu_metric.calc(reco, prev), abs=1e-9)
        ref_n, tpu_n = _both("AvgRecPopularity", k=10, normalize=True)
        assert ref_n.calc(reco, prev) == pytest.approx(tpu_n.calc(reco, prev), abs=1e-9)

    def test_serendipity(self, tables) -> None:
        reco, interactions, prev, catalog = tables
        ref_metric, tpu_metric = _both("Serendipity", k=10)
        ref_val = ref_metric.calc(reco, interactions, prev, catalog)
        tpu_val = tpu_metric.calc(reco, interactions, prev, catalog)
        assert ref_val == pytest.approx(tpu_val, abs=1e-9)

    def test_catalog_coverage(self, tables) -> None:
        reco, _, _, catalog = tables
        ref_metric, tpu_metric = _both("CatalogCoverage", k=10)
        assert ref_metric.calc(reco, catalog) == pytest.approx(tpu_metric.calc(reco, catalog), abs=1e-9)

    def test_intersection(self, tables) -> None:
        reco, _, _, _ = tables
        rng = np.random.default_rng(5)
        other = reco.copy()
        other["item_id"] = rng.permutation(other["item_id"].to_numpy())
        ref_metric, tpu_metric = _both("Intersection", k=10)
        assert ref_metric.calc(reco, other) == pytest.approx(tpu_metric.calc(reco, other), abs=1e-9)

    @pytest.mark.parametrize("name", ["SufficientReco", "UnrepeatedReco", "CoveredUsers"])
    def test_dq(self, tables, name) -> None:
        reco, interactions, _, _ = tables
        ref_metric, tpu_metric = _both(name, k=10)
        ref_val = ref_metric.calc(reco) if name != "CoveredUsers" else ref_metric.calc(reco, interactions)
        tpu_val = tpu_metric.calc(reco) if name != "CoveredUsers" else tpu_metric.calc(reco, interactions)
        assert ref_val == pytest.approx(tpu_val, abs=1e-9)


class TestCalcMetricsParity:
    def test_dispatcher_matches_on_mixed_bundle(self, tables) -> None:
        reco, interactions, prev, catalog = tables
        import rectools.metrics as ref_m

        import rectools_tpu.metrics as tpu_m

        ref_bundle = {
            "prec@10": ref_m.Precision(k=10),
            "recall@5": ref_m.Recall(k=5),
            "ndcg@10": ref_m.NDCG(k=10),
            "map@10": ref_m.MAP(k=10),
            "novelty@10": ref_m.MeanInvUserFreq(k=10),
            "serendipity@10": ref_m.Serendipity(k=10),
            "coverage@10": ref_m.CatalogCoverage(k=10),
        }
        tpu_bundle = {
            "prec@10": tpu_m.Precision(k=10),
            "recall@5": tpu_m.Recall(k=5),
            "ndcg@10": tpu_m.NDCG(k=10),
            "map@10": tpu_m.MAP(k=10),
            "novelty@10": tpu_m.MeanInvUserFreq(k=10),
            "serendipity@10": tpu_m.Serendipity(k=10),
            "coverage@10": tpu_m.CatalogCoverage(k=10),
        }
        ref_vals = ref_m.calc_metrics(
            ref_bundle, reco, interactions, prev_interactions=prev, catalog=catalog
        )
        tpu_vals = tpu_m.calc_metrics(
            tpu_bundle, reco, interactions, prev_interactions=prev, catalog=catalog
        )
        assert set(ref_vals) == set(tpu_vals)
        for key, value in ref_vals.items():
            assert value == pytest.approx(tpu_vals[key], abs=1e-9), key

    def test_debiased_metric_matches(self, tables) -> None:
        reco, interactions, _, _ = tables
        import rectools.metrics as ref_m

        import rectools_tpu.metrics as tpu_m

        ref_val = ref_m.Precision(k=10, debias_config=ref_m.DebiasConfig(iqr_coef=1.5, random_state=32)).calc(
            reco, interactions
        )
        tpu_val = tpu_m.Precision(k=10, debias_config=tpu_m.DebiasConfig(iqr_coef=1.5, random_state=32)).calc(
            reco, interactions
        )
        assert ref_val == pytest.approx(tpu_val, abs=1e-9)
