"""Model-selection parity: splitter fold indices and full cross_validate
metric tables must match the reference on identical inputs."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def interactions() -> pd.DataFrame:
    rng = np.random.default_rng(21)
    n = 5000
    return pd.DataFrame(
        {
            "user_id": rng.integers(0, 150, n),
            "item_id": (rng.zipf(1.5, n) - 1) % 70,
            "weight": 1.0,
            "datetime": pd.to_datetime("2024-03-01") + pd.to_timedelta(rng.integers(0, 14 * 24, n), unit="h"),
        }
    )


def _ref_interactions(interactions):
    from rectools.dataset import Dataset as RefDataset

    return RefDataset.construct(interactions).interactions


def _tpu_interactions(interactions):
    from rectools_tpu.dataset import Dataset

    return Dataset.construct(interactions).interactions


class TestSplitterParity:
    @pytest.mark.parametrize("filters", [dict(), dict(filter_cold_users=False, filter_cold_items=False, filter_already_seen=False)])
    def test_time_range_splitter(self, interactions, filters) -> None:
        from rectools.model_selection import TimeRangeSplitter as RefSplitter

        from rectools_tpu.model_selection import TimeRangeSplitter

        ref_folds = list(RefSplitter("2D", n_splits=3, **filters).split(_ref_interactions(interactions), collect_fold_stats=True))
        tpu_folds = list(TimeRangeSplitter("2D", n_splits=3, **filters).split(_tpu_interactions(interactions), collect_fold_stats=True))
        assert len(ref_folds) == len(tpu_folds) == 3
        for (ref_tr, ref_te, ref_info), (tpu_tr, tpu_te, tpu_info) in zip(ref_folds, tpu_folds):
            np.testing.assert_array_equal(np.sort(ref_tr), np.sort(tpu_tr))
            np.testing.assert_array_equal(np.sort(ref_te), np.sort(tpu_te))
            for key in ("train", "test", "train_users", "test_users", "train_items", "test_items"):
                assert ref_info[key] == tpu_info[key], key

    def test_last_n_splitter(self, interactions) -> None:
        from rectools.model_selection import LastNSplitter as RefSplitter

        from rectools_tpu.model_selection import LastNSplitter

        ref_folds = list(RefSplitter(n=2, n_splits=2).split(_ref_interactions(interactions)))
        tpu_folds = list(LastNSplitter(n=2, n_splits=2).split(_tpu_interactions(interactions)))
        assert len(ref_folds) == len(tpu_folds) == 2
        for (ref_tr, ref_te, _), (tpu_tr, tpu_te, _) in zip(ref_folds, tpu_folds):
            np.testing.assert_array_equal(np.sort(ref_tr), np.sort(tpu_tr))
            np.testing.assert_array_equal(np.sort(ref_te), np.sort(tpu_te))

    def test_random_splitter_same_seed(self, interactions) -> None:
        from rectools.model_selection import RandomSplitter as RefSplitter

        from rectools_tpu.model_selection import RandomSplitter

        ref_folds = list(RefSplitter(test_fold_frac=0.2, n_splits=2, random_state=32).split(_ref_interactions(interactions)))
        tpu_folds = list(RandomSplitter(test_fold_frac=0.2, n_splits=2, random_state=32).split(_tpu_interactions(interactions)))
        for (ref_tr, ref_te, _), (tpu_tr, tpu_te, _) in zip(ref_folds, tpu_folds):
            np.testing.assert_array_equal(np.sort(ref_te), np.sort(tpu_te))
            np.testing.assert_array_equal(np.sort(ref_tr), np.sort(tpu_tr))


class TestCrossValidateParity:
    def test_metric_tables_match(self, interactions) -> None:
        import rectools.metrics as ref_m
        from rectools.dataset import Dataset as RefDataset
        from rectools.model_selection import TimeRangeSplitter as RefSplitter, cross_validate as ref_cv
        from rectools.models import EASEModel as RefEASE, PopularModel as RefPopular

        import rectools_tpu.metrics as tpu_m
        from rectools_tpu.dataset import Dataset
        from rectools_tpu.model_selection import TimeRangeSplitter, cross_validate
        from rectools_tpu.models import EASEModel, PopularModel

        ref_ds = RefDataset.construct(interactions)
        tpu_ds = Dataset.construct(interactions)

        ref_out = ref_cv(
            dataset=ref_ds,
            splitter=RefSplitter("2D", n_splits=2),
            models={"popular": RefPopular(), "ease": RefEASE(regularization=50.0)},
            metrics={"recall@10": ref_m.Recall(k=10), "ndcg@10": ref_m.NDCG(k=10), "map@10": ref_m.MAP(k=10)},
            k=10,
            filter_viewed=True,
        )
        tpu_out = cross_validate(
            dataset=tpu_ds,
            splitter=TimeRangeSplitter("2D", n_splits=2),
            models={"popular": PopularModel(), "ease": EASEModel(regularization=50.0)},
            metrics={"recall@10": tpu_m.Recall(k=10), "ndcg@10": tpu_m.NDCG(k=10), "map@10": tpu_m.MAP(k=10)},
            k=10,
            filter_viewed=True,
        )

        ref_rows = pd.DataFrame(ref_out["metrics"]).sort_values(["model", "i_split"]).reset_index(drop=True)
        tpu_rows = pd.DataFrame(tpu_out["metrics"]).sort_values(["model", "i_split"]).reset_index(drop=True)
        assert list(ref_rows["model"]) == list(tpu_rows["model"])
        for col in ("recall@10", "ndcg@10", "map@10"):
            # EASE is tie-free; Popular can only drift on count ties, which
            # leave these relevance metrics unchanged
            np.testing.assert_allclose(ref_rows[col], tpu_rows[col], atol=1e-6)

        ref_splits = pd.DataFrame(ref_out["splits"])
        tpu_splits = pd.DataFrame(tpu_out["splits"])
        for col in ("train", "test", "train_users", "test_users"):
            np.testing.assert_array_equal(ref_splits[col], tpu_splits[col])


class TestCrossValidateRefModels:
    def test_intersection_metrics_match(self, interactions) -> None:
        import rectools.metrics as ref_m
        from rectools.dataset import Dataset as RefDataset
        from rectools.model_selection import TimeRangeSplitter as RefSplitter, cross_validate as ref_cv
        from rectools.models import EASEModel as RefEASE, PopularModel as RefPopular

        import rectools_tpu.metrics as tpu_m
        from rectools_tpu.dataset import Dataset
        from rectools_tpu.model_selection import TimeRangeSplitter, cross_validate
        from rectools_tpu.models import EASEModel, PopularModel

        ref_out = ref_cv(
            dataset=RefDataset.construct(interactions),
            splitter=RefSplitter("2D", n_splits=2),
            models={"popular": RefPopular(), "ease": RefEASE(regularization=50.0)},
            metrics={"vs_popular@10": ref_m.Intersection(k=10)},
            k=10,
            filter_viewed=True,
            ref_models=["popular"],
        )
        tpu_out = cross_validate(
            dataset=Dataset.construct(interactions),
            splitter=TimeRangeSplitter("2D", n_splits=2),
            models={"popular": PopularModel(), "ease": EASEModel(regularization=50.0)},
            metrics={"vs_popular@10": tpu_m.Intersection(k=10)},
            k=10,
            filter_viewed=True,
            ref_models=["popular"],
        )
        import pandas as pd

        ref_rows = pd.DataFrame(ref_out["metrics"]).sort_values(["model", "i_split"]).reset_index(drop=True)
        tpu_rows = pd.DataFrame(tpu_out["metrics"]).sort_values(["model", "i_split"]).reset_index(drop=True)
        assert list(ref_rows["model"]) == list(tpu_rows["model"])
        col = "vs_popular@10_popular" if "vs_popular@10_popular" in ref_rows.columns else "vs_popular@10"
        assert col in tpu_rows.columns
        np.testing.assert_allclose(
            ref_rows[col].fillna(-1).to_numpy(), tpu_rows[col].fillna(-1).to_numpy(), atol=1e-6
        )
