"""CatBoostReranker contract tests with a Pool-compatible fake (catboost
itself is absent from the image): pins the pool construction rules the
reference enforces (classifier: data+label; ranker: user-sorted group_id
pool), fit/predict plumbing, and the end-to-end two-stage pipeline."""

import numpy as np
import pandas as pd
import pytest

from rectools_tpu import Columns
from rectools_tpu.dataset import Dataset
from rectools_tpu.model_selection import LastNSplitter
from rectools_tpu.models import PopularModel
from rectools_tpu.models.ranking import (
    CandidateGenerator,
    CandidateRankingModel,
    CatBoostReranker,
)

from ..data import INTERACTIONS


class FakePool:
    """Records the kwargs catboost.Pool would receive."""

    def __init__(self, data, label=None, group_id=None, **kwargs):
        self.data = pd.DataFrame(data).reset_index(drop=True)
        self.label = np.asarray(label) if label is not None else None
        self.group_id = np.asarray(group_id) if group_id is not None else None
        self.extra = kwargs


class FakeRanker:
    """CatBoostRanker-shaped trainer: fit(X=Pool), predict(df)."""

    def __init__(self):
        self.fitted_pool = None

    def fit(self, X, **kwargs):
        assert isinstance(X, FakePool)
        self.fitted_pool = X

    def predict(self, data):
        return np.asarray(data["score"]) if "score" in data else np.zeros(len(data))


class FakeClassifier(FakeRanker):
    def predict_proba(self, data):
        pos = self.predict(data)
        return np.stack([1 - pos, pos], axis=1)


def _candidates_with_target():
    rng = np.random.default_rng(0)
    n = 30
    return pd.DataFrame(
        {
            Columns.User: rng.integers(0, 5, n),
            Columns.Item: rng.integers(0, 10, n),
            "score": rng.random(n),
            Columns.Target: rng.integers(0, 2, n),
        }
    )


class TestPoolConstruction:
    def test_classifier_pool_has_no_groups(self) -> None:
        reranker = CatBoostReranker(FakeClassifier(), pool_factory=FakePool)
        assert reranker.is_classifier
        pool = reranker.prepare_training_pool(_candidates_with_target())
        assert pool.group_id is None
        assert set(pool.data.columns) == {"score"}  # ids and target dropped
        assert pool.label is not None and len(pool.label) == 30

    def test_ranker_pool_grouped_and_sorted_by_user(self) -> None:
        reranker = CatBoostReranker(FakeRanker(), pool_factory=FakePool)
        assert not reranker.is_classifier
        pool = reranker.prepare_training_pool(_candidates_with_target())
        assert pool.group_id is not None
        assert (np.diff(pool.group_id) >= 0).all()  # user-sorted groups
        assert set(pool.data.columns) == {"score"}

    def test_pool_kwargs_forwarded(self) -> None:
        reranker = CatBoostReranker(
            FakeRanker(), pool_factory=FakePool, pool_kwargs={"cat_features": ["score"]}
        )
        pool = reranker.prepare_training_pool(_candidates_with_target())
        assert pool.extra == {"cat_features": ["score"]}

    def test_fit_passes_pool_and_fit_kwargs(self) -> None:
        model = FakeRanker()
        captured = {}

        class RecordingRanker(FakeRanker):
            def fit(self, X, **kwargs):
                super().fit(X)
                captured.update(kwargs)

        model = RecordingRanker()
        reranker = CatBoostReranker(model, pool_factory=FakePool, fit_kwargs={"verbose": False})
        reranker.fit(_candidates_with_target())
        assert model.fitted_pool is not None
        assert captured == {"verbose": False}

    def test_predict_scores_dispatch(self) -> None:
        cands = _candidates_with_target().drop(columns=[Columns.Target])
        clf = CatBoostReranker(FakeClassifier(), pool_factory=FakePool)
        rnk = CatBoostReranker(FakeRanker(), pool_factory=FakePool)
        np.testing.assert_allclose(clf.predict_scores(cands), cands["score"])
        np.testing.assert_allclose(rnk.predict_scores(cands), cands["score"])

    def test_missing_catboost_without_factory_raises(self) -> None:
        from rectools_tpu.models.ranking import catboost_reranker as module

        if module.HAS_CATBOOST:  # pragma: no cover - catboost not in this image
            pytest.skip("catboost installed")
        with pytest.raises(ImportError, match="pool_factory"):
            CatBoostReranker(FakeRanker())


class TestTwoStageWithCatBoostContract:
    def test_end_to_end_recommend(self) -> None:
        dataset = Dataset.construct(INTERACTIONS)
        model = CandidateRankingModel(
            candidate_generators=[CandidateGenerator(PopularModel(), 5, keep_ranks=True, keep_scores=True)],
            splitter=LastNSplitter(n=1, n_splits=1),
            reranker=CatBoostReranker(FakeRanker(), pool_factory=FakePool),
        )
        model.fit(dataset)
        reco = model.recommend(INTERACTIONS[Columns.User].unique(), dataset, k=3, filter_viewed=False)
        assert set(reco.columns) == set(Columns.Recommendations)
        assert (reco.groupby(Columns.User).size() <= 3).all()
