"""Two-stage CandidateRankingModel tests
(pattern of reference tests/models/ranking/*)."""

import numpy as np
import pandas as pd
import pytest
from sklearn.linear_model import LogisticRegression

from rectools_tpu import Columns
from rectools_tpu.dataset import Dataset
from rectools_tpu.exceptions import NotFittedForStageError
from rectools_tpu.model_selection import TimeRangeSplitter
from rectools_tpu.models import EASEModel, PopularModel
from rectools_tpu.models.ranking import (
    CandidateGenerator,
    CandidateRankingModel,
    PerUserNegativeSampler,
    Reranker,
)


def _dataset() -> Dataset:
    rng = np.random.default_rng(0)
    rows = []
    for u in range(50):
        n = rng.integers(4, 12)
        for t, i in enumerate(rng.integers(0, 30, size=n)):
            rows.append((u, int(i), 1.0, pd.Timestamp("2021-01-01") + pd.Timedelta(days=int(t))))
    return Dataset.construct(pd.DataFrame(rows, columns=Columns.Interactions))


def _model(n_gens: int = 2) -> CandidateRankingModel:
    gens = [
        CandidateGenerator(
            PopularModel(), num_candidates=10, keep_ranks=True, keep_scores=True,
            scores_fillna_value=0.0, ranks_fillna_value=100.0,
        ),
        CandidateGenerator(
            EASEModel(regularization=10.0), num_candidates=10, keep_ranks=True, keep_scores=True,
            scores_fillna_value=0.0, ranks_fillna_value=100.0,
        ),
    ][:n_gens]
    return CandidateRankingModel(
        candidate_generators=gens,
        splitter=TimeRangeSplitter("2D", 1),
        reranker=Reranker(LogisticRegression()),
    )


class TestCandidateRankingModel:
    def test_fit_recommend(self) -> None:
        dataset = _dataset()
        model = _model()
        model.fit(dataset)
        reco = model.recommend(np.arange(10), dataset, k=5, filter_viewed=True, on_unsupported_targets="ignore")
        assert set(reco.columns) == set(Columns.Recommendations)
        for _, grp in reco.groupby(Columns.User):
            assert list(grp[Columns.Rank]) == list(range(1, len(grp) + 1))
            assert grp[Columns.Score].is_monotonic_decreasing

    def test_train_table_has_generator_features(self) -> None:
        dataset = _dataset()
        model = _model()
        train = model.get_train_with_targets_for_reranker(dataset)
        expected = {
            Columns.User, Columns.Item, Columns.Target,
            "PopularModel_1_rank", "PopularModel_1_score",
            "EASEModel_1_rank", "EASEModel_1_score",
        }
        assert expected <= set(train.columns)
        assert set(train[Columns.Target].unique()) <= {0, 1}

    def test_multi_fold_splitter_rejected(self) -> None:
        with pytest.raises(ValueError):
            CandidateRankingModel(
                candidate_generators=[CandidateGenerator(PopularModel(), 5, True, True)],
                splitter=TimeRangeSplitter("1D", 2),
                reranker=Reranker(LogisticRegression()),
            )

    def test_generator_stage_guard(self) -> None:
        dataset = _dataset()
        gen = CandidateGenerator(PopularModel(), 5, True, True)
        gen.fit(dataset, for_train=True)
        with pytest.raises(NotFittedForStageError):
            gen.generate_candidates(np.arange(3), dataset, filter_viewed=False, for_train=False)


class TestPerUserNegativeSampler:
    def test_limits_negatives_per_user(self) -> None:
        train = pd.DataFrame(
            {
                Columns.User: [1] * 10 + [2] * 2,
                Columns.Item: list(range(10)) + [0, 1],
                Columns.Target: [1, 0, 0, 0, 0, 0, 0, 0, 0, 0] + [1, 0],
            }
        )
        sampler = PerUserNegativeSampler(n_negatives=3, random_state=0)
        sampled = sampler.sample_negatives(train)
        counts = sampled[sampled[Columns.Target] == 0].groupby(Columns.User).size()
        assert counts.loc[1] == 3
        assert counts.loc[2] == 1  # fewer negatives than requested: keep all
        # all positives kept
        assert (sampled[Columns.Target] == 1).sum() == 2
