"""Two-stage candidate-ranking pipeline.

Behavioral parity with reference rectools/models/ranking/candidate_ranking.py:17-868:
first-stage `CandidateGenerator`s (any ModelBase) produce per-user candidates
on a one-fold history split; targets are joined, `PerUserNegativeSampler`
downsamples negatives, `CandidateFeatureCollector` hooks add features, a
`Reranker` (any sklearn-style classifier/ranker) fits; recommend = generate ->
score -> per-user re-rank.
"""

import typing as tp
import warnings
from collections import defaultdict
from functools import reduce

import numpy as np
import pandas as pd
import typing_extensions as tpe

from ...columns import Columns
from ...dataset import Dataset
from ...exceptions import NotFittedForStageError
from ...model_selection import Splitter
from ...types import ExternalIds
from ..base import ErrorBehaviour, ModelBase

@tp.runtime_checkable
class ClassifierBase(tp.Protocol):
    """Classifier protocol: fit + predict_proba."""

    def fit(self, *args: tp.Any, **kwargs: tp.Any) -> tpe.Self:
        """Fit the classifier."""

    def predict_proba(self, *args: tp.Any, **kwargs: tp.Any) -> np.ndarray:
        """Class probability matrix; column 1 is the positive class."""


@tp.runtime_checkable
class RankerBase(tp.Protocol):
    """Ranker protocol: fit + predict."""

    def fit(self, *args: tp.Any, **kwargs: tp.Any) -> tpe.Self:
        """Fit the ranker."""

    def predict(self, *args: tp.Any, **kwargs: tp.Any) -> np.ndarray:
        """Ranking scores."""


class Reranker:
    """Second-stage scorer over candidate features
    (reference candidate_ranking.py:117-237)."""

    def __init__(
        self,
        model: tp.Union[ClassifierBase, RankerBase],
        fit_kwargs: tp.Optional[tp.Dict[str, tp.Any]] = None,
    ):
        self.model = model
        self.fit_kwargs = fit_kwargs

    def prepare_fit_kwargs(self, candidates_with_target: pd.DataFrame) -> tp.Dict[str, tp.Any]:
        """Split candidate table into X / y fit arguments."""
        candidates_with_target = candidates_with_target.drop(columns=Columns.UserItem)
        fit_kwargs = {
            "X": candidates_with_target.drop(columns=Columns.Target),
            "y": candidates_with_target[Columns.Target],
        }
        if self.fit_kwargs is not None:
            fit_kwargs.update(self.fit_kwargs)
        return fit_kwargs

    def fit(self, candidates_with_target: pd.DataFrame) -> None:
        """Fit the underlying model on candidates with targets."""
        self.model.fit(**self.prepare_fit_kwargs(candidates_with_target))

    def predict_scores(self, candidates: pd.DataFrame) -> np.ndarray:
        """Scores for candidates; classifiers report positive-class proba."""
        x_full = candidates.drop(columns=Columns.UserItem)
        if isinstance(self.model, ClassifierBase):
            return self.model.predict_proba(x_full)[:, 1]
        return self.model.predict(x_full)

    @classmethod
    def recommend(cls, scored_pairs: pd.DataFrame, k: int, add_rank_col: bool = True) -> pd.DataFrame:
        """Top-k per user by score — vectorized (stable sort by (user-order,
        -score) then per-user head) instead of the reference's groupby-apply."""
        order = np.lexsort(
            (-scored_pairs[Columns.Score].to_numpy(), scored_pairs[Columns.User].to_numpy())
        )
        reco = scored_pairs.iloc[order].reset_index(drop=True)
        position = reco.groupby(Columns.User, sort=False).cumcount()
        reco = reco[position < k].reset_index(drop=True)
        if add_rank_col:
            reco[Columns.Rank] = reco.groupby(Columns.User, sort=False).cumcount() + 1
        return reco


class CandidateFeatureCollector:
    """Feature hook for candidate (user, item) pairs; the base implementation
    adds nothing (reference candidate_ranking.py:240-296)."""

    def _get_user_features(
        self, users: ExternalIds, dataset: Dataset, fold_info: tp.Optional[tp.Dict[str, tp.Any]]
    ) -> pd.DataFrame:
        return pd.DataFrame(columns=[Columns.User])

    def _get_item_features(
        self, items: ExternalIds, dataset: Dataset, fold_info: tp.Optional[tp.Dict[str, tp.Any]]
    ) -> pd.DataFrame:
        return pd.DataFrame(columns=[Columns.Item])

    def _get_user_item_features(
        self, useritem: pd.DataFrame, dataset: Dataset, fold_info: tp.Optional[tp.Dict[str, tp.Any]]
    ) -> pd.DataFrame:
        return pd.DataFrame(columns=Columns.UserItem)

    def collect_features(
        self, useritem: pd.DataFrame, dataset: Dataset, fold_info: tp.Optional[tp.Dict[str, tp.Any]]
    ) -> pd.DataFrame:
        """Left-join user / item / pair features onto the candidate table."""
        user_features = self._get_user_features(useritem[Columns.User].unique(), dataset, fold_info)
        item_features = self._get_item_features(useritem[Columns.Item].unique(), dataset, fold_info)
        useritem_features = self._get_user_item_features(useritem, dataset, fold_info)
        return (
            useritem.merge(user_features, on=Columns.User, how="left")
            .merge(item_features, on=Columns.Item, how="left")
            .merge(useritem_features, on=Columns.UserItem, how="left")
        )


class NegativeSamplerBase:
    """Base class for negative sampling of reranker train pairs."""

    def sample_negatives(self, train: pd.DataFrame) -> pd.DataFrame:
        """Return the downsampled train table."""
        raise NotImplementedError()


class PerUserNegativeSampler(NegativeSamplerBase):
    """Keep all positives + at most n_negatives random negatives per user
    (reference candidate_ranking.py:317-380)."""

    def __init__(self, n_negatives: int = 3, random_state: tp.Optional[int] = None):
        self.n_negatives = n_negatives
        self.random_state = random_state

    def sample_negatives(self, train: pd.DataFrame) -> pd.DataFrame:
        """Sample negatives per user; users with <= n_negatives keep all."""
        negative_mask = train[Columns.Target] == 0
        pos = train[~negative_mask]
        num_negatives = train[negative_mask].groupby(Columns.User)[Columns.Item].count()
        sampling_mask = train[Columns.User].isin(num_negatives[num_negatives > self.n_negatives].index)

        neg_for_sample = train[sampling_mask & negative_mask]
        # vectorized per-user sample without replacement: shuffle then head(n)
        neg_shuffled = neg_for_sample.sample(frac=1.0, random_state=self.random_state)
        neg = neg_shuffled.groupby(Columns.User, sort=False).head(self.n_negatives)
        neg = pd.concat([neg, train[(~sampling_mask) & negative_mask]], axis=0)
        return pd.concat([neg, pos], ignore_index=True).sample(frac=1, random_state=self.random_state)


class CandidateGenerator:
    """First-stage model + candidate-generation policy
    (reference candidate_ranking.py:383-495)."""

    def __init__(
        self,
        model: ModelBase,
        num_candidates: int,
        keep_ranks: bool,
        keep_scores: bool,
        scores_fillna_value: tp.Optional[float] = None,
        ranks_fillna_value: tp.Optional[float] = None,
    ):
        self.model = model
        self.num_candidates = num_candidates
        self.keep_ranks = keep_ranks
        self.keep_scores = keep_scores
        self.scores_fillna_value = scores_fillna_value
        self.ranks_fillna_value = ranks_fillna_value
        self.is_fitted_for_train = False
        self.is_fitted_for_recommend = False

    def fit(self, dataset: Dataset, for_train: bool) -> None:
        """Fit the first-stage model for the train or recommend stage."""
        self.model.fit(dataset)
        self.is_fitted_for_train = for_train
        self.is_fitted_for_recommend = not for_train

    def generate_candidates(
        self,
        users: ExternalIds,
        dataset: Dataset,
        filter_viewed: bool,
        for_train: bool,
        items_to_recommend: tp.Optional[ExternalIds] = None,
        on_unsupported_targets: ErrorBehaviour = "raise",
    ) -> pd.DataFrame:
        """Per-user candidates with optional rank/score columns."""
        if for_train and not self.is_fitted_for_train:
            raise NotFittedForStageError(self.model.__class__.__name__, "train")
        if not for_train and not self.is_fitted_for_recommend:
            raise NotFittedForStageError(self.model.__class__.__name__, "recommend")

        candidates = self.model.recommend(
            users=users,
            dataset=dataset,
            k=self.num_candidates,
            filter_viewed=filter_viewed,
            items_to_recommend=items_to_recommend,
            add_rank_col=self.keep_ranks,
            on_unsupported_targets=on_unsupported_targets,
        )
        if not self.keep_scores:
            candidates = candidates.drop(columns=Columns.Score)
        return candidates


class CandidateRankingModel(ModelBase):
    """Two-stage recommender: first-stage generators + trainable reranker
    (reference candidate_ranking.py:497-868)."""

    def __init__(
        self,
        candidate_generators: tp.List[CandidateGenerator],
        splitter: Splitter,
        reranker: Reranker,
        sampler: tp.Optional[NegativeSamplerBase] = None,
        feature_collector: tp.Optional[CandidateFeatureCollector] = None,
        verbose: int = 0,
    ) -> None:
        super().__init__(verbose=verbose)
        if hasattr(splitter, "n_splits") and splitter.n_splits != 1:
            raise ValueError("Splitter must have only one fold")
        self.splitter = splitter
        self.sampler = sampler if sampler is not None else PerUserNegativeSampler()
        self.reranker = reranker
        self.cand_gen_dict = self._create_cand_gen_dict(candidate_generators)
        self.feature_collector = feature_collector if feature_collector is not None else CandidateFeatureCollector()

    @staticmethod
    def _create_cand_gen_dict(
        candidate_generators: tp.List[CandidateGenerator],
    ) -> tp.Dict[str, CandidateGenerator]:
        model_count: tp.Dict[str, int] = defaultdict(int)
        cand_gen_dict = {}
        for candgen in candidate_generators:
            model_name = candgen.model.__class__.__name__
            model_count[model_name] += 1
            cand_gen_dict[f"{model_name}_{model_count[model_name]}"] = candgen
        return cand_gen_dict

    def split_to_history_dataset_and_train_targets(
        self, dataset: Dataset, splitter: Splitter
    ) -> tp.Tuple[Dataset, pd.DataFrame, tp.Dict[str, tp.Any]]:
        """One-fold split into (history dataset, train targets, fold info)."""
        split_iterator = iter(splitter.split(dataset.interactions, collect_fold_stats=True))
        train_ids, test_ids, fold_info = next(split_iterator)
        history_dataset = dataset.filter_interactions(train_ids)
        interactions = dataset.get_raw_interactions()
        train_targets = interactions.iloc[test_ids]
        return history_dataset, train_targets, fold_info

    def _fit(self, dataset: Dataset, *args: tp.Any, refit_candidate_generators: bool = True, **kwargs: tp.Any) -> None:
        train_with_target = self.get_train_with_targets_for_reranker(dataset)
        self.reranker.fit(train_with_target, **kwargs)
        if refit_candidate_generators:
            self._fit_candidate_generators(dataset, for_train=False)

    def get_train_with_targets_for_reranker(self, dataset: Dataset) -> pd.DataFrame:
        """History split -> candidates -> targets -> negative sampling ->
        feature collection."""
        history_dataset, train_targets, fold_info = self.split_to_history_dataset_and_train_targets(
            dataset, self.splitter
        )
        candidates = self.get_full_candidates_with_targets(train_targets, history_dataset)
        candidates = self.sampler.sample_negatives(candidates)
        return self.feature_collector.collect_features(candidates, history_dataset, fold_info)

    def get_full_candidates_with_targets(self, train_targets: pd.DataFrame, history_dataset: Dataset) -> pd.DataFrame:
        """Candidates from all generators with binary targets attached."""
        self._fit_candidate_generators(history_dataset, for_train=True)
        candidates = self._get_candidates_from_first_stage(
            users=train_targets[Columns.User].unique(),
            dataset=history_dataset,
            filter_viewed=self.splitter.filter_already_seen,
            for_train=True,
        )
        return self._set_targets_to_candidates(candidates, train_targets)

    @staticmethod
    def _set_targets_to_candidates(candidates: pd.DataFrame, train_targets: pd.DataFrame) -> pd.DataFrame:
        train = pd.merge(
            candidates,
            train_targets[[Columns.User, Columns.Item]],
            how="left",
            on=Columns.UserItem,
            indicator=True,
        )
        train[Columns.Target] = (train["_merge"] == "both").astype("int32")
        return train.drop(columns=["_merge"])

    def _fit_candidate_generators(self, dataset: Dataset, for_train: bool) -> None:
        for candgen in self.cand_gen_dict.values():
            candgen.fit(dataset, for_train)

    def _get_candidates_from_first_stage(
        self,
        users: ExternalIds,
        dataset: Dataset,
        filter_viewed: bool,
        for_train: bool,
        items_to_recommend: tp.Optional[ExternalIds] = None,
        on_unsupported_targets: ErrorBehaviour = "raise",
    ) -> pd.DataFrame:
        candidates_dfs = []
        for identifier, candgen in self.cand_gen_dict.items():
            candidates = candgen.generate_candidates(
                users=users,
                dataset=dataset,
                filter_viewed=filter_viewed,
                for_train=for_train,
                items_to_recommend=items_to_recommend,
                on_unsupported_targets=on_unsupported_targets,
            )
            candidates = candidates.rename(
                columns={Columns.Rank: f"{identifier}_rank", Columns.Score: f"{identifier}_score"}
            )
            candidates_dfs.append(candidates)

        all_candidates = reduce(lambda a, b: a.merge(b, how="outer", on=Columns.UserItem), candidates_dfs)
        return self._process_ranks_and_scores(all_candidates)

    def _process_ranks_and_scores(self, all_candidates: pd.DataFrame) -> pd.DataFrame:
        for identifier, candgen in self.cand_gen_dict.items():
            rank_col, score_col = f"{identifier}_rank", f"{identifier}_score"
            if candgen.keep_ranks and candgen.ranks_fillna_value is not None:
                all_candidates[rank_col] = all_candidates[rank_col].fillna(candgen.ranks_fillna_value)
            if candgen.keep_scores and candgen.scores_fillna_value is not None:
                all_candidates[score_col] = all_candidates[score_col].fillna(candgen.scores_fillna_value)
        return all_candidates

    def recommend(  # type: ignore[override]
        self,
        users: ExternalIds,
        dataset: Dataset,
        k: int,
        filter_viewed: bool,
        items_to_recommend: tp.Optional[ExternalIds] = None,
        add_rank_col: bool = True,
        on_unsupported_targets: ErrorBehaviour = "raise",
        context: tp.Optional[pd.DataFrame] = None,
        force_fit_candidate_generators: bool = False,
    ) -> pd.DataFrame:
        """Two-stage recommend: generate candidates, score with the reranker,
        take per-user top-k."""
        if context is not None:
            warnings.warn("This model does not support context. It will be ignored.", UserWarning)
        self._check_is_fitted()
        self._check_k(k)

        if force_fit_candidate_generators or not all(
            generator.is_fitted_for_recommend for generator in self.cand_gen_dict.values()
        ):
            self._fit_candidate_generators(dataset, for_train=False)

        candidates = self._get_candidates_from_first_stage(
            users=users,
            dataset=dataset,
            filter_viewed=filter_viewed,
            items_to_recommend=items_to_recommend,
            for_train=False,
            on_unsupported_targets=on_unsupported_targets,
        )
        train = self.feature_collector.collect_features(candidates, dataset, fold_info=None)
        scored_pairs = candidates.reindex(columns=Columns.UserItem)
        scored_pairs[Columns.Score] = self.reranker.predict_scores(train)
        return self.reranker.recommend(scored_pairs, k=k, add_rank_col=add_rank_col)
