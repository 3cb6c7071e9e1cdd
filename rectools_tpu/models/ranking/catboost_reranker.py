"""CatBoost-backed reranker (reference rectools/models/ranking/catboost_reranker.py:15-98).

CatBoost is an optional host-side dependency (C++ GBDT); when absent a dummy
raising ImportError is exported instead — the generic `Reranker` works with
any sklearn-style classifier/ranker out of the box.
"""

import typing as tp

import pandas as pd

from ...columns import Columns
from .candidate_ranking import Reranker

try:  # pragma: no cover - import guard
    from catboost import CatBoostClassifier, CatBoostRanker, Pool

    HAS_CATBOOST = True
except ImportError:  # pragma: no cover
    HAS_CATBOOST = False


if HAS_CATBOOST:  # pragma: no cover - catboost not in the CI image

    class CatBoostReranker(Reranker):
        """Reranker over CatBoostClassifier or CatBoostRanker (group-wise Pool)."""

        def __init__(
            self,
            model: tp.Union["CatBoostClassifier", "CatBoostRanker"],
            fit_kwargs: tp.Optional[tp.Dict[str, tp.Any]] = None,
            pool_kwargs: tp.Optional[tp.Dict[str, tp.Any]] = None,
        ):
            super().__init__(model)
            self.is_classifier = isinstance(model, CatBoostClassifier)
            self.fit_kwargs = fit_kwargs
            self.pool_kwargs = pool_kwargs

        def prepare_training_pool(self, candidates_with_target: pd.DataFrame) -> "Pool":
            """Classifier: data+label; ranker: plus per-user group ids."""
            if self.is_classifier:
                pool_kwargs = {
                    "data": candidates_with_target.drop(columns=Columns.UserItem + [Columns.Target]),
                    "label": candidates_with_target[Columns.Target],
                }
            else:
                candidates_with_target = candidates_with_target.sort_values(by=[Columns.User])
                pool_kwargs = {
                    "data": candidates_with_target.drop(columns=Columns.UserItem + [Columns.Target]),
                    "label": candidates_with_target[Columns.Target],
                    "group_id": candidates_with_target[Columns.User].values,
                }
            if self.pool_kwargs is not None:
                pool_kwargs.update(self.pool_kwargs)
            return Pool(**pool_kwargs)

        def fit(self, candidates_with_target: pd.DataFrame) -> None:
            """Fit on a prepared training Pool."""
            training_pool = self.prepare_training_pool(candidates_with_target)
            fit_kwargs = {"X": training_pool}
            if self.fit_kwargs is not None:
                fit_kwargs.update(self.fit_kwargs)
            self.model.fit(**fit_kwargs)

else:
    from ...compat import CatBoostRerankerUnavailable as CatBoostReranker  # noqa: F401
