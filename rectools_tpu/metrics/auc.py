"""ROC-AUC based ranking metrics: PartialAUC and PAP.

Behavioral parity with reference rectools/metrics/auc.py:28-560.
"""

import typing as tp
from enum import Enum

import attr
import pandas as pd

from ..columns import Columns
from .base import outer_merge_reco
from .debias import DebiasableMetrikAtK, calc_debiased_fit_task, debias_interactions


class InsufficientHandling(str, Enum):
    """Strategy for handling users with insufficient recommendation lists."""

    IGNORE = "ignore"
    EXCLUDE = "exclude"
    RAISE = "raise"


@attr.s
class AUCFitted:
    """Outer-merged reco enriched with tp/fp cumulative columns
    (reference auc.py:37-58)."""

    outer_merged_enriched: pd.DataFrame = attr.ib()
    n_pos: pd.Series = attr.ib()
    n_fp_insufficient: pd.Series = attr.ib()


@attr.s
class _AUCMetric(DebiasableMetrikAtK):
    """Base class for partial-AUC metrics (reference auc.py:62-269)."""

    insufficient_handling: str = attr.ib(default=InsufficientHandling.IGNORE.value)

    @insufficient_handling.validator
    def _check_insufficient_handling(self, attribute: tp.Any, value: str) -> None:
        possible = {item.value for item in InsufficientHandling.__members__.values()}
        if value not in possible:
            raise ValueError(f"`insufficient_handling` must be one of the {possible}. Got {value}.")

    @classmethod
    def fit(
        cls, reco: pd.DataFrame, interactions: pd.DataFrame, k_max: int, insufficient_handling_needed: bool
    ) -> AUCFitted:
        """Outer merge + cumulative tp/fp columns."""
        cls._check(reco, interactions=interactions)
        outer_merged = outer_merge_reco(reco, interactions)
        recommended_mask = ~outer_merged[Columns.Rank].isna()
        outer_merged["__tp"] = recommended_mask & outer_merged["__test_positive"]
        outer_merged["__fp"] = recommended_mask & ~outer_merged["__test_positive"]

        grouped = outer_merged.groupby(Columns.User, sort=False)
        cumsum_stats = grouped.agg(__fp_cumsum=("__fp", "cumsum"), __test_pos_cumsum=("__test_positive", "cumsum"))
        stats = grouped.agg(n_pos=("__test_positive", "sum"), n_fp=("__fp", "sum"))

        n_pos = stats["n_pos"].dropna().rename_axis(Columns.User)
        outer_merged = pd.concat([outer_merged, cumsum_stats[["__fp_cumsum", "__test_pos_cumsum"]]], axis=1)

        if insufficient_handling_needed:
            users_n_fp = stats["n_fp"].dropna().rename_axis(Columns.User)
            n_fp_insufficient = users_n_fp[users_n_fp < k_max]
            users_with_fn = outer_merged.loc[~recommended_mask, Columns.User].unique()
            n_fp_insufficient = n_fp_insufficient[n_fp_insufficient.index.isin(users_with_fn)]
        else:
            n_fp_insufficient = pd.Series([], dtype=float)
        return AUCFitted(outer_merged, n_pos, n_fp_insufficient)

    def _get_sufficient_reco_explanation(self) -> str:
        raise NotImplementedError()

    def _handle_insufficient_cases(
        self, outer_merged: pd.DataFrame, n_pos: pd.Series, n_fp_insufficient: pd.Series
    ) -> tp.Tuple[pd.DataFrame, pd.Series]:
        if self.insufficient_handling == InsufficientHandling.IGNORE:
            return outer_merged, n_pos
        insufficient_users = n_fp_insufficient[n_fp_insufficient < self.k].index.values
        if len(insufficient_users) == 0:
            return outer_merged, n_pos
        if self.insufficient_handling == InsufficientHandling.EXCLUDE:
            outer_merged_suf = outer_merged[~outer_merged[Columns.User].isin(insufficient_users)]
            n_pos_suf = n_pos[~n_pos.index.isin(insufficient_users)]
            return outer_merged_suf, n_pos_suf
        raise ValueError(
            f"{self.__class__.__name__}@{self.k} requires at least {self.k} negatives in "
            f"recommendations for each user (or all test positives ranked). There are "
            f"{len(insufficient_users)} users with less than required. "
            f"{self._get_sufficient_reco_explanation()} "
            f'Set `insufficient_handling` to "{InsufficientHandling.IGNORE.value}" or '
            f'"{InsufficientHandling.EXCLUDE.value}" to disable this error.'
        )

    def _calc_roc_auc(self, cropped_outer_merged: pd.DataFrame, n_pos: pd.Series) -> pd.Series:
        gain = (self.k - cropped_outer_merged["__fp_cumsum"]) * cropped_outer_merged["__tp"]
        numerator = (
            pd.DataFrame({Columns.User: cropped_outer_merged[Columns.User], "__gain": gain})
            .groupby(Columns.User)["__gain"]
            .sum()
        )
        denominator = n_pos * self.k
        auc = numerator.rename("num").to_frame().join(denominator.rename("den"), how="outer")
        return (auc["num"] / auc["den"]).fillna(0)

    def calc(self, reco: pd.DataFrame, interactions: pd.DataFrame) -> float:
        """Mean metric value over users."""
        return self.calc_per_user(reco, interactions).mean()

    def calc_per_user(self, reco: pd.DataFrame, interactions: pd.DataFrame) -> pd.Series:
        """Per-user metric values."""
        is_debiased = False
        if self.debias_config is not None:
            interactions = debias_interactions(interactions, self.debias_config)
            is_debiased = True
        self._check(reco, interactions=interactions)
        insufficient_handling_needed = self.insufficient_handling != InsufficientHandling.IGNORE
        fitted = self.fit(reco, interactions, self.k, insufficient_handling_needed)
        return self.calc_per_user_from_fitted(fitted, is_debiased)

    def calc_from_fitted(self, fitted: AUCFitted, is_debiased: bool = False) -> float:
        """Mean metric value from fitted data."""
        return self.calc_per_user_from_fitted(fitted, is_debiased).mean()

    def calc_per_user_from_fitted(self, fitted: AUCFitted, is_debiased: bool = False) -> pd.Series:
        """Per-user metric values from fitted data."""
        raise NotImplementedError()


@attr.s
class PartialAUC(_AUCMetric):
    """Partial AUC on the top-k irrelevant items (reference auc.py:271-380).

    >>> import pandas as pd
    >>> reco = pd.DataFrame({
    ...     Columns.User: [1, 1, 2, 2, 2, 3, 3],
    ...     Columns.Item: [1, 2, 3, 1, 2, 3, 2],
    ...     Columns.Rank: [1, 2, 1, 2, 3, 1, 2]})
    >>> interactions = pd.DataFrame({
    ...     Columns.User: [1, 1, 2, 2, 3, 3],
    ...     Columns.Item: [1, 2, 1, 3, 1, 2]})
    >>> PartialAUC(k=3).calc_per_user(reco, interactions).values
    array([1.        , 1.        , 0.33333333])
    """

    def _get_sufficient_reco_explanation(self) -> str:
        return (
            f"It is enough to have `n_user_positives` + `PAUC_k` ({self.k}) recommended items per user."
        )

    def calc_per_user_from_fitted(self, fitted: AUCFitted, is_debiased: bool = False) -> pd.Series:
        """Per-user partial AUC from fitted data."""
        self._check_debias(is_debiased, obj_name="AUCFitted")
        outer_merged = fitted.outer_merged_enriched
        cropped = outer_merged[(outer_merged["__fp_cumsum"] < self.k) & (~outer_merged[Columns.Rank].isna())]
        cropped_suf, n_pos_suf = self._handle_insufficient_cases(
            outer_merged=cropped, n_pos=fitted.n_pos, n_fp_insufficient=fitted.n_fp_insufficient
        )
        return self._calc_roc_auc(cropped_suf, n_pos_suf)


@attr.s
class PAP(_AUCMetric):
    """Partial AUC + precision@k joint metric (reference auc.py:382-500).

    >>> import pandas as pd
    >>> reco = pd.DataFrame({
    ...     Columns.User: [1, 1, 2, 2, 2, 3, 3],
    ...     Columns.Item: [1, 2, 3, 1, 2, 3, 2],
    ...     Columns.Rank: [1, 2, 1, 2, 3, 1, 2]})
    >>> interactions = pd.DataFrame({
    ...     Columns.User: [1, 1, 2, 2, 3, 3],
    ...     Columns.Item: [1, 2, 1, 3, 1, 2]})
    >>> PAP(k=3).calc_per_user(reco, interactions).values
    array([1.        , 1.        , 0.33333333])
    """

    def _get_sufficient_reco_explanation(self) -> str:
        return f"It is enough to have `PAP_k` ({self.k}) * 2 recommended items per user."

    def calc_per_user_from_fitted(self, fitted: AUCFitted, is_debiased: bool = False) -> pd.Series:
        """Per-user pAp@k from fitted data."""
        self._check_debias(is_debiased, obj_name="AUCFitted")
        outer_merged = fitted.outer_merged_enriched
        cropped = outer_merged[
            (outer_merged["__test_pos_cumsum"] <= self.k)
            & (outer_merged["__fp_cumsum"] < self.k)
            & (~outer_merged[Columns.Rank].isna())
        ]
        cropped_suf, n_pos_suf = self._handle_insufficient_cases(
            outer_merged=cropped,
            n_pos=fitted.n_pos.clip(upper=self.k),
            n_fp_insufficient=fitted.n_fp_insufficient,
        )
        return self._calc_roc_auc(cropped_suf, n_pos_suf)


AucMetric = tp.Union[PartialAUC, PAP]


def calc_auc_metrics(
    metrics: tp.Dict[str, AucMetric],
    reco: pd.DataFrame,
    interactions: pd.DataFrame,
) -> tp.Dict[str, float]:
    """Family dispatcher sharing fitted outer merges per debias config
    (reference auc.py:503-560)."""
    results = {}
    insufficient_handling_needed = any(
        metric.insufficient_handling != InsufficientHandling.IGNORE for metric in metrics.values()
    )
    fit_tasks = calc_debiased_fit_task(metrics.values(), interactions)
    fitted_debiased = {
        config: _AUCMetric.fit(reco, interactions_d, k_max_d, insufficient_handling_needed)
        for config, (k_max_d, interactions_d) in fit_tasks.items()
    }
    for name, metric in metrics.items():
        results[name] = metric.calc_from_fitted(fitted_debiased[metric.debias_config], is_debiased=True)
    return results
