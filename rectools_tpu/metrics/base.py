"""Metric base classes and reco/interactions merge helpers.

Behavioral parity with reference rectools/metrics/base.py:30-160.
"""

import typing as tp
import warnings

import attr
import numpy as np
import pandas as pd

from ..columns import Columns

ExternalItemId = tp.Union[str, int]
Catalog = tp.Collection[ExternalItemId]


@attr.s(auto_attribs=True)
class MetricAtK:
    """Base class of metrics computed on the top-`k` recommendations."""

    k: int

    @classmethod
    def _check(
        cls,
        reco: pd.DataFrame,
        interactions: tp.Optional[pd.DataFrame] = None,
        prev_interactions: tp.Optional[pd.DataFrame] = None,
        ref_reco: tp.Optional[pd.DataFrame] = None,
    ) -> None:
        cls._check_columns(reco, "reco", (Columns.User, Columns.Item, Columns.Rank))
        cls._check_columns(interactions, "interactions", (Columns.User, Columns.Item))
        cls._check_columns(prev_interactions, "prev_interactions", (Columns.User, Columns.Item))
        cls._check_columns(ref_reco, "ref_reco", (Columns.User, Columns.Item, Columns.Rank))
        cls._check_rank_column(reco, "reco")
        cls._check_rank_column(ref_reco, "ref_reco")

    @staticmethod
    def _check_columns(df: tp.Optional[pd.DataFrame], name: str, required_columns: tp.Iterable[str]) -> None:
        if df is None:
            return
        required = set(required_columns)
        actual = set(df.columns)
        if not actual >= required:
            raise KeyError(f"Missed columns {required - actual} in '{name}' dataframe")

    @staticmethod
    def _check_rank_column(reco: tp.Optional[pd.DataFrame], df_name: str) -> None:
        if reco is None or reco.empty:
            return
        if reco[Columns.Rank].dtype.kind not in ("i", "u"):
            warnings.warn(f"Expected integer dtype of '{Columns.Rank}' column in '{df_name}' dataframe.")
        if int(round(reco[Columns.Rank].min())) != 1:
            warnings.warn(f"Expected min value of '{Columns.Rank}' column in '{df_name}' dataframe to be equal to 1.")


def merge_reco(reco: pd.DataFrame, interactions: pd.DataFrame) -> pd.DataFrame:
    """Left-join ranks onto interactions (reference base.py:81-105)."""
    return pd.merge(
        interactions.reindex(columns=Columns.UserItem),
        reco.reindex(columns=Columns.UserItem + [Columns.Rank]),
        on=Columns.UserItem,
        how="left",
    )


def outer_merge_reco(reco: pd.DataFrame, interactions: pd.DataFrame) -> pd.DataFrame:
    """Outer merge keeping every rank 1..max per user plus unpredicted test
    positives (null ranks); adds the "__test_positive" flag
    (reference base.py:106-160). Used by AUC metrics."""
    prepared_interactions = interactions.reindex(columns=Columns.UserItem).drop_duplicates()
    prepared_interactions["__test_positive"] = True
    test_users = prepared_interactions[Columns.User].unique()
    prepared_reco = reco[reco[Columns.User].isin(test_users)].reindex(columns=Columns.UserItem + [Columns.Rank])
    merged = pd.merge(prepared_interactions, prepared_reco, on=Columns.UserItem, how="outer")
    max_rank = prepared_reco.groupby(Columns.User)[Columns.Rank].max()
    full_ranks = max_rank.apply(lambda a: list(range(1, int(a) + 1))).explode().rename(Columns.Rank)
    ranked_reco = merged.merge(full_ranks, on=[Columns.User, Columns.Rank], how="outer").sort_values(
        [Columns.User, Columns.Rank]
    )
    ranked_reco["__test_positive"] = ranked_reco["__test_positive"].fillna(False).astype(bool)
    return ranked_reco.reset_index(drop=True)
