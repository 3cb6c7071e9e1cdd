"""Splitter base class: fold iteration + cold/seen filtering.

Behavioral parity with reference rectools/model_selection/splitter.py:27-166.
"""

import typing as tp

import numpy as np
import pandas as pd

from ..columns import Columns
from ..dataset import Interactions
from .utils import get_not_seen_mask


class Splitter:
    """Base class for cross-validation splitters. Subclasses implement
    ``_split_without_filter``."""

    def __init__(
        self, filter_cold_users: bool = True, filter_cold_items: bool = True, filter_already_seen: bool = True
    ) -> None:
        self.filter_cold_users = filter_cold_users
        self.filter_cold_items = filter_cold_items
        self.filter_already_seen = filter_already_seen

    def split(
        self,
        interactions: Interactions,
        collect_fold_stats: bool = False,
    ) -> tp.Iterator[tp.Tuple[np.ndarray, np.ndarray, tp.Dict[str, tp.Any]]]:
        """Yield (train_idx, test_idx, split_info) with filtering applied."""
        for train_idx, test_idx, split_info in self._split_without_filter(interactions, collect_fold_stats):
            yield self.filter(interactions, collect_fold_stats, train_idx, test_idx, split_info)

    def _split_without_filter(
        self,
        interactions: Interactions,
        collect_fold_stats: bool = False,
    ) -> tp.Iterator[tp.Tuple[np.ndarray, np.ndarray, tp.Dict[str, tp.Any]]]:
        raise NotImplementedError

    def filter(
        self,
        interactions: Interactions,
        collect_fold_stats: bool,
        train_idx: np.ndarray,
        test_idx: np.ndarray,
        split_info: tp.Dict[str, tp.Any],
    ) -> tp.Tuple[np.ndarray, np.ndarray, tp.Dict[str, tp.Any]]:
        """Drop cold users/items and already-seen pairs from test; optionally
        collect fold stats (reference splitter.py:89-166)."""
        need_ui = self.filter_cold_users or self.filter_cold_items or self.filter_already_seen or collect_fold_stats

        if need_ui:
            df = interactions.df
            train_users = df[Columns.User].values[train_idx]
            train_items = df[Columns.Item].values[train_idx]
            test_users = df[Columns.User].values[test_idx]
            test_items = df[Columns.Item].values[test_idx]

        unq_train_users = None
        unq_train_items = None

        if self.filter_cold_users:
            unq_train_users = pd.unique(train_users)
            mask = np.isin(test_users, unq_train_users)
            test_users, test_items, test_idx = test_users[mask], test_items[mask], test_idx[mask]

        if self.filter_cold_items:
            unq_train_items = pd.unique(train_items)
            mask = np.isin(test_items, unq_train_items)
            test_users, test_items, test_idx = test_users[mask], test_items[mask], test_idx[mask]

        if self.filter_already_seen:
            mask = get_not_seen_mask(train_users, train_items, test_users, test_items)
            test_users, test_items, test_idx = test_users[mask], test_items[mask], test_idx[mask]

        if collect_fold_stats:
            if unq_train_users is None:
                unq_train_users = pd.unique(train_users)
            if unq_train_items is None:
                unq_train_items = pd.unique(train_items)
            split_info["train"] = train_users.size
            split_info["train_users"] = unq_train_users.size
            split_info["train_items"] = unq_train_items.size
            split_info["test"] = test_users.size
            split_info["test_users"] = pd.unique(test_users).size
            split_info["test_items"] = pd.unique(test_items).size

        return train_idx, test_idx, split_info
