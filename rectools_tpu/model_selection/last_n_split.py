"""Leave-k-out splitter on last interactions per user.

Behavioral parity with reference rectools/model_selection/last_n_split.py:27-160.
"""

import typing as tp

import numpy as np
import pandas as pd

from ..columns import Columns
from ..dataset import Interactions
from .splitter import Splitter


class LastNSplitter(Splitter):
    """Last-n interactions per user per fold, stable order for tied datetimes
    (reference last_n_split.py:27-160).

    >>> import pandas as pd
    >>> df = pd.DataFrame(
    ...     [
    ...         [1, 1, 1, "2021-09-01"],
    ...         [1, 2, 1, "2021-09-02"],
    ...         [1, 1, 1, "2021-09-03"],
    ...         [1, 2, 1, "2021-09-04"],
    ...         [1, 2, 1, "2021-09-05"],
    ...         [2, 1, 1, "2021-08-20"],
    ...         [2, 2, 1, "2021-08-21"],
    ...         [2, 2, 1, "2021-08-22"],
    ...     ],
    ...     columns=[Columns.User, Columns.Item, Columns.Weight, Columns.Datetime],
    ... ).astype({Columns.Datetime: "datetime64[ns]"})
    >>> interactions = Interactions(df)
    >>> splitter = LastNSplitter(2, 2, False, False, False)
    >>> for train_ids, test_ids, _ in splitter.split(interactions):
    ...     print(train_ids, test_ids)
    [0] [1 2 5]
    [0 1 2 5] [3 4 6 7]
    >>> splitter = LastNSplitter(2, 2, True, False, False)
    >>> for train_ids, test_ids, _ in splitter.split(interactions):
    ...     print(train_ids, test_ids)
    [0] [1 2]
    [0 1 2 5] [3 4 6 7]
    """

    def __init__(
        self,
        n: int,
        n_splits: int = 1,
        filter_cold_users: bool = True,
        filter_cold_items: bool = True,
        filter_already_seen: bool = True,
    ) -> None:
        super().__init__(filter_cold_users, filter_cold_items, filter_already_seen)
        self.n = n
        self.n_splits = n_splits

    def _split_without_filter(
        self,
        interactions: Interactions,
        collect_fold_stats: bool = False,
    ) -> tp.Iterator[tp.Tuple[np.ndarray, np.ndarray, tp.Dict[str, tp.Any]]]:
        df = interactions.df
        idx = pd.RangeIndex(0, len(df))
        grouped = df.groupby(Columns.User)
        # "first" rank => ties keep table order (stable guarantee)
        time_order = grouped[Columns.Datetime].rank(method="first", ascending=True).astype(int)
        n_interactions = grouped[Columns.User].transform("size").astype(int)
        inv_ranks = n_interactions - time_order + 1

        for i_split in range(self.n_splits)[::-1]:
            min_rank = i_split * self.n  # excluded
            max_rank = min_rank + self.n  # included
            test_mask = (inv_ranks > min_rank) & (inv_ranks <= max_rank)
            train_mask = inv_ranks > max_rank
            yield idx[train_mask].values, idx[test_mask].values, {"i_split": self.n_splits - i_split - 1}
