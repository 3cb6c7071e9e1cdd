"""Leave-time-out splitter with sliding date windows.

Behavioral parity with reference rectools/model_selection/time_split.py:26-147.
"""

import re
import typing as tp

import numpy as np
import pandas as pd

from ..columns import Columns
from ..dataset import Interactions
from ..utils.misc import pairwise
from .splitter import Splitter


class TimeRangeSplitter(Splitter):
    r"""Sliding time-window test folds; test_size like "1D" / "4H"
    (reference time_split.py:26-147).

    >>> import pandas as pd
    >>> df = pd.DataFrame(
    ...     [
    ...         [1, 2, 1, "2021-09-01"],
    ...         [2, 1, 1, "2021-09-02"],
    ...         [2, 3, 1, "2021-09-03"],
    ...         [3, 2, 1, "2021-09-03"],
    ...         [3, 3, 1, "2021-09-04"],
    ...         [4, 4, 1, "2021-09-04"],
    ...         [1, 2, 1, "2021-09-05"],
    ...     ],
    ...     columns=[Columns.User, Columns.Item, Columns.Weight, Columns.Datetime],
    ... ).astype({Columns.Datetime: "datetime64[ns]"})
    >>> interactions = Interactions(df)
    >>> splitter = TimeRangeSplitter("1D", 2, False, False, False)
    >>> for train_ids, test_ids, _ in splitter.split(interactions):
    ...     print(train_ids, test_ids)
    [0 1 2 3] [4 5]
    [0 1 2 3 4 5] [6]
    >>> splitter = TimeRangeSplitter("1D", 2, True, False, False)
    >>> for train_ids, test_ids, _ in splitter.split(interactions):
    ...     print(train_ids, test_ids)
    [0 1 2 3] [4]
    [0 1 2 3 4 5] [6]
    """

    def __init__(
        self,
        test_size: str,
        n_splits: int = 1,
        filter_cold_users: bool = True,
        filter_cold_items: bool = True,
        filter_already_seen: bool = True,
    ) -> None:
        super().__init__(filter_cold_users, filter_cold_items, filter_already_seen)
        m = re.fullmatch(r"([1-9]\d*)([DHh])", test_size)
        if not m:
            raise ValueError(r"Test size must match to `[1-9]\d*[DHh]`, e.g. 1D, 4H")
        self.test_size = test_size
        self.test_size_value = int(m.groups()[0])
        # pandas>=3 dropped the upper-case "H" offset alias; normalize the
        # unit for every pandas call while accepting the reference's spelling
        self.test_size_unit = {"D": "D", "H": "h", "h": "h"}[m.groups()[1]]
        self.n_splits = n_splits

    def get_test_fold_borders(self, interactions: Interactions) -> tp.List[tp.Tuple[pd.Timestamp, pd.Timestamp]]:
        """Datetime borders of test folds, ending at the ceiled last interaction."""
        last_dt = interactions.df[Columns.Datetime].max()
        last_dt_ceiled = last_dt.ceil(self.test_size_unit)
        if last_dt_ceiled == last_dt:
            last_dt_ceiled += pd.Timedelta(1, unit=self.test_size_unit)
        start_dt = last_dt_ceiled - pd.Timedelta(self.n_splits * self.test_size_value, unit=self.test_size_unit)
        date_range = pd.date_range(
            start=start_dt,
            periods=self.n_splits + 1,
            freq=f"{self.test_size_value}{self.test_size_unit}",
            tz=last_dt.tz,
        )
        return list(pairwise(date_range))

    def _split_without_filter(
        self,
        interactions: Interactions,
        collect_fold_stats: bool = False,
    ) -> tp.Iterator[tp.Tuple[np.ndarray, np.ndarray, tp.Dict[str, tp.Any]]]:
        idx = pd.RangeIndex(0, len(interactions.df))
        series_datetime = interactions.df[Columns.Datetime]
        for i_split, (start, end) in enumerate(self.get_test_fold_borders(interactions)):
            train_mask = series_datetime < start
            test_mask = (series_datetime >= start) & (series_datetime < end)
            yield idx[train_mask].values, idx[test_mask].values, {"i_split": i_split, "start": start, "end": end}
