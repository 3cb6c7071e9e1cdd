"""Random interaction-level splitter.

Behavioral parity with reference rectools/model_selection/random_split.py:27-145.
"""

import typing as tp

import numpy as np
import pandas as pd

from ..dataset import Interactions
from .splitter import Splitter


class RandomSplitter(Splitter):
    """Non-overlapping random test folds of a fixed fraction
    (reference random_split.py:27-145).

    >>> import pandas as pd
    >>> from rectools_tpu import Columns
    >>> df = pd.DataFrame(
    ...     [
    ...         [1, 2, 1, "2021-09-01"],
    ...         [2, 1, 1, "2021-09-02"],
    ...         [2, 3, 1, "2021-09-03"],
    ...         [3, 2, 1, "2021-09-03"],
    ...         [3, 3, 1, "2021-09-04"],
    ...         [3, 4, 1, "2021-09-04"],
    ...         [1, 2, 1, "2021-09-05"],
    ...         [4, 2, 1, "2021-09-05"],
    ...     ],
    ...     columns=[Columns.User, Columns.Item, Columns.Weight, Columns.Datetime],
    ... ).astype({Columns.Datetime: "datetime64[ns]"})
    >>> interactions = Interactions(df)
    >>> splitter = RandomSplitter(test_fold_frac=0.25, random_state=42, n_splits=2, filter_cold_users=False,
    ...                     filter_cold_items=False, filter_already_seen=False)
    >>> for train_ids, test_ids, _ in splitter.split(interactions):
    ...     print(sorted(train_ids), sorted(test_ids))  # doctest: +SKIP
    """

    def __init__(
        self,
        test_fold_frac: float,
        n_splits: int = 1,
        random_state: tp.Optional[int] = None,
        filter_cold_users: bool = True,
        filter_cold_items: bool = True,
        filter_already_seen: bool = True,
    ) -> None:
        if test_fold_frac <= 0.0 or test_fold_frac >= 1.0:
            raise ValueError("Value of test_fold_frac must be between 0 and 1")
        if test_fold_frac * n_splits > 1:
            raise ValueError(f"Impossible to create {n_splits} non-overlapping folds {test_fold_frac:.1%} each")
        super().__init__(filter_cold_users, filter_cold_items, filter_already_seen)
        self.random_state = random_state
        self.n_splits = n_splits
        self.test_fold_frac = test_fold_frac

    def _split_without_filter(
        self,
        interactions: Interactions,
        collect_fold_stats: bool = False,
    ) -> tp.Iterator[tp.Tuple[np.ndarray, np.ndarray, tp.Dict[str, tp.Any]]]:
        rng = np.random.default_rng(self.random_state)
        df = interactions.df
        idx = pd.RangeIndex(0, len(df))

        test_fold_size = int(round(self.test_fold_frac * len(df)))
        if test_fold_size == 0:
            raise ValueError(
                f"Length of interactions ({len(df)}) with test_fold_frac={self.test_fold_frac} "
                "leads to empty test part"
            )
        if test_fold_size == len(df):
            raise ValueError(
                f"Length of interactions ({len(df)}) with test_fold_frac={self.test_fold_frac} "
                "leads to empty train part: all interactions are related to the test"
            )
        if self.n_splits * test_fold_size > len(df):
            raise ValueError(
                f"Impossible to create {self.n_splits} non-overlapping folds "
                f"with size {test_fold_size} from {len(df)} interactions"
            )

        shuffled_idx = rng.permutation(idx)
        for i_split in range(self.n_splits):
            left = i_split * test_fold_size
            right = (i_split + 1) * test_fold_size
            test_idx = shuffled_idx[left:right]
            train_idx = np.concatenate((shuffled_idx[:left], shuffled_idx[right:]))
            yield train_idx, test_idx, {"i_split": i_split}
