"""Model selection: splitters + cross-validation driver."""

from .cross_validate import cross_validate
from .last_n_split import LastNSplitter
from .random_split import RandomSplitter
from .splitter import Splitter
from .time_split import TimeRangeSplitter
from .utils import get_not_seen_mask

__all__ = [
    "cross_validate",
    "LastNSplitter",
    "RandomSplitter",
    "Splitter",
    "TimeRangeSplitter",
    "get_not_seen_mask",
]
