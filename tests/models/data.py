"""Canonical tiny dataset for model tests (pattern of reference tests/models/data.py)."""

import pandas as pd

from rectools_tpu import Columns
from rectools_tpu.dataset import Dataset

INTERACTIONS = pd.DataFrame(
    [
        [10, 11, 1, "2021-11-30"],
        [10, 12, 1, "2021-11-30"],
        [10, 14, 1, "2021-11-29"],
        [20, 11, 1, "2021-11-28"],
        [20, 12, 1, "2021-11-29"],
        [20, 15, 1, "2021-11-27"],
        [30, 11, 1, "2021-11-24"],
        [30, 12, 1, "2021-11-23"],
        [30, 13, 1, "2021-11-23"],
        [30, 14, 1, "2021-11-25"],
        [40, 11, 1, "2021-11-26"],
        [40, 15, 1, "2021-11-26"],
        [40, 17, 1, "2021-11-25"],
    ],
    columns=Columns.Interactions,
)

DATASET = Dataset.construct(INTERACTIONS)
