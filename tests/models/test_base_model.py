"""ModelBase.warmup: pre-compiling the serving graphs via throwaway
single-user recommends (one per filter_viewed variant)."""

import numpy as np
import pandas as pd

from rectools_tpu import Columns
from rectools_tpu.dataset import Dataset
from rectools_tpu.models import PopularModel, SASRecModel


class TestWarmup:
    def test_warmup_runs_and_returns_self(self) -> None:
        rng = np.random.default_rng(0)
        df = pd.DataFrame(
            {
                Columns.User: rng.integers(0, 20, 200),
                Columns.Item: rng.integers(0, 15, 200),
                Columns.Weight: 1.0,
                Columns.Datetime: pd.Timestamp("2024-01-01"),
            }
        )
        ds = Dataset.construct(df)
        model = PopularModel().fit(ds)
        assert model.warmup(ds, k=5) is model
        assert model.warmup(ds, k=5, filter_viewed=True) is model
        reco = model.recommend(df[Columns.User].unique()[:5], ds, k=5, filter_viewed=True)
        assert reco[Columns.User].nunique() == 5

    def test_warmup_transformer_with_whitelist(self) -> None:
        rng = np.random.default_rng(1)
        rows = []
        for u in range(12):
            for t, i in enumerate(rng.integers(0, 10, size=5)):
                rows.append((u, int(i), 1.0, pd.Timestamp("2024-01-01") + pd.Timedelta(hours=int(t))))
        ds = Dataset.construct(pd.DataFrame(rows, columns=Columns.Interactions))
        model = SASRecModel(
            n_blocks=1, n_heads=2, n_factors=8, session_max_len=4, epochs=1, batch_size=4, seed=0
        ).fit(ds)
        model.warmup(ds, k=3, items_to_recommend=np.arange(0, 10, 2))
        reco = model.recommend(
            np.arange(5), ds, k=3, filter_viewed=False, items_to_recommend=np.arange(0, 10, 2)
        )
        assert set(reco[Columns.Item]).issubset(set(range(0, 10, 2)))
