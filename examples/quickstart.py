"""Quickstart: build a dataset, fit several model families, recommend, score.

Run: python examples/quickstart.py
(set RECTOOLS_PLATFORM=cpu|tpu to pin the jax platform; unreachable
configured platforms fall back to CPU so the example runs anywhere)
"""

import os

import jax

if os.environ.get("RECTOOLS_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["RECTOOLS_PLATFORM"])
else:
    try:
        jax.default_backend()
    except RuntimeError:  # configured platform unavailable (e.g. no TPU)
        jax.config.update("jax_platforms", "cpu")

import numpy as np
import pandas as pd

from rectools_tpu import Columns
from rectools_tpu.dataset import Dataset
from rectools_tpu.metrics import MAP, NDCG, Recall, calc_metrics
from rectools_tpu.models import ALSModel, EASEModel, PopularModel, SASRecModel


def make_synthetic_interactions(n_users: int = 200, n_items: int = 60, seed: int = 0) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    rows = []
    for user in range(n_users):
        n = int(rng.integers(4, 16))
        # two taste clusters so models have structure to find
        cluster = np.arange(0, 30) if user % 2 == 0 else np.arange(30, 60)
        for t, item in enumerate(rng.choice(cluster, size=n, replace=False)):
            rows.append((user, int(item), 1.0, pd.Timestamp("2024-01-01") + pd.Timedelta(days=t)))
    return pd.DataFrame(rows, columns=Columns.Interactions)


def main() -> None:
    interactions = make_synthetic_interactions()
    split_dt = interactions[Columns.Datetime].quantile(0.8)
    train = interactions[interactions[Columns.Datetime] < split_dt]
    test = interactions[interactions[Columns.Datetime] >= split_dt]

    dataset = Dataset.construct(train)
    test_users = test[test[Columns.User].isin(train[Columns.User])][Columns.User].unique()

    models = {
        "popular": PopularModel(),
        "ease": EASEModel(regularization=50.0),
        "als": ALSModel(factors=32, iterations=5, random_state=0),
        "sasrec": SASRecModel(n_blocks=1, n_heads=2, n_factors=32, session_max_len=16, epochs=3, seed=0),
    }

    metrics = {"recall@10": Recall(k=10), "ndcg@10": NDCG(k=10), "map@10": MAP(k=10)}
    for name, model in models.items():
        model.fit(dataset)
        reco = model.recommend(
            users=test_users, dataset=dataset, k=10, filter_viewed=True, on_unsupported_targets="ignore"
        )
        values = calc_metrics(metrics, reco=reco, interactions=test, catalog=train[Columns.Item].unique())
        print(f"{name:10s} " + "  ".join(f"{k}={v:.4f}" for k, v in values.items()))


if __name__ == "__main__":
    main()
