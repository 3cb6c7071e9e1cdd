"""Metrics tour: every metric family on one recommendation table, plus
popularity debiasing.

Mirrors the reference's metrics and debiased-metrics examples (reference
examples/3_metrics.ipynb, 8_debiased_metrics.ipynb): ranking,
classification, novelty, popularity, serendipity, diversity, DQ and
catalog metrics through one `calc_metrics` call, then the same accuracy
metrics re-scored with an IQR popularity debias.

Run: python examples/metrics_guide.py
"""

import os

import jax

if os.environ.get("RECTOOLS_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["RECTOOLS_PLATFORM"])
else:
    try:
        jax.default_backend()
    except RuntimeError:
        jax.config.update("jax_platforms", "cpu")

import numpy as np
import pandas as pd

from rectools_tpu import Columns
from rectools_tpu.dataset import Dataset
from rectools_tpu.metrics import (
    MAP,
    MRR,
    NDCG,
    AvgRecPopularity,
    CatalogCoverage,
    DebiasConfig,
    HitRate,
    IntraListDiversity,
    MeanInvUserFreq,
    PairwiseHammingDistanceCalculator,
    PartialAUC,
    Precision,
    Recall,
    Serendipity,
    SufficientReco,
    calc_metrics,
)
from rectools_tpu.models import EASEModel


def make_interactions(n_users: int = 250, n_items: int = 60, seed: int = 0) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    rows = []
    # popularity skew: low item ids are an order of magnitude more likely
    weights = 1.0 / np.arange(1, n_items + 1)
    weights /= weights.sum()
    for user in range(n_users):
        items = rng.choice(n_items, size=int(rng.integers(5, 15)), replace=False, p=weights)
        for t, item in enumerate(items):
            rows.append((user, int(item), 1.0, pd.Timestamp("2024-03-01") + pd.Timedelta(days=t)))
    return pd.DataFrame(rows, columns=Columns.Interactions)


def main() -> None:
    interactions = make_interactions()
    split_dt = interactions[Columns.Datetime].quantile(0.75)
    train = interactions[interactions[Columns.Datetime] < split_dt]
    test = interactions[interactions[Columns.Datetime] >= split_dt]
    test = test[test[Columns.User].isin(train[Columns.User])]

    dataset = Dataset.construct(train)
    model = EASEModel(regularization=30.0).fit(dataset)
    reco = model.recommend(
        users=test[Columns.User].unique(), dataset=dataset, k=10, filter_viewed=True
    )

    # item "genre" features for the diversity metric's distance calculator
    item_ids = np.arange(60)
    features = pd.DataFrame({"genre_a": item_ids % 2, "genre_b": item_ids % 3}, index=item_ids)
    diversity_calc = PairwiseHammingDistanceCalculator(features)

    metrics = {
        # ranking quality
        "ndcg@10": NDCG(k=10),
        "map@10": MAP(k=10),
        "mrr@10": MRR(k=10),
        "pauc@10": PartialAUC(k=10, insufficient_handling="exclude"),
        # classification
        "recall@10": Recall(k=10),
        "precision@10": Precision(k=10),
        "hitrate@10": HitRate(k=10),
        # beyond-accuracy
        "novelty@10": MeanInvUserFreq(k=10),
        "avg_pop@10": AvgRecPopularity(k=10),
        "serendipity@10": Serendipity(k=10),
        "diversity@10": IntraListDiversity(k=10, distance_calculator=diversity_calc),
        # recommendation quality / catalog
        "sufficient@10": SufficientReco(k=10),
        "coverage@10": CatalogCoverage(k=10),
    }
    values = calc_metrics(
        metrics,
        reco=reco,
        interactions=test,
        prev_interactions=train,  # serendipity/novelty need the train history
        catalog=dataset.item_id_map.external_ids,  # coverage/serendipity need the catalog
    )
    print("All families on one table:")
    for name, value in values.items():
        print(f"  {name:>16}: {value:.4f}")

    # Debias: down-sample each item's test interactions to the IQR bound so
    # head items can't dominate accuracy metrics. Same classes, one config.
    debias = DebiasConfig(iqr_coef=1.5, random_state=32)
    debiased = calc_metrics(
        {
            "recall@10": Recall(k=10, debias_config=debias),
            "ndcg@10": NDCG(k=10, debias_config=debias),
            "map@10": MAP(k=10, debias_config=debias),
        },
        reco=reco,
        interactions=test,
    )
    print("\nDebiased (IQR down-sampled) accuracy:")
    for name, value in debiased.items():
        print(f"  {name:>16}: {value:.4f}  (biased: {values[name]:.4f})")


if __name__ == "__main__":
    main()
