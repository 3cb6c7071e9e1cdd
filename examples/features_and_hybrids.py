"""Datasets with user/item features and the models that exploit them.

Mirrors the reference's feature-dataset and hybrid-model examples
(reference examples/4_dataset_with_features.ipynb,
5_benchmark_iALS_with_features.ipynb, 6_benchmark_lightfm_inference.ipynb):
build a `Dataset` with sparse categorical + direct features, fit iALS with
feature blocks, fit the hybrid MF (LightFM-equivalent) and use its content
tower to recommend for COLD users no model ever saw, and fit the two-tower
DSSM on the same features.

Run: python examples/features_and_hybrids.py
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
from rectools_tpu.metrics import Recall, calc_metrics
from rectools_tpu.models import ALSModel, DSSMModel, HybridMFModel


def make_tables(n_users: int = 240, n_items: int = 60, seed: int = 0):
    rng = np.random.default_rng(seed)
    # users in segment "a" like low items, segment "b" high items — and the
    # segment is a USER FEATURE, so feature-aware models can generalize it
    segment = np.where(np.arange(n_users) % 2 == 0, "a", "b")
    rows = []
    for user in range(n_users):
        pool = np.arange(0, 30) if segment[user] == "a" else np.arange(30, 60)
        for t, item in enumerate(rng.choice(pool, size=int(rng.integers(5, 14)), replace=False)):
            rows.append((user, int(item), 1.0, pd.Timestamp("2024-01-01") + pd.Timedelta(days=t)))
    interactions = pd.DataFrame(rows, columns=Columns.Interactions)

    user_features = pd.DataFrame(
        {
            "id": np.arange(n_users),
            "segment": segment,
            "age": rng.integers(18, 70, size=n_users).astype(float),
        }
    ).melt(id_vars="id", var_name="feature", value_name="value")

    item_features = pd.DataFrame(
        {
            "id": np.arange(n_items),
            "genre": np.where(np.arange(n_items) < 30, "low", "high"),
        }
    ).melt(id_vars="id", var_name="feature", value_name="value")
    return interactions, user_features, item_features


def main() -> None:
    interactions, user_features, item_features = make_tables()
    split_dt = interactions[Columns.Datetime].quantile(0.8)
    train = interactions[interactions[Columns.Datetime] < split_dt]
    test = interactions[interactions[Columns.Datetime] >= split_dt]
    test = test[test[Columns.User].isin(train[Columns.User])]

    # sparse features: 'segment'/'genre' one-hot (cat_*_features), 'age' kept
    # as a direct real-valued column
    dataset = Dataset.construct(
        train,
        user_features_df=user_features,
        cat_user_features=["segment"],
        item_features_df=item_features,
        cat_item_features=["genre"],
    )
    print(
        f"user features: {dataset.user_features.values.shape[1]} cols "
        f"({[name for name, _ in dataset.user_features.names]}...)"
    )

    test_users = test[Columns.User].unique()
    metrics = {"recall@10": Recall(k=10)}

    # iALS with feature blocks: latent factors + one factor per feature
    # column, alternating solves paired like the reference's
    # fit_features_together=False mode
    for fit_together in (False, True):
        als = ALSModel(factors=16, iterations=5, random_state=0, fit_features_together=fit_together)
        als.fit(dataset)
        reco = als.recommend(test_users, dataset, k=10, filter_viewed=True)
        score = calc_metrics(metrics, reco, test, train)["recall@10"]
        print(f"iALS(features_together={fit_together}): recall@10 = {score:.4f}")

    # Hybrid MF (LightFM-equivalent): identity + feature embeddings summed.
    hybrid = HybridMFModel(no_components=16, loss="warp", epochs=8, random_state=0)
    hybrid.fit(dataset)
    reco = hybrid.recommend(test_users, dataset, k=10, filter_viewed=True)
    score = calc_metrics(metrics, reco, test, train)["recall@10"]
    print(f"HybridMF(warp): recall@10 = {score:.4f}")

    # COLD start through features: users 9000+ have no interactions at all —
    # only their segment feature row. The hybrid's content tower still ranks.
    cold_users = pd.DataFrame(
        {"id": [9000, 9001], "feature": "segment", "value": ["a", "b"]}
    )
    cold_dataset = Dataset.construct(
        train,
        user_features_df=pd.concat([user_features, cold_users], ignore_index=True),
        cat_user_features=["segment"],
        item_features_df=item_features,
        cat_item_features=["genre"],
    )
    cold_reco = hybrid.recommend([9000, 9001], cold_dataset, k=5, filter_viewed=False)
    print("\nCold-user recommendations from the feature tower:")
    print(cold_reco)
    seg_a_items = cold_reco[cold_reco[Columns.User] == 9000][Columns.Item]
    print(f"cold 'a'-segment user got low-range items: {(seg_a_items < 30).mean():.0%}")

    # DSSM two-tower on the same feature space
    dssm = DSSMModel(n_factors=16, max_epochs=3, batch_size=64, random_state=0)
    dssm.fit(dataset)
    reco = dssm.recommend(test_users, dataset, k=10, filter_viewed=True)
    score = calc_metrics(metrics, reco, test, train)["recall@10"]
    print(f"\nDSSM(two-tower): recall@10 = {score:.4f}")


if __name__ == "__main__":
    main()
