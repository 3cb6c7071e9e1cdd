"""Cross-validation: splitters, `cross_validate`, and comparing a model zoo.

Mirrors the workflow of the reference's cross-validation example
(reference examples/2_cross_validation.ipynb): pick a splitter, declare
metrics, hand `cross_validate` a dict of models, and read per-fold rows.
Also shows `ref_models` feeding an Intersection metric.

Run: python examples/cross_validation.py
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
from rectools_tpu.metrics import MAP, Intersection, NDCG, Recall
from rectools_tpu.model_selection import LastNSplitter, RandomSplitter, TimeRangeSplitter, cross_validate
from rectools_tpu.models import ALSModel, EASEModel, ItemKNNModel, PopularModel


def make_interactions(n_users: int = 300, n_items: int = 80, seed: int = 0) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    rows = []
    for user in range(n_users):
        cluster = np.arange(0, 40) if user % 2 == 0 else np.arange(40, 80)
        for t, item in enumerate(rng.choice(cluster, size=int(rng.integers(6, 20)), replace=False)):
            rows.append((user, int(item), 1.0, pd.Timestamp("2024-01-01") + pd.Timedelta(days=t)))
    return pd.DataFrame(rows, columns=Columns.Interactions)


def main() -> None:
    dataset = Dataset.construct(make_interactions())

    # Three splitter families, same protocol knobs as the reference:
    # filter_cold_* drops test users/items unseen in train, filter_already_seen
    # drops (user, item) pairs present in train from the test fold.
    splitters = {
        "time_range(2 folds x 3d)": TimeRangeSplitter(test_size="3D", n_splits=2),
        "last_n(1 per user)": LastNSplitter(n=1, n_splits=2),
        "random(10%)": RandomSplitter(test_fold_frac=0.1, n_splits=2, random_state=7),
    }
    for name, splitter in splitters.items():
        n_test = [
            len(test_ids) for _, test_ids, _ in splitter.split(dataset.interactions, collect_fold_stats=False)
        ]
        print(f"{name}: test interactions per fold = {n_test}")

    models = {
        "popular": PopularModel(),
        "ease": EASEModel(regularization=50.0),
        "als": ALSModel(factors=16, iterations=4, random_state=0),
        "knn_bm25": ItemKNNModel(K=20, variant="bm25"),
    }
    metrics = {
        "recall@10": Recall(k=10),
        "ndcg@10": NDCG(k=10),
        "map@10": MAP(k=10),
        # how much each model's list overlaps the popularity baseline's
        "pop_overlap@10": Intersection(k=10, ref_k=10),
    }

    result = cross_validate(
        dataset=dataset,
        splitter=TimeRangeSplitter(test_size="3D", n_splits=2),
        metrics=metrics,
        models=models,
        k=10,
        filter_viewed=True,
        ref_models=["popular"],  # feeds the Intersection metric
        validate_ref_models=True,  # ...and still scores popular itself
    )

    folds = pd.DataFrame(result["splits"])
    print("\nFolds:\n", folds[["i_split", "train", "test", "train_users", "test_users"]])

    table = pd.DataFrame(result["metrics"])
    print("\nPer-fold metrics:\n", table)
    print(
        "\nMean over folds:\n",
        table.drop(columns="i_split").groupby("model").mean().round(4).sort_values("ndcg@10", ascending=False),
    )


if __name__ == "__main__":
    main()
