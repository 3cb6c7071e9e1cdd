"""Warm/cold targets, error policies, save/load, and serving warm-up.

Walks the parts of the recommend pipeline the quickstart skips:
- hot vs warm vs cold targets and which models can serve which,
- the `on_unsupported_targets` raise/warn/ignore policies,
- config round-trips and the save/load cycle,
- `model.warmup` to pre-compile serving shape buckets.

Run: python examples/warm_cold_serving.py
"""

import os
import tempfile
import warnings

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
from rectools_tpu.models import HybridMFModel, ItemKNNModel, load_model, model_from_config


def main() -> None:
    rng = np.random.default_rng(0)
    rows = []
    for u in range(60):
        for t, i in enumerate(rng.integers(0, 40, size=rng.integers(4, 10))):
            rows.append((u, int(i), 1.0, pd.Timestamp("2024-01-01") + pd.Timedelta(days=int(t))))
    interactions = pd.DataFrame(rows, columns=Columns.Interactions)

    # Users 60-64 are WARM: they have features but no interactions (their ids
    # appear only in the features frame, so the id map appends them after the
    # hot users). User 999 is COLD: completely unknown.
    user_features = pd.DataFrame(
        {
            "id": list(range(65)),
            "feature": "segment",
            "value": [("a" if u % 2 else "b") for u in range(65)],
        }
    )
    item_features = pd.DataFrame(
        {"id": list(range(40)), "feature": "genre", "value": [f"g{i % 5}" for i in range(40)]}
    )
    dataset = Dataset.construct(
        interactions,
        user_features_df=user_features,
        cat_user_features=["segment"],
        item_features_df=item_features,
        cat_item_features=["genre"],
    )
    print(f"hot users: {dataset.n_hot_users}, total known: {dataset.user_id_map.size}")

    # HybridMF (the LightFM equivalent) serves hot AND warm AND cold targets.
    hybrid = HybridMFModel(no_components=8, epochs=5, random_state=0).fit(dataset)
    targets = [0, 1, 62, 63, 999]  # hot, hot, warm, warm, cold
    reco = hybrid.recommend(targets, dataset, k=3, filter_viewed=True)
    kinds = {u: ("hot" if u < 60 else "warm" if u < 65 else "cold") for u in targets}
    print("\nHybridMF serves every class:")
    for u, grp in reco.groupby(Columns.User):
        print(f"  user {u} ({kinds[u]}): items {list(grp[Columns.Item])}")

    # PopularModel serves warm targets by falling back to its cold answer
    # (reference semantics). ItemKNN supports neither warm nor cold, so the
    # on_unsupported_targets policy decides what happens to user 999:
    knn = ItemKNNModel(K=10, variant="cosine").fit(dataset)
    try:
        knn.recommend([0, 999], dataset, k=3, filter_viewed=True)
    except ValueError as exc:
        print(f"\nraise policy (default): {type(exc).__name__}: {str(exc)[:70]}...")
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        reco = knn.recommend([0, 999], dataset, k=3, filter_viewed=True, on_unsupported_targets="warn")
    print(f"warn policy: served {reco[Columns.User].nunique()} of 2 targets, warning: "
          f"{str(caught[-1].message)[:60]}...")

    # Config round-trip and save/load.
    cfg = hybrid.get_config(simple_types=True)
    clone = model_from_config(cfg)
    print(f"\nconfig round-trip: {type(clone).__name__} with no_components={clone.no_components}")
    with tempfile.NamedTemporaryFile(suffix=".rct", delete=False) as f:
        path = f.name
    hybrid.save(path)
    restored = load_model(path)
    r1 = hybrid.recommend([0], dataset, k=3, filter_viewed=True)
    r2 = restored.recommend([0], dataset, k=3, filter_viewed=True)
    assert r1[Columns.Item].tolist() == r2[Columns.Item].tolist()
    print(f"save/load: restored model reproduces recommendations ({path})")
    os.unlink(path)

    # Serving warm-up: pre-compile the query shape buckets so the first real
    # request doesn't pay XLA compilation (matters on TPU; instant on CPU).
    hybrid.warmup(dataset, k=3)
    print("warmup: serving shape buckets compiled")


if __name__ == "__main__":
    main()
