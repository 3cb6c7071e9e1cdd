"""Visual apps: recommendation inspection and metric exploration, headless.

Mirrors the reference's visualization example (reference
examples/7_visualization.ipynb). The widget rendering needs the optional
`ipywidgets`/`plotly` extras (Jupyter); everything else — building the
app's data storage, grouping reco/interaction tables per request,
save/load round trips, and MetricsApp's fold aggregation — is
dependency-free and shown here. In a notebook the same `construct` calls
render interactive widgets.

Run: python examples/visual_apps.py
"""

import os
import tempfile

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
from rectools_tpu.metrics import NDCG, Recall
from rectools_tpu.model_selection import TimeRangeSplitter, cross_validate
from rectools_tpu.models import EASEModel, PopularModel
from rectools_tpu.visuals import AppDataStorage, MetricsApp


def make_interactions(n_users: int = 150, n_items: int = 40, seed: int = 0) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    rows = []
    for user in range(n_users):
        for t, item in enumerate(rng.choice(n_items, size=int(rng.integers(5, 12)), replace=False)):
            rows.append((user, int(item), 1.0, pd.Timestamp("2024-02-01") + pd.Timedelta(days=t)))
    return pd.DataFrame(rows, columns=Columns.Interactions)


def main() -> None:
    interactions = make_interactions()
    dataset = Dataset.construct(interactions)

    # two models' recommendations for the inspection app
    users = dataset.user_id_map.external_ids[:50]
    reco = {
        "ease": EASEModel(regularization=20.0).fit(dataset).recommend(users, dataset, 5, True),
        "popular": PopularModel().fit(dataset).recommend(users, dataset, 5, True),
    }
    item_data = pd.DataFrame(
        {
            Columns.Item: np.arange(40),
            "title": [f"item #{i}" for i in range(40)],
            "genre": np.where(np.arange(40) % 2 == 0, "even", "odd"),
        }
    )

    # AppDataStorage is what VisualApp.construct builds under the hood —
    # usable directly for headless inspection or persistence
    storage = AppDataStorage.from_raw(
        reco=reco,
        item_data=item_data,
        interactions=interactions,
        is_u2i=True,
        selected_requests={"user 3": 3, "user 7": 7},
    )
    print(f"requests: {list(storage.selected_requests)}")
    print("user 3 history:\n", storage.grouped_interactions["user 3"].head(3))
    print("user 3 by ease:\n", storage.grouped_reco["ease"]["user 3"].head(3))

    # save/load round trip (folder of CSVs, the reference's format)
    with tempfile.TemporaryDirectory() as tmp:
        folder = os.path.join(tmp, "app_data")
        storage.save(folder)
        restored = AppDataStorage.load(folder)
    assert list(restored.selected_requests) == list(storage.selected_requests)
    print("AppDataStorage save/load: round trip ok")
    # In Jupyter: VisualApp.construct(reco=reco, interactions=interactions,
    # item_data=item_data, selected_users={...}) renders the widget UI.

    # MetricsApp over cross_validate output: per-fold rows + metadata
    cv = cross_validate(
        dataset=dataset,
        splitter=TimeRangeSplitter(test_size="2D", n_splits=2),
        metrics={"recall@10": Recall(k=10), "ndcg@10": NDCG(k=10)},
        models={"ease": EASEModel(regularization=20.0), "popular": PopularModel()},
        k=10,
        filter_viewed=True,
    )
    models_metrics = pd.DataFrame(cv["metrics"]).rename(columns={"model": Columns.Model, "i_split": Columns.Split})
    app = MetricsApp.construct(
        models_metrics,
        models_metadata=pd.DataFrame({Columns.Model: ["ease", "popular"], "family": ["linear", "heuristic"]}),
        auto_display=False,  # rendering needs plotly; data prep does not
    )
    print("\nMetricsApp fold-average frame:")
    print(app.chart_data().round(4))
    print("\nMetricsApp fold-0 frame:")
    print(app.chart_data(fold=0).round(4))


if __name__ == "__main__":
    main()
