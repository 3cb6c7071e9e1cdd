"""Model configs, flat params, and save/load round trips.

Mirrors the reference's config-and-saving example (reference
examples/9_model_configs_and_saving.ipynb): declare models from dicts with
class paths, round-trip `get_config`/`from_config`, flatten configs for
experiment trackers with `get_params`, and persist fitted models with
`save`/`load_model`.

Run: python examples/configs_and_saving.py
"""

import os
import tempfile
from pathlib import Path

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
from rectools_tpu.models import (
    PopularModel,
    SASRecModel,
    load_model,
    model_from_config,
    model_from_params,
)


def make_interactions(n_users: int = 120, n_items: int = 40, seed: int = 0) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    rows = []
    for user in range(n_users):
        for t, item in enumerate(rng.choice(n_items, size=int(rng.integers(4, 10)), replace=False)):
            rows.append((user, int(item), 1.0, pd.Timestamp("2024-05-01") + pd.Timedelta(days=t)))
    return pd.DataFrame(rows, columns=Columns.Interactions)


def main() -> None:
    dataset = Dataset.construct(make_interactions())

    # 1. Models from plain dicts. The "cls" key takes a class path (or the
    #    class object itself), so experiment configs are pure data.
    config = {
        "cls": "rectools_tpu.models.SASRecModel",
        "n_blocks": 1,
        "n_heads": 2,
        "n_factors": 32,
        "session_max_len": 16,
        "epochs": 2,
        "seed": 0,
    }
    model = model_from_config(config)
    print(f"from config dict -> {type(model).__name__}")

    # 2. get_config round trip: everything needed to rebuild the model.
    round_trip = SASRecModel.from_config(model.get_config())
    assert round_trip.get_config() == model.get_config()
    print("get_config/from_config round trip: identical configs")

    # simple_types=True makes the config JSON-ready (class paths as strings)
    json_ready = model.get_config(simple_types=True)
    print(f"json-ready cls: {json_ready['cls']}")

    # 3. get_params flattens nested configs for experiment trackers.
    flat = model.get_params(simple_types=True)
    shown = {k: flat[k] for k in sorted(flat) if k in ("n_blocks", "n_heads", "n_factors", "epochs")}
    print(f"flat params sample: {shown}")
    rebuilt = model_from_params({**flat, "cls": "rectools_tpu.models.SASRecModel"})
    assert type(rebuilt) is SASRecModel
    print("model_from_params: rebuilt from the flat dict")

    # 4. save/load a FITTED model: weights + config + id maps in one file.
    model.fit(dataset)
    users = dataset.user_id_map.external_ids[:8]
    reco_before = model.recommend(users, dataset, k=5, filter_viewed=False)

    with tempfile.TemporaryDirectory() as tmp:
        path = Path(tmp) / "sasrec.rectools"
        n_bytes = model.save(path)
        print(f"saved {n_bytes} bytes")
        # load_model dispatches on the stored class — no need to know it
        restored = load_model(path)
    reco_after = restored.recommend(users, dataset, k=5, filter_viewed=False)
    pd.testing.assert_frame_equal(reco_before, reco_after)
    print(f"load_model -> {type(restored).__name__}: identical recommendations")

    # 5. Works the same for every family (heuristics included).
    pop = PopularModel(popularity="n_interactions").fit(dataset)
    with tempfile.TemporaryDirectory() as tmp:
        path = Path(tmp) / "pop.rectools"
        pop.save(path)
        pop2 = load_model(path)
    pd.testing.assert_frame_equal(
        pop.recommend(users, dataset, k=5, filter_viewed=True),
        pop2.recommend(users, dataset, k=5, filter_viewed=True),
    )
    print("PopularModel save/load: identical recommendations")


if __name__ == "__main__":
    main()
