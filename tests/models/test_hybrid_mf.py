"""HybridMFModel (LightFM-equivalent) tests."""

import numpy as np
import pandas as pd
import pytest

from rectools_tpu import Columns
from rectools_tpu.dataset import Dataset
from rectools_tpu.models import HybridMFModel

from .data import DATASET, INTERACTIONS
from .utils import (
    assert_default_config_and_default_model_params_are_the_same,
    assert_dumps_loads_do_not_change_model,
    assert_second_fit_refits_model,
)


def _structured_dataset() -> Dataset:
    """Two user blocks with disjoint item preferences (separable signal)."""
    rng = np.random.default_rng(0)
    rows = []
    for u in range(40):
        group_items = np.arange(0, 10) if u < 20 else np.arange(10, 20)
        for i in rng.choice(group_items, size=6, replace=False):
            rows.append((u, int(i), 1.0, "2021-01-01"))
    df = pd.DataFrame(rows, columns=Columns.Interactions)
    return Dataset.construct(df)


class TestHybridMF:
    @pytest.mark.parametrize("loss", ["bpr", "warp", "warp-kos"])
    def test_learns_block_structure(self, loss) -> None:
        # logistic on positives-only data cannot rank discriminatively (same
        # as LightFM's logistic loss on implicit feedback), so only the
        # pairwise losses are held to the block-structure bar.
        dataset = _structured_dataset()
        model = HybridMFModel(no_components=16, loss=loss, epochs=60, learning_rate=0.05, random_state=0, batch_size=64)
        model.fit(dataset)
        reco = model.recommend(users=[0, 1, 2], dataset=dataset, k=5, filter_viewed=True)
        # users 0-2 belong to the first block: recommendations should come
        # mostly from the unseen items of their own block (items 0..9)
        own_block = (reco[Columns.Item] < 10).mean()
        assert own_block > 0.6, f"{loss}: only {own_block:.0%} in own block"

    def test_warp_kos_config_round_trip(self) -> None:
        model = HybridMFModel(loss="warp-kos", k=3, n=7)
        restored = HybridMFModel.from_config(model.get_config())
        assert restored.loss == "warp-kos"
        assert (restored.k, restored.n) == (3, 7)

    def test_logistic_trains_without_nan(self) -> None:
        dataset = _structured_dataset()
        model = HybridMFModel(no_components=8, loss="logistic", epochs=5, random_state=0)
        model.fit(dataset)
        assert np.isfinite(model.params["user_emb"]).all()
        reco = model.recommend([0], dataset, k=3, filter_viewed=True)
        assert len(reco) == 3

    def test_warm_and_cold(self) -> None:
        user_features = pd.DataFrame({"id": [10, 20, 30, 40, 50], "feature": "age", "value": ["y", "o", "y", "o", "y"]})
        ds = Dataset.construct(INTERACTIONS, user_features_df=user_features, cat_user_features=["age"])
        model = HybridMFModel(no_components=4, epochs=2, random_state=0).fit(ds)
        reco = model.recommend([50, 99], ds, k=2, filter_viewed=False, on_unsupported_targets="ignore")
        assert set(reco[Columns.User]) == {50, 99}

    def test_second_fit_refits(self) -> None:
        model = HybridMFModel(no_components=4, epochs=2, random_state=0)
        assert_second_fit_refits_model(model, DATASET)

    def test_dumps_loads(self) -> None:
        model = HybridMFModel(no_components=4, epochs=2, random_state=0).fit(DATASET)
        assert_dumps_loads_do_not_change_model(model, DATASET)

    def test_fit_partial_continues(self) -> None:
        model = HybridMFModel(no_components=4, epochs=1, random_state=0).fit(DATASET)
        params_before = {k: v.copy() for k, v in model.params.items()}
        model.fit_partial(DATASET, epochs=1)
        assert not np.allclose(params_before["user_emb"], model.params["user_emb"])

    def test_default_config(self) -> None:
        assert_default_config_and_default_model_params_are_the_same(HybridMFModel(), {})

    def test_i2i(self) -> None:
        model = HybridMFModel(no_components=4, epochs=2, random_state=0).fit(DATASET)
        reco = model.recommend_to_items([11, 12], DATASET, k=2)
        assert not (reco[Columns.TargetItem] == reco[Columns.Item]).any()
