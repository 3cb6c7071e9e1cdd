"""Orbax directory checkpoint tests."""

import numpy as np
import pandas as pd
import pytest

from rectools_tpu import Columns
from rectools_tpu.dataset import Dataset
from rectools_tpu.models import SASRecModel
from rectools_tpu.utils.checkpointing import HAS_ORBAX, load_training_checkpoint, save_training_checkpoint

from .models.data import DATASET, INTERACTIONS

requires_orbax = pytest.mark.skipif(not HAS_ORBAX, reason="orbax unavailable")

TINY = dict(n_blocks=1, n_heads=2, n_factors=8, session_max_len=4, epochs=1, batch_size=4, seed=32, dropout_rate=0.0)


@requires_orbax
class TestOrbaxCheckpointing:
    def test_round_trip(self, tmp_path) -> None:
        model = SASRecModel(**TINY).fit(DATASET)
        save_training_checkpoint(tmp_path / "ckpt", model)
        restored = load_training_checkpoint(tmp_path / "ckpt")
        r1 = model.recommend([10, 20], DATASET, k=2, filter_viewed=False)
        r2 = restored.recommend([10, 20], DATASET, k=2, filter_viewed=False)
        np.testing.assert_allclose(r1[Columns.Score].values, r2[Columns.Score].values, atol=1e-5)
        np.testing.assert_array_equal(r1[Columns.Item].values, r2[Columns.Item].values)
        assert restored.training_module.epochs_completed == 1

    def test_round_trip_with_cat_features(self, tmp_path) -> None:
        item_features = pd.DataFrame(
            {"id": [11, 12, 13, 14, 15, 17], "feature": "genre", "value": ["a", "a", "b", "b", "c", "c"]}
        )
        dataset = Dataset.construct(INTERACTIONS, item_features_df=item_features, cat_item_features=["genre"])
        model = SASRecModel(**TINY).fit(dataset)
        save_training_checkpoint(tmp_path / "ckpt", model)
        restored = load_training_checkpoint(tmp_path / "ckpt")
        r1 = model.recommend([10], dataset, k=3, filter_viewed=False)
        r2 = restored.recommend([10], dataset, k=3, filter_viewed=False)
        np.testing.assert_allclose(r1[Columns.Score].values, r2[Columns.Score].values, atol=1e-5)

    def test_explicit_model_class(self, tmp_path) -> None:
        model = SASRecModel(**TINY).fit(DATASET)
        save_training_checkpoint(tmp_path / "ckpt", model)
        restored = load_training_checkpoint(tmp_path / "ckpt", model_cls=SASRecModel)
        assert isinstance(restored, SASRecModel)

    def test_unfitted_raises(self, tmp_path) -> None:
        model = SASRecModel(**TINY)
        with pytest.raises(RuntimeError):
            save_training_checkpoint(tmp_path / "ckpt", model)

    def test_resume_training_after_restore(self, tmp_path) -> None:
        model = SASRecModel(**TINY).fit(DATASET)
        save_training_checkpoint(tmp_path / "ckpt", model)
        restored = load_training_checkpoint(tmp_path / "ckpt")
        restored.fit_partial(DATASET, max_epochs=1)
        assert restored.training_module.epochs_completed == 2
