"""DSSMModel tests."""

import numpy as np
import pandas as pd
import pytest

from rectools_tpu import Columns
from rectools_tpu.dataset import Dataset
from rectools_tpu.dataset.dssm_datasets import DSSMTrainDataset
from rectools_tpu.models import DSSMModel

from .data import INTERACTIONS
from .utils import assert_dumps_loads_do_not_change_model, assert_second_fit_refits_model

USER_FEATURES = pd.DataFrame({"id": [10, 20, 30, 40], "feature": "age", "value": ["y", "o", "y", "o"]})
ITEM_FEATURES = pd.DataFrame(
    {"id": [11, 12, 13, 14, 15, 17], "feature": "genre", "value": ["a", "a", "b", "b", "c", "c"]}
)


def _dataset() -> Dataset:
    return Dataset.construct(
        INTERACTIONS,
        user_features_df=USER_FEATURES,
        cat_user_features=["age"],
        item_features_df=ITEM_FEATURES,
        cat_item_features=["genre"],
    )


class TestDSSM:
    def test_fit_recommend(self) -> None:
        dataset = _dataset()
        model = DSSMModel(n_factors=8, max_epochs=2, batch_size=4, random_state=0).fit(dataset)
        reco = model.recommend([10, 20], dataset, k=3, filter_viewed=True)
        assert set(reco.columns) == set(Columns.Recommendations)
        seen = set(map(tuple, INTERACTIONS[[Columns.User, Columns.Item]].values))
        assert not any((u, i) in seen for u, i in reco[[Columns.User, Columns.Item]].values)

    def test_requires_features(self) -> None:
        dataset = Dataset.construct(INTERACTIONS)
        model = DSSMModel(n_factors=8, max_epochs=1)
        with pytest.raises(ValueError):
            model.fit(dataset)

    def test_second_fit_refits(self) -> None:
        model = DSSMModel(n_factors=8, max_epochs=1, batch_size=4, random_state=0)
        assert_second_fit_refits_model(model, _dataset())

    def test_dumps_loads(self) -> None:
        dataset = _dataset()
        model = DSSMModel(n_factors=8, max_epochs=1, batch_size=4, random_state=0).fit(dataset)
        assert_dumps_loads_do_not_change_model(model, dataset)

    def test_get_vectors(self) -> None:
        dataset = _dataset()
        model = DSSMModel(n_factors=8, max_epochs=1, batch_size=4, random_state=0).fit(dataset)
        user_vectors, item_vectors = model.get_vectors(dataset)
        assert user_vectors.shape == (4, 8)
        assert item_vectors.shape == (6, 8)


class TestDSSMTrainDataset:
    def test_positive_sampling_weight_proportional(self) -> None:
        dataset = _dataset()
        train_data = DSSMTrainDataset.from_dataset(dataset)
        rng = np.random.default_rng(0)
        # sample many positives for user 0 (internal); all must be seen items
        rows = np.zeros(500, dtype=np.int64)
        positives = train_data.sample_positives(rows, rng)
        seen_internal = set(train_data.interactions[0].indices)
        assert set(positives) <= seen_internal
        # every seen item appears at least once under uniform weights
        assert set(positives) == seen_internal

    def test_rejects_empty_rows(self) -> None:
        from scipy import sparse

        items = sparse.csr_matrix(np.ones((3, 2), dtype=np.float32))
        users = sparse.csr_matrix(np.ones((2, 2), dtype=np.float32))
        interactions = sparse.csr_matrix(np.array([[1.0, 0, 0], [0, 0, 0]]))
        with pytest.raises(ValueError):
            DSSMTrainDataset(items, users, interactions)
