"""Hot/warm/cold orchestration conformance suite.

Mirrors the scenarios of reference tests/models/test_base.py:100-430: stub
models return distinguishable scores per target class (hot 0.x, warm 1.x,
cold 2.x), so each test pins exactly which code path served each target and
how raise/warn/ignore policies apply.
"""

import typing as tp
import warnings

import numpy as np
import pandas as pd
import pytest

from rectools_tpu import Columns
from rectools_tpu.dataset import Dataset
from rectools_tpu.models.base import ModelBase

from .data import DATASET, INTERACTIONS


class HotModel(ModelBase):
    recommends_for_cold = False
    recommends_for_warm = False

    def _fit(self, dataset: Dataset, *args: tp.Any, **kwargs: tp.Any) -> None:
        pass

    def _recommend_u2i(self, user_ids, dataset, k, filter_viewed, sorted_item_ids_to_recommend):
        return (
            np.repeat(user_ids, k),
            np.tile(np.arange(k), len(user_ids)),
            np.tile(np.arange(1, k + 1) * 0.1, len(user_ids)),
        )

    def _recommend_i2i(self, target_ids, dataset, k, sorted_item_ids_to_recommend):
        return (
            np.repeat(target_ids, k),
            np.tile(np.arange(k), len(target_ids)),
            np.tile(np.arange(1, k + 1) * 0.1, len(target_ids)),
        )


class HotWarmModel(HotModel):
    recommends_for_warm = True

    def _recommend_u2i_warm(self, user_ids, dataset, k, sorted_item_ids_to_recommend):
        return (
            np.repeat(user_ids, k),
            np.tile(np.arange(k), len(user_ids)),
            np.tile(np.arange(1, k + 1) * 0.1 + 1, len(user_ids)),
        )

    def _recommend_i2i_warm(self, target_ids, dataset, k, sorted_item_ids_to_recommend):
        return (
            np.repeat(target_ids, k),
            np.tile(np.arange(k), len(target_ids)),
            np.tile(np.arange(1, k + 1) * 0.1 + 1, len(target_ids)),
        )


class HotColdModel(HotModel):
    recommends_for_cold = True

    def _recommend_cold(self, target_ids, dataset, k, sorted_item_ids_to_recommend):
        return (
            np.repeat(target_ids, k),
            np.tile(np.arange(k), len(target_ids)),
            np.tile(np.arange(1, k + 1) * 0.1 + 2, len(target_ids)),
        )


class HotWarmColdModel(HotWarmModel, HotColdModel):
    pass


class TestHotWarmCold:
    def setup_method(self) -> None:
        self.models = {
            "hot": HotModel().fit(DATASET),
            "hot_warm": HotWarmModel().fit(DATASET),
            "hot_cold": HotColdModel().fit(DATASET),
            "hot_warm_cold": HotWarmColdModel().fit(DATASET),
        }
        user_features = pd.DataFrame({Columns.User: [40, 50], "feature": ["f1", "f1"], "value": [1, 2]})
        item_features = pd.DataFrame({Columns.Item: [16, 17], "feature": ["f1", "f1"], "value": [1, 2]})
        self.datasets = {
            "no_features": DATASET,
            "with_features": Dataset.construct(
                INTERACTIONS, user_features_df=user_features, item_features_df=item_features
            ),
        }
        self.hots = {"u2i": [10], "i2i": [11]}
        self.warms = {"u2i": [50], "i2i": [16]}
        self.colds = {"u2i": [60], "i2i": [18]}

    def _get_reco(self, targets, model_key, dataset_key, kind, on_unsupported_targets="raise"):
        model = self.models[model_key]
        if kind == "u2i":
            reco = model.recommend(
                users=targets, dataset=self.datasets[dataset_key], k=2, filter_viewed=False,
                add_rank_col=False, on_unsupported_targets=on_unsupported_targets,
            )
            reco = reco.rename(columns={Columns.User: "target"})
        else:
            reco = model.recommend_to_items(
                target_items=targets, dataset=self.datasets[dataset_key], k=2,
                add_rank_col=False, filter_itself=False, on_unsupported_targets=on_unsupported_targets,
            )
            reco = reco.rename(columns={Columns.TargetItem: "target"})
        return reco.astype({Columns.Score: np.float64})

    def _assert_reco_equal(self, actual, expected) -> None:
        np.testing.assert_array_equal(actual["target"].values, expected["target"].values)
        np.testing.assert_array_equal(actual[Columns.Item].values, expected[Columns.Item].values)
        np.testing.assert_allclose(actual[Columns.Score].values, expected[Columns.Score].values)

    @pytest.mark.parametrize("dataset_key", ("no_features", "with_features"))
    @pytest.mark.parametrize("kind", ("u2i", "i2i"))
    @pytest.mark.parametrize("model_key", ("hot", "hot_warm", "hot_cold", "hot_warm_cold"))
    def test_all_models_work_for_hot(self, dataset_key, kind, model_key) -> None:
        targets = self.hots[kind]
        reco = self._get_reco(targets, model_key, dataset_key, kind)
        expected = pd.DataFrame(
            {"target": np.repeat(targets, 2), Columns.Item: [11, 12], Columns.Score: [0.1, 0.2]}
        )
        self._assert_reco_equal(reco, expected)

    @pytest.mark.parametrize("dataset_key", ("no_features", "with_features"))
    @pytest.mark.parametrize("kind", ("u2i", "i2i"))
    @pytest.mark.parametrize("model_key", ("hot_cold", "hot_warm_cold"))
    def test_cold_models_work_for_cold(self, dataset_key, kind, model_key) -> None:
        targets = self.colds[kind]
        reco = self._get_reco(targets, model_key, dataset_key, kind)
        expected = pd.DataFrame(
            {"target": np.repeat(targets, 2), Columns.Item: [11, 12], Columns.Score: [2.1, 2.2]}
        )
        self._assert_reco_equal(reco, expected)

    @pytest.mark.parametrize("kind", ("u2i", "i2i"))
    @pytest.mark.parametrize("model_key", ("hot_warm", "hot_warm_cold"))
    def test_warm_models_work_for_warm_with_features(self, kind, model_key) -> None:
        targets = self.warms[kind]
        reco = self._get_reco(targets, model_key, "with_features", kind)
        expected = pd.DataFrame(
            {"target": np.repeat(targets, 2), Columns.Item: [11, 12], Columns.Score: [1.1, 1.2]}
        )
        self._assert_reco_equal(reco, expected)

    @pytest.mark.parametrize("kind", ("u2i", "i2i"))
    @pytest.mark.parametrize("model_key", ("hot_cold", "hot_warm_cold"))
    def test_cold_models_work_for_warm_without_features(self, kind, model_key) -> None:
        # without features, "warm" ids don't exist in the id map -> cold path
        targets = self.warms[kind]
        reco = self._get_reco(targets, model_key, "no_features", kind)
        expected = pd.DataFrame(
            {"target": np.repeat(targets, 2), Columns.Item: [11, 12], Columns.Score: [2.1, 2.2]}
        )
        self._assert_reco_equal(reco, expected)

    @pytest.mark.parametrize("kind", ("u2i", "i2i"))
    def test_cold_only_model_serves_warm_with_features_via_cold(self, kind) -> None:
        targets = self.warms[kind]
        reco = self._get_reco(targets, "hot_cold", "with_features", kind)
        expected = pd.DataFrame(
            {"target": np.repeat(targets, 2), Columns.Item: [11, 12], Columns.Score: [2.1, 2.2]}
        )
        self._assert_reco_equal(reco, expected)

    @pytest.mark.parametrize("kind", ("u2i", "i2i"))
    def test_full_model_works_for_all_with_features(self, kind) -> None:
        targets = self.hots[kind] + self.warms[kind] + self.colds[kind]
        reco = self._get_reco(targets, "hot_warm_cold", "with_features", kind)
        expected = pd.DataFrame(
            {
                "target": np.repeat(targets, 2),
                Columns.Item: [11, 12, 11, 12, 11, 12],
                Columns.Score: [0.1, 0.2, 1.1, 1.2, 2.1, 2.2],
            }
        )
        self._assert_reco_equal(reco, expected)

    @pytest.mark.parametrize("kind", ("u2i", "i2i"))
    def test_full_model_works_for_all_without_features(self, kind) -> None:
        targets = self.hots[kind] + self.warms[kind] + self.colds[kind]
        reco = self._get_reco(targets, "hot_warm_cold", "no_features", kind)
        expected = pd.DataFrame(
            {
                "target": np.repeat(targets, 2),
                Columns.Item: [11, 12, 11, 12, 11, 12],
                Columns.Score: [0.1, 0.2, 2.1, 2.2, 2.1, 2.2],
            }
        )
        self._assert_reco_equal(reco, expected)

    @pytest.mark.parametrize("kind", ("u2i", "i2i"))
    @pytest.mark.parametrize("model_key", ("hot", "hot_warm"))
    def test_not_cold_models_with_cold_targets_raise(self, kind, model_key) -> None:
        targets = self.colds[kind] + self.hots[kind]
        with pytest.raises(ValueError, match="doesn't support recommendations for cold"):
            self._get_reco(targets, model_key, "no_features", kind, on_unsupported_targets="raise")

    @pytest.mark.parametrize("kind", ("u2i", "i2i"))
    @pytest.mark.parametrize("model_key", ("hot", "hot_warm"))
    def test_not_cold_models_with_cold_targets_ignore(self, kind, model_key) -> None:
        targets = self.colds[kind] + self.hots[kind]
        actual = self._get_reco(targets, model_key, "no_features", kind, on_unsupported_targets="ignore")
        expected = self._get_reco(self.hots[kind], model_key, "no_features", kind)
        pd.testing.assert_frame_equal(actual, expected)

    @pytest.mark.parametrize("kind", ("u2i", "i2i"))
    @pytest.mark.parametrize("model_key", ("hot", "hot_warm"))
    def test_not_cold_models_with_cold_targets_warn(self, kind, model_key) -> None:
        targets = self.colds[kind] + self.hots[kind]
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            self._get_reco(targets, model_key, "no_features", kind, on_unsupported_targets="warn")
            assert len(w) == 1
            assert "support" in str(w[-1].message) and "cold" in str(w[-1].message)

    @pytest.mark.parametrize("kind", ("u2i", "i2i"))
    def test_hot_only_model_with_warm_targets_raise(self, kind) -> None:
        targets = self.warms[kind] + self.hots[kind]
        with pytest.raises(ValueError, match="doesn't support recommendations for warm"):
            self._get_reco(targets, "hot", "with_features", kind, on_unsupported_targets="raise")

    @pytest.mark.parametrize("kind", ("u2i", "i2i"))
    def test_hot_only_model_with_warm_targets_ignore(self, kind) -> None:
        targets = self.warms[kind] + self.hots[kind]
        actual = self._get_reco(targets, "hot", "with_features", kind, on_unsupported_targets="ignore")
        expected = self._get_reco(self.hots[kind], "hot", "with_features", kind)
        pd.testing.assert_frame_equal(actual, expected)
