"""Behavioral conformance tests pinning reference semantics that the main
transformer test file doesn't cover: training-data filtering, determinism,
checkpoint surgery, negative-sampling ranges (pattern of reference
tests/models/nn/transformers/test_sasrec.py)."""

import numpy as np
import pandas as pd
import pytest

from rectools_tpu import Columns
from rectools_tpu.dataset import Dataset
from rectools_tpu.models import BERT4RecModel, SASRecModel
from rectools_tpu.models.nn.transformers import leave_one_out_mask
from rectools_tpu.models.nn.transformers.negative_sampler import CatalogUniformSampler

from ...data import DATASET, INTERACTIONS
from ...utils import assert_reco_equal

TINY = dict(n_blocks=1, n_heads=2, n_factors=8, session_max_len=4, epochs=1, batch_size=4, seed=32, dropout_rate=0.0)


class TestTrainFiltering:
    def test_min_user_interactions_drops_short_sessions(self) -> None:
        """Users with < train_min_user_interactions are excluded from training
        (reference data_preparator.py:214-224); user 9 has one interaction."""
        df = pd.concat(
            [
                INTERACTIONS,
                pd.DataFrame(
                    {
                        Columns.User: [9],
                        Columns.Item: [11],
                        Columns.Weight: [1.0],
                        Columns.Datetime: [pd.Timestamp("2021-11-30")],
                    }
                ),
            ]
        )
        ds = Dataset.construct(df)
        model = SASRecModel(train_min_user_interactions=2, **TINY).fit(ds)
        assert 9 not in model.data_preparator.train_dataset.user_id_map.external_ids
        model_all = SASRecModel(train_min_user_interactions=1, **TINY).fit(ds)
        assert 9 in model_all.data_preparator.train_dataset.user_id_map.external_ids

    def test_session_max_len_keeps_tail(self) -> None:
        """Long sessions are truncated to the most recent interactions."""
        df = pd.DataFrame(
            {
                Columns.User: [1] * 10,
                Columns.Item: list(range(100, 110)),
                Columns.Weight: 1.0,
                Columns.Datetime: pd.date_range("2024-01-01", periods=10, freq="D"),
            }
        )
        ds = Dataset.construct(df)
        model = SASRecModel(**TINY).fit(ds)  # session_max_len=4 -> tail of 5 kept (max_len + 1)
        prep = model.data_preparator
        kept_items = set(prep.train_dataset.interactions.df[Columns.Item])
        external = {prep.item_id_map.external_ids[i] for i in kept_items}
        # only the most recent (session_max_len + 1) items survive
        assert external == {105, 106, 107, 108, 109}


class TestDeterminism:
    def test_same_seed_same_model(self) -> None:
        m1 = SASRecModel(**TINY).fit(DATASET)
        m2 = SASRecModel(**TINY).fit(DATASET)
        r1 = m1.recommend([10, 20], DATASET, k=3, filter_viewed=False)
        r2 = m2.recommend([10, 20], DATASET, k=3, filter_viewed=False)
        assert_reco_equal(r1, r2)
        np.testing.assert_allclose(
            r1[Columns.Score].values, r2[Columns.Score].values, atol=1e-6
        )

    def test_different_seed_different_model(self) -> None:
        cfg = {**TINY, "seed": 32}
        other = {**TINY, "seed": 33}
        m1 = SASRecModel(**cfg).fit(DATASET)
        m2 = SASRecModel(**other).fit(DATASET)
        r1 = m1.recommend([10, 20], DATASET, k=3, filter_viewed=False)
        r2 = m2.recommend([10, 20], DATASET, k=3, filter_viewed=False)
        assert not np.allclose(r1[Columns.Score].values, r2[Columns.Score].values)

    def test_dropout_only_in_training(self) -> None:
        """Recommendation is deterministic even with dropout enabled."""
        model = SASRecModel(**{**TINY, "dropout_rate": 0.5}).fit(DATASET)
        r1 = model.recommend([10, 20], DATASET, k=3, filter_viewed=False)
        r2 = model.recommend([10, 20], DATASET, k=3, filter_viewed=False)
        np.testing.assert_allclose(r1[Columns.Score].values, r2[Columns.Score].values, atol=0)


class TestCheckpointSurgery:
    def test_load_from_checkpoint(self, tmp_path) -> None:
        model = SASRecModel(**TINY).fit(DATASET)
        path = tmp_path / "ckpt.pkl"
        model.save_checkpoint(path)
        loaded = SASRecModel.load_from_checkpoint(path)
        assert_reco_equal(
            model.recommend([10], DATASET, k=3, filter_viewed=False),
            loaded.recommend([10], DATASET, k=3, filter_viewed=False),
        )

    def test_load_from_checkpoint_with_params_update(self, tmp_path) -> None:
        """Flat-key config surgery at load time (reference base.py:678-710)."""
        model = SASRecModel(**TINY).fit(DATASET)
        path = tmp_path / "ckpt.pkl"
        model.save_checkpoint(path)
        loaded = SASRecModel.load_from_checkpoint(path, model_params_update={"recommend_batch_size": 16})
        assert loaded.recommend_batch_size == 16
        # weights survive the surgery
        assert_reco_equal(
            model.recommend([10], DATASET, k=3, filter_viewed=False),
            loaded.recommend([10], DATASET, k=3, filter_viewed=False),
        )

    def test_load_weights_from_checkpoint(self, tmp_path) -> None:
        m1 = SASRecModel(**TINY).fit(DATASET)
        path = tmp_path / "ckpt.pkl"
        m1.save_checkpoint(path)
        m2 = SASRecModel(**{**TINY, "seed": 99}).fit(DATASET)
        m2.load_weights_from_checkpoint(path)
        assert_reco_equal(
            m1.recommend([10], DATASET, k=3, filter_viewed=False),
            m2.recommend([10], DATASET, k=3, filter_viewed=False),
        )

    def test_load_weights_unfitted_raises(self, tmp_path) -> None:
        m1 = SASRecModel(**TINY).fit(DATASET)
        path = tmp_path / "ckpt.pkl"
        m1.save_checkpoint(path)
        fresh = SASRecModel(**TINY)
        with pytest.raises(RuntimeError):
            fresh.load_weights_from_checkpoint(path)

    def test_save_checkpoint_unfitted_raises(self, tmp_path) -> None:
        with pytest.raises(RuntimeError):
            SASRecModel(**TINY).save_checkpoint(tmp_path / "x.pkl")


class TestNegativeSampler:
    def test_range_excludes_extra_tokens(self) -> None:
        """Negatives are drawn from [n_extra_tokens, n_items): PAD (and MASK)
        ids never appear (reference negative_sampler.py:49-73)."""
        sampler = CatalogUniformSampler(n_negatives=64)
        batch = {"x": np.ones((8, 6), dtype=np.int64)}
        rng = np.random.default_rng(0)
        negs = sampler.get_negatives(batch, lowest_id=2, highest_id=50, rng=rng)
        assert negs.shape == (8, 6, 64)
        assert negs.min() >= 2
        assert negs.max() < 50

    def test_session_len_limit(self) -> None:
        sampler = CatalogUniformSampler(n_negatives=3)
        batch = {"x": np.ones((4, 6), dtype=np.int64)}
        negs = sampler.get_negatives(batch, 1, 10, np.random.default_rng(0), session_len_limit=2)
        assert negs.shape == (4, 2, 3)


class TestValidationMask:
    def test_custom_val_mask_func_changes_history(self) -> None:
        """get_val_mask_func holds out masked interactions from training
        (reference data_preparator.py:229-284)."""
        model = SASRecModel(get_val_mask_func=leave_one_out_mask, **TINY).fit(DATASET)
        assert len(model.training_module.val_loss_history) == TINY["epochs"]
        model_noval = SASRecModel(**TINY).fit(DATASET)
        assert model_noval.training_module.val_loss_history == []

    def test_val_interactions_excluded_from_train(self) -> None:
        df = pd.DataFrame(
            {
                Columns.User: [1] * 6,
                Columns.Item: [100, 101, 102, 103, 104, 105],
                Columns.Weight: 1.0,
                Columns.Datetime: pd.date_range("2024-01-01", periods=6, freq="D"),
            }
        )
        ds = Dataset.construct(df)
        model = SASRecModel(get_val_mask_func=leave_one_out_mask, **{**TINY, "session_max_len": 10}).fit(ds)
        prep = model.data_preparator
        train_items = {
            prep.item_id_map.external_ids[i] for i in set(prep.train_dataset.interactions.df[Columns.Item])
        }
        assert 105 not in train_items  # last interaction held out for validation


class TestBert4RecSpecifics:
    def test_mask_prob_one_trains(self) -> None:
        """mask_prob=1 masks every position; training must still converge to a
        usable model (all targets active)."""
        model = BERT4RecModel(mask_prob=1.0, **TINY).fit(DATASET)
        reco = model.recommend([10, 20], DATASET, k=3, filter_viewed=False)
        assert len(reco) == 6
        assert np.isfinite(reco[Columns.Score].values).all()

    def test_use_pos_emb_false(self) -> None:
        model = SASRecModel(use_pos_emb=False, **TINY).fit(DATASET)
        reco = model.recommend([10, 20], DATASET, k=3, filter_viewed=False)
        assert len(reco) > 0
        flat = [p for p in _param_names(model.training_module.params)]
        assert not any("pos" in name for name in flat)


def _param_names(tree, prefix="") -> list:
    names = []
    for key, val in tree.items():
        path = f"{prefix}/{key}"
        if isinstance(val, dict):
            names.extend(_param_names(val, path))
        else:
            names.append(path)
    return names


class TestDeviceNegatives:
    """Sampled losses draw uniform negatives inside the jit step by default
    (training.py negatives_on_device); host sampling remains for custom
    samplers or when explicitly disabled."""

    def test_default_skips_host_negatives(self) -> None:
        model = SASRecModel(loss="sampled_softmax", n_negatives=4, **TINY).fit(DATASET)
        assert model.training_module._use_device_negatives
        assert model.data_preparator.host_negatives is False
        reco = model.recommend([10, 20], DATASET, k=3, filter_viewed=False)
        assert np.isfinite(reco[Columns.Score].values).all()

    def test_disable_restores_host_sampling(self) -> None:
        model = SASRecModel(
            loss="sampled_softmax", n_negatives=4,
            training_module_kwargs={"negatives_on_device": False}, **TINY,
        ).fit(DATASET)
        assert not model.training_module._use_device_negatives
        assert model.data_preparator.host_negatives is True
        reco = model.recommend([10, 20], DATASET, k=3, filter_viewed=False)
        assert np.isfinite(reco[Columns.Score].values).all()

    def test_both_modes_deterministic_per_seed(self) -> None:
        for kwargs in ({}, {"training_module_kwargs": {"negatives_on_device": False}}):
            m1 = SASRecModel(loss="sampled_softmax", n_negatives=4, **TINY, **kwargs).fit(DATASET)
            m2 = SASRecModel(loss="sampled_softmax", n_negatives=4, **TINY, **kwargs).fit(DATASET)
            r1 = m1.recommend([10], DATASET, k=3, filter_viewed=False)
            r2 = m2.recommend([10], DATASET, k=3, filter_viewed=False)
            np.testing.assert_allclose(r1[Columns.Score].values, r2[Columns.Score].values, atol=1e-6)


class TestRecommendBatchAutoScale:
    def test_production_shape_keeps_large_batch(self) -> None:
        # KION-like config: activation budget dominates -> batch stays big
        model = SASRecModel(n_factors=128, n_heads=4, session_max_len=100)
        assert model._effective_recommend_batch_size() == 4096

    def test_long_sessions_shrink_the_batch(self) -> None:
        # at long L the encode pass's O(H * L^2) attention scores dominate;
        # without the score term the auto batch OOMed hosts at L=512
        model = SASRecModel(n_factors=32, n_heads=2, session_max_len=512)
        assert model._effective_recommend_batch_size() <= 512
        long_model = SASRecModel(n_factors=128, n_heads=4, session_max_len=1024)
        assert long_model._effective_recommend_batch_size() <= 128

    def test_explicit_value_wins(self) -> None:
        model = SASRecModel(session_max_len=1024, recommend_batch_size=2048)
        assert model._effective_recommend_batch_size() == 2048


class TestSharedNegatives:
    def test_batch_sharing_trains_and_recommends(self) -> None:
        model = SASRecModel(
            loss="sampled_softmax", n_negatives=4,
            training_module_kwargs={"negatives_sharing": "batch"}, **TINY,
        ).fit(DATASET)
        assert np.isfinite(model.training_module.train_loss_history).all()
        reco = model.recommend([10, 20], DATASET, k=3, filter_viewed=False)
        assert np.isfinite(reco[Columns.Score].values).all()

    @pytest.mark.parametrize("loss", ["BCE", "gBCE"])
    def test_batch_sharing_other_sampled_losses(self, loss) -> None:
        model = SASRecModel(
            loss=loss, n_negatives=4,
            training_module_kwargs={"negatives_sharing": "batch"}, **TINY,
        ).fit(DATASET)
        assert np.isfinite(model.training_module.train_loss_history).all()

    def test_batch_sharing_deterministic(self) -> None:
        kwargs = dict(loss="sampled_softmax", n_negatives=4,
                      training_module_kwargs={"negatives_sharing": "batch"}, **TINY)
        m1 = SASRecModel(**kwargs).fit(DATASET)
        m2 = SASRecModel(**kwargs).fit(DATASET)
        np.testing.assert_allclose(
            m1.training_module.train_loss_history, m2.training_module.train_loss_history, rtol=1e-6
        )

    def test_batch_sharing_requires_device_negatives(self) -> None:
        # the training module is constructed at fit time
        with pytest.raises(ValueError):
            SASRecModel(
                loss="sampled_softmax", n_negatives=4,
                training_module_kwargs={"negatives_sharing": "batch", "negatives_on_device": False},
                **TINY,
            ).fit(DATASET)

    def test_invalid_sharing_value_raises(self) -> None:
        with pytest.raises(ValueError):
            SASRecModel(
                loss="sampled_softmax", n_negatives=4,
                training_module_kwargs={"negatives_sharing": "nope"}, **TINY,
            ).fit(DATASET)

    def test_batch_sharing_works_for_hstu(self) -> None:
        from rectools_tpu.models.nn.transformers import HSTUModel

        model = HSTUModel(
            n_blocks=1, n_heads=2, n_factors=32, session_max_len=8, epochs=1,
            batch_size=32, loss="sampled_softmax", n_negatives=4,
            training_module_kwargs={"negatives_sharing": "batch"}, seed=0,
        ).fit(DATASET)
        assert np.isfinite(model.training_module.train_loss_history).all()

    def test_sharing_survives_save_load(self, tmp_path) -> None:
        model = SASRecModel(
            loss="sampled_softmax", n_negatives=4,
            training_module_kwargs={"negatives_sharing": "batch"}, **TINY,
        ).fit(DATASET)
        path = str(tmp_path / "m.pkl")
        model.save(path)
        loaded = SASRecModel.load(path)
        assert loaded.training_module.negatives_sharing == "batch"
        reco = loaded.recommend([10, 20], DATASET, k=3, filter_viewed=False)
        assert np.isfinite(reco[Columns.Score].values).all()
