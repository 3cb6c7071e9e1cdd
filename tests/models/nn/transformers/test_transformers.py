"""Transformer stack tests: preparators, losses, model contract
(pattern of reference tests/models/nn/transformers/test_sasrec.py etc.)."""

import numpy as np
import pandas as pd
import pytest

from rectools_tpu import Columns
from rectools_tpu.dataset import Dataset
from rectools_tpu.models.nn.transformers import (
    BERT4RecModel,
    HSTUModel,
    LiGRLayers,
    SASRecModel,
    SequenceDataset,
    leave_one_out_mask,
)
from rectools_tpu.models.nn.transformers.data_preparator import scatter_left_padded
from rectools_tpu.models.nn.transformers.losses import bce_loss, sampled_softmax_loss, softmax_loss

from ...data import DATASET, INTERACTIONS
from ...utils import (
    assert_default_config_and_default_model_params_are_the_same,
    assert_dumps_loads_do_not_change_model,
    assert_get_config_and_from_config_compatibility,
    assert_reco_equal,
)

TINY = dict(n_blocks=1, n_heads=2, n_factors=8, session_max_len=4, epochs=1, batch_size=4, seed=32, dropout_rate=0.0)


# ------------------------------------------------------------- host pipeline


class TestSequenceDataset:
    def test_grouping_matches_pandas_reference(self) -> None:
        df = DATASET.interactions.df
        sd = SequenceDataset.from_interactions(df)
        # pandas reference implementation (reference data_preparator.py:87-99)
        sessions = (
            df.sort_values(Columns.Datetime, kind="stable")
            .groupby(Columns.User, sort=False)[[Columns.Item, Columns.Weight]]
            .agg(list)
        )
        expected_items = sessions[Columns.Item].to_list()
        for i in range(len(sd)):
            np.testing.assert_array_equal(
                sd.items[sd.indptr[i] : sd.indptr[i + 1]], np.asarray(expected_items[i])
            )

    def test_sort_users(self) -> None:
        df = DATASET.interactions.df
        sd = SequenceDataset.from_interactions(df, sort_users=True)
        # sessions ordered by ascending internal user id
        assert len(sd) == df[Columns.User].nunique()


class TestScatterLeftPadded:
    def test_basic(self) -> None:
        values = np.array([1, 2, 3, 4, 5])
        out = scatter_left_padded(values, np.array([0, 3]), np.array([3, 2]), 4, np.int64)
        np.testing.assert_array_equal(out, [[0, 1, 2, 3], [0, 0, 4, 5]])

    def test_right_truncation(self) -> None:
        values = np.arange(10)
        out = scatter_left_padded(values, np.array([0]), np.array([10]), 4, np.int64)
        np.testing.assert_array_equal(out, [[6, 7, 8, 9]])


class TestSASRecDataPreparator:
    def test_train_collate_shifted_sequence(self) -> None:
        model = SASRecModel(**TINY)
        model.data_preparator.process_dataset_train(DATASET)
        sd = SequenceDataset.from_interactions(model.data_preparator.train_dataset.interactions.df)
        rng = np.random.default_rng(0)
        batch = model.data_preparator._collate_fn_train(sd, np.arange(len(sd)), rng)
        x, y = batch["x"], batch["yw"]
        assert x.shape == (4, 4)
        # For every session: x shifted left of y by construction
        items = sd.items
        for i in range(len(sd)):
            ses = items[sd.indptr[i] : sd.indptr[i + 1]]
            m = len(ses) - 1
            np.testing.assert_array_equal(batch["x"][i, 4 - m :], ses[:-1][-4:])
            np.testing.assert_array_equal(batch["y"][i, 4 - m :], ses[1:][-4:])

    def test_recommend_collate(self) -> None:
        model = SASRecModel(**TINY)
        model.data_preparator.process_dataset_train(DATASET)
        sd = SequenceDataset.from_interactions(model.data_preparator.train_dataset.interactions.df)
        batch = model.data_preparator._collate_fn_recommend(sd, np.arange(len(sd)), None)
        for i in range(len(sd)):
            ses = sd.items[sd.indptr[i] : sd.indptr[i + 1]]
            n = min(len(ses), 4)
            np.testing.assert_array_equal(batch["x"][i, 4 - n :], ses[-n:])


class TestBERT4RecDataPreparator:
    def test_recommend_collate_appends_mask(self) -> None:
        model = BERT4RecModel(**TINY)
        model.data_preparator.process_dataset_train(DATASET)
        mask_id = model.data_preparator.extra_token_ids["MASK"]
        assert mask_id == 1
        sd = SequenceDataset.from_interactions(model.data_preparator.train_dataset.interactions.df)
        batch = model.data_preparator._collate_fn_recommend(sd, np.arange(len(sd)), None)
        assert (batch["x"][:, -1] == mask_id).all()

    def test_mlm_masking_stats(self) -> None:
        model = BERT4RecModel(mask_prob=0.5, **TINY)
        model.data_preparator.process_dataset_train(DATASET)
        rng = np.random.default_rng(0)
        tokens = np.full(10000, 5, dtype=np.int64)
        x, y = model.data_preparator._mask_tokens(tokens, rng)
        masked = y != 0
        assert abs(masked.mean() - 0.5) < 0.05
        # ~80% of masked -> MASK token
        assert abs((x[masked] == 1).mean() - 0.8) < 0.05
        # non-masked keep original token and zero target
        assert (x[~masked] == 5).all()
        assert (y[~masked] == 0).all()


# -------------------------------------------------------------------- losses


class TestLosses:
    def test_softmax_loss_ignores_pad(self) -> None:
        logits = np.random.default_rng(0).normal(size=(2, 3, 5)).astype(np.float32)
        y = np.array([[1, 2, 0], [0, 0, 3]])
        w = np.ones((2, 3), dtype=np.float32)
        got = float(softmax_loss(logits, y, w))
        # manual CE over non-pad targets
        logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
        ces = [-logp[0, 0, 1], -logp[0, 1, 2], -logp[1, 2, 3]]
        assert got == pytest.approx(np.mean(ces), rel=1e-3)

    def test_softmax_loss_weights(self) -> None:
        logits = np.random.default_rng(0).normal(size=(1, 2, 4)).astype(np.float32)
        y = np.array([[1, 2]])
        w = np.array([[2.0, 0.0]], dtype=np.float32)
        got = float(softmax_loss(logits, y, w))
        logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
        # only first position contributes; weighted 2x, denominator 1
        assert got == pytest.approx(-2 * logp[0, 0, 1], rel=1e-3)

    def test_bce_loss(self) -> None:
        logits = np.array([[[2.0, -1.0]]], dtype=np.float32)
        y = np.array([[5]])
        w = np.ones((1, 1), dtype=np.float32)
        got = float(bce_loss(logits, y, w))

        def sigm(v):
            return 1 / (1 + np.exp(-v))

        expected = np.mean([-np.log(sigm(2.0)), -np.log(1 - sigm(-1.0))])
        assert got == pytest.approx(expected, rel=1e-3)

    def test_sampled_softmax_swaps_positive(self) -> None:
        logits = np.array([[[3.0, 1.0, 0.0]]], dtype=np.float32)
        y = np.array([[7]])
        w = np.ones((1, 1), dtype=np.float32)
        got = float(sampled_softmax_loss(logits, y, w))
        swapped = np.array([1.0, 3.0, 0.0])
        logp = swapped - np.log(np.exp(swapped).sum())
        assert got == pytest.approx(-logp[1], rel=1e-3)


# ------------------------------------------------------------ model contract


class TestTransformerModels:
    @pytest.mark.parametrize("model_cls", [SASRecModel, BERT4RecModel])
    def test_fit_recommend_contract(self, model_cls) -> None:
        model = model_cls(**TINY)
        model.fit(DATASET)
        users = [10, 20, 30]
        reco = model.recommend(users, DATASET, k=2, filter_viewed=True)
        assert list(reco.columns) == [Columns.User, Columns.Item, Columns.Score, Columns.Rank]
        assert set(reco[Columns.User]) <= set(users)
        # filter_viewed: no recommended item was seen
        seen = set(map(tuple, INTERACTIONS[[Columns.User, Columns.Item]].values))
        assert not any((u, i) in seen for u, i in reco[[Columns.User, Columns.Item]].values)
        # per-user rank 1..n
        for _, grp in reco.groupby(Columns.User):
            assert list(grp[Columns.Rank]) == list(range(1, len(grp) + 1))

    def test_whitelist(self) -> None:
        model = SASRecModel(**TINY)
        model.fit(DATASET)
        reco = model.recommend([10, 20], DATASET, k=3, filter_viewed=False, items_to_recommend=[11, 14])
        assert set(reco[Columns.Item]) <= {11, 14}

    def test_i2i(self) -> None:
        model = SASRecModel(**TINY)
        model.fit(DATASET)
        reco = model.recommend_to_items([11, 12], DATASET, k=2)
        assert list(reco.columns) == [Columns.TargetItem, Columns.Item, Columns.Score, Columns.Rank]
        assert not (reco[Columns.TargetItem] == reco[Columns.Item]).any()

    def test_second_fit_refits(self) -> None:
        model_1 = SASRecModel(**TINY)
        model_1.fit(DATASET)
        model_2 = SASRecModel(**TINY)
        model_2.fit(DATASET)
        model_2.fit(DATASET)
        users = DATASET.user_id_map.external_ids
        assert_reco_equal(
            model_1.recommend(users, DATASET, 2, filter_viewed=False),
            model_2.recommend(users, DATASET, 2, filter_viewed=False),
        )

    @pytest.mark.parametrize("model_cls", [SASRecModel, BERT4RecModel])
    def test_dumps_loads(self, model_cls) -> None:
        model = model_cls(**TINY)
        model.fit(DATASET)
        assert_dumps_loads_do_not_change_model(model, DATASET)

    @pytest.mark.parametrize("model_cls", [SASRecModel, BERT4RecModel, HSTUModel])
    def test_config_round_trip(self, model_cls) -> None:
        model = model_cls(**TINY)
        config = model.get_config(simple_types=True)
        model_2 = model_cls.from_config(config)
        assert model_2.get_config(simple_types=True) == config

    @pytest.mark.parametrize("model_cls", [SASRecModel, BERT4RecModel, HSTUModel])
    def test_default_config(self, model_cls) -> None:
        model = model_cls()
        assert_default_config_and_default_model_params_are_the_same(model, {})

    def test_get_config_and_from_config_compatibility(self) -> None:
        assert_get_config_and_from_config_compatibility(SASRecModel, DATASET, dict(TINY))

    @pytest.mark.parametrize("loss", ["BCE", "gBCE", "sampled_softmax"])
    def test_sampled_losses(self, loss) -> None:
        model = SASRecModel(loss=loss, n_negatives=2, **TINY)
        model.fit(DATASET)
        assert len(model.training_module.train_loss_history) == 1
        assert np.isfinite(model.training_module.train_loss_history[0])

    def test_esasrec(self) -> None:
        model = SASRecModel(transformer_layers_type=LiGRLayers, loss="sampled_softmax", n_negatives=2, **TINY)
        model.fit(DATASET)
        reco = model.recommend([10], DATASET, k=2, filter_viewed=False)
        assert len(reco) == 2

    def test_validation_loss_tracked(self) -> None:
        model = SASRecModel(get_val_mask_func=leave_one_out_mask, **TINY)
        model.fit(DATASET)
        assert len(model.training_module.val_loss_history) == 1

    def test_fit_partial_continues(self) -> None:
        model = SASRecModel(**TINY)
        model.fit(DATASET)
        assert model.training_module.epochs_completed == 1
        model.fit_partial(DATASET, max_epochs=2)
        assert model.training_module.epochs_completed == 3

    def test_unfitted_raises(self) -> None:
        from rectools_tpu.exceptions import NotFittedError

        model = SASRecModel(**TINY)
        with pytest.raises(NotFittedError):
            model.recommend([10], DATASET, k=2, filter_viewed=False)

    @pytest.mark.parametrize("loss", ["softmax", "sampled_softmax"])
    def test_remat_matches_plain_training(self, loss) -> None:
        """remat=True recomputes activations in the backward; the training
        trajectory must be numerically identical to the default path."""
        kwargs = {**TINY, "epochs": 2, "dropout_rate": 0.2, "loss": loss}
        if loss == "sampled_softmax":
            kwargs["n_negatives"] = 2
        plain = SASRecModel(**kwargs)
        plain.fit(DATASET)
        remat = SASRecModel(training_module_kwargs={"remat": True}, **kwargs)
        remat.fit(DATASET)
        np.testing.assert_allclose(
            plain.training_module.train_loss_history,
            remat.training_module.train_loss_history,
            rtol=1e-6,
        )
        users = DATASET.user_id_map.external_ids
        assert_reco_equal(
            plain.recommend(users, DATASET, 2, filter_viewed=False),
            remat.recommend(users, DATASET, 2, filter_viewed=False),
        )

    def test_remat_with_fused_softmax_chunking(self) -> None:
        kwargs = {**TINY, "dropout_rate": 0.2}
        plain = SASRecModel(training_module_kwargs={"fused_softmax_chunk": 4}, **kwargs)
        plain.fit(DATASET)
        remat = SASRecModel(training_module_kwargs={"fused_softmax_chunk": 4, "remat": True}, **kwargs)
        remat.fit(DATASET)
        np.testing.assert_allclose(
            plain.training_module.train_loss_history,
            remat.training_module.train_loss_history,
            rtol=1e-6,
        )


class TestHSTU:
    def test_requires_context(self) -> None:
        model = HSTUModel(**TINY)
        model.fit(DATASET)
        with pytest.raises(ValueError, match="context"):
            model.recommend([10], DATASET, k=2, filter_viewed=False)

    def test_recommend_with_context(self) -> None:
        model = HSTUModel(**TINY)
        model.fit(DATASET)
        context = pd.DataFrame(
            {Columns.User: [10, 20], Columns.Datetime: pd.to_datetime(["2021-12-01", "2021-12-01"])}
        )
        reco = model.recommend([10, 20], DATASET, k=2, filter_viewed=True, context=context)
        assert len(reco) > 0

    def test_no_time_attention_no_context_needed(self) -> None:
        model = HSTUModel(relative_time_attention=False, **TINY)
        model.fit(DATASET)
        reco = model.recommend([10], DATASET, k=2, filter_viewed=False)
        assert len(reco) == 2


class TestLeaveOneOutMask:
    def test_marks_last_interaction(self) -> None:
        mask = leave_one_out_mask(INTERACTIONS)
        masked = INTERACTIONS[mask]
        assert len(masked) == INTERACTIONS[Columns.User].nunique()
        # each masked row is the max datetime for its user
        for _, row in masked.iterrows():
            user_rows = INTERACTIONS[INTERACTIONS[Columns.User] == row[Columns.User]]
            assert row[Columns.Datetime] == user_rows[Columns.Datetime].max()


class TestFusedSoftmaxLoss:
    """Chunked logsumexp softmax (losses.fused_softmax_loss) must equal the
    materialized-logits loss in value and gradients."""

    def test_matches_full_logits_with_grads(self) -> None:
        import jax
        import jax.numpy as jnp

        from rectools_tpu.models.nn.transformers.losses import fused_softmax_loss

        rng = np.random.default_rng(0)
        b, l, d, n = 4, 6, 8, 37
        s = jnp.asarray(rng.normal(size=(b, l, d)).astype(np.float32))
        items = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
        y = jnp.asarray(rng.integers(0, n, size=(b, l)))
        w = jnp.asarray((rng.random((b, l)) > 0.2).astype(np.float32))

        def full(s, items):
            return softmax_loss(jnp.einsum("bld,nd->bln", s, items), y, w)

        def fused(s, items):
            return fused_softmax_loss(s, items, y, w, chunk=16)

        v1, g1 = jax.value_and_grad(full, argnums=(0, 1))(s, items)
        v2, g2 = jax.value_and_grad(fused, argnums=(0, 1))(s, items)
        np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
        for a, b_ in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-6)

    @pytest.mark.parametrize("distance", ["dot", "cosine"])
    def test_model_training_matches_default(self, distance) -> None:
        kwargs = dict(similarity_module_kwargs={"distance": distance}) if distance == "cosine" else {}
        m1 = SASRecModel(
            loss="softmax", training_module_kwargs={"fused_softmax_chunk": None}, **kwargs, **TINY
        ).fit(DATASET)
        m2 = SASRecModel(
            loss="softmax", training_module_kwargs={"fused_softmax_chunk": 4}, **kwargs, **TINY
        ).fit(DATASET)
        assert m2.training_module._use_fused_softmax
        r1 = m1.recommend([10, 20], DATASET, k=3, filter_viewed=False)
        r2 = m2.recommend([10, 20], DATASET, k=3, filter_viewed=False)
        np.testing.assert_allclose(
            r1[Columns.Score].values, r2[Columns.Score].values, rtol=1e-3, atol=1e-4
        )

    def test_single_chunk_catalog_falls_back(self) -> None:
        # default chunk 2048 >> tiny catalog -> fused path disabled
        model = SASRecModel(loss="softmax", **TINY).fit(DATASET)
        assert not model.training_module._use_fused_softmax
