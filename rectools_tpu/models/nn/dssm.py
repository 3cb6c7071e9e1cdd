"""DSSM two-tower model on TPU.

Behavioral parity with reference rectools/models/nn/dssm.py:54-411: ItemNet =
residual MLP over item features; UserNet = feature tower + interactions tower
concatenated; triplet margin loss (euclidean) on sampled positives vs uniform
negatives; inference materializes user/item vectors then EUCLIDEAN VectorModel
ranking; warm targets supported through features. The pytorch-lightning Trainer
becomes one jit-compiled Adam step over dense minibatches.
"""

import typing as tp
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax
import typing_extensions as tpe
from flax import linen as nn

from ...dataset import Dataset
from ...dataset.dssm_datasets import DSSMItemDataset, DSSMTrainDataset, DSSMUserDataset
from ...exceptions import NotFittedError
from ..base import ModelConfig
from ..rank import Distance
from ..vector import Factors, VectorModel


class ItemTower(nn.Module):
    """Residual MLP over item features (reference dssm.py:54-73)."""

    n_factors: int

    @nn.compact
    def __call__(self, item_features: jnp.ndarray) -> jnp.ndarray:
        emb = nn.elu(nn.Dense(self.n_factors, use_bias=False, name="embedding_layer")(item_features))
        features = nn.elu(nn.Dense(self.n_factors, use_bias=False, name="dense_layer")(emb))
        return nn.Dense(self.n_factors, use_bias=False, name="output_layer")(emb + features)


class UserTower(nn.Module):
    """Feature tower + interactions tower, concatenated (reference dssm.py:76-101)."""

    n_factors: int

    @nn.compact
    def __call__(self, user_features: jnp.ndarray, interactions: jnp.ndarray) -> jnp.ndarray:
        features_emb = nn.elu(nn.Dense(self.n_factors, use_bias=False, name="embedding_features_layer")(user_features))
        interactions_emb = nn.elu(
            nn.Dense(self.n_factors, use_bias=False, name="embedding_interactions_layer")(interactions)
        )
        features_dense = nn.elu(nn.Dense(self.n_factors, use_bias=False, name="features_dense_layer")(features_emb))
        concatenated = jnp.concatenate((features_emb + features_dense, interactions_emb), axis=1)
        return nn.Dense(self.n_factors, use_bias=False, name="output_layer")(concatenated)


class DSSMTowers(nn.Module):
    """Both towers under one parameter tree."""

    n_factors: int

    def setup(self) -> None:
        self.user_net = UserTower(self.n_factors)
        self.item_net = ItemTower(self.n_factors)

    def __call__(
        self, user_features: jnp.ndarray, interactions: jnp.ndarray, pos: jnp.ndarray, neg: jnp.ndarray
    ) -> tp.Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        return self.user_net(user_features, interactions), self.item_net(pos), self.item_net(neg)

    def encode_users(self, user_features: jnp.ndarray, interactions: jnp.ndarray) -> jnp.ndarray:
        return self.user_net(user_features, interactions)

    def encode_items(self, item_features: jnp.ndarray) -> jnp.ndarray:
        return self.item_net(item_features)


def triplet_margin_loss(
    anchor: jnp.ndarray, positive: jnp.ndarray, negative: jnp.ndarray, margin: float, mask: jnp.ndarray
) -> jnp.ndarray:
    """Euclidean triplet margin loss, masked mean (torch F.triplet_margin_loss)."""
    eps = 1e-6
    d_pos = jnp.sqrt(jnp.sum((anchor - positive) ** 2, axis=1) + eps)
    d_neg = jnp.sqrt(jnp.sum((anchor - negative) ** 2, axis=1) + eps)
    per = jnp.maximum(d_pos - d_neg + margin, 0.0)
    return jnp.sum(per * mask) / jnp.maximum(jnp.sum(mask), 1.0)


class DSSMModelConfig(ModelConfig):
    """Config for `DSSMModel`."""

    n_factors: int = 128
    max_epochs: int = 5
    batch_size: int = 128
    lr: float = 0.01
    triplet_loss_margin: float = 0.4
    weight_decay: float = 1e-6
    random_state: int = 0


class DSSMModel(VectorModel[DSSMModelConfig]):
    """Two-tower DSSM recommender (triplet loss, euclidean ranking)."""

    recommends_for_warm = True
    recommends_for_cold = False

    u2i_dist = Distance.EUCLIDEAN
    i2i_dist = Distance.EUCLIDEAN

    config_class = DSSMModelConfig

    def __init__(
        self,
        n_factors: int = 128,
        max_epochs: int = 5,
        batch_size: int = 128,
        lr: float = 0.01,
        triplet_loss_margin: float = 0.4,
        weight_decay: float = 1e-6,
        random_state: int = 0,
        verbose: int = 0,
        train_dataset_type: tp.Type[DSSMTrainDataset] = DSSMTrainDataset,
        user_dataset_type: tp.Type[DSSMUserDataset] = DSSMUserDataset,
        item_dataset_type: tp.Type[DSSMItemDataset] = DSSMItemDataset,
    ) -> None:
        super().__init__(verbose=verbose)
        self.n_factors = n_factors
        self.max_epochs = max_epochs
        self.batch_size = batch_size
        self.lr = lr
        self.triplet_loss_margin = triplet_loss_margin
        self.weight_decay = weight_decay
        self.random_state = random_state
        self.train_dataset_type = train_dataset_type
        self.user_dataset_type = user_dataset_type
        self.item_dataset_type = item_dataset_type
        self.params: tp.Optional[tp.Any] = None
        self._towers: tp.Optional[DSSMTowers] = None

    def _get_config(self) -> DSSMModelConfig:
        return DSSMModelConfig(
            cls=self.__class__,
            n_factors=self.n_factors,
            max_epochs=self.max_epochs,
            batch_size=self.batch_size,
            lr=self.lr,
            triplet_loss_margin=self.triplet_loss_margin,
            weight_decay=self.weight_decay,
            random_state=self.random_state,
            verbose=self.verbose,
        )

    @classmethod
    def _from_config(cls, config: DSSMModelConfig) -> tpe.Self:
        params = config.model_dump()
        params.pop("cls")
        return cls(**params)

    # ----------------------------------------------------------------------- fit

    def _fit(self, dataset: Dataset, dataset_valid: tp.Optional[Dataset] = None) -> None:
        if dataset.user_features is None or dataset.item_features is None:
            raise ValueError("DSSM model requires user and item features to be present in the dataset.")

        train_data = self.train_dataset_type.from_dataset(dataset)
        towers = DSSMTowers(n_factors=self.n_factors)
        self._towers = towers
        # per-epoch mean triplet loss, the convergence evidence the h2h
        # benchmark records (mirrors TransformerTrainingModule's history)
        self.train_loss_history: tp.List[float] = []

        rng_np = np.random.default_rng(self.random_state)
        sample = train_data.make_batch(np.arange(min(2, len(train_data))), rng_np)
        init_rng = jax.random.PRNGKey(self.random_state)
        params = towers.init(init_rng, *(jnp.asarray(x) for x in sample))["params"]

        # torch-Adam style L2: decay added to gradients before the Adam moments
        tx = optax.chain(optax.add_decayed_weights(self.weight_decay), optax.adam(self.lr))
        opt_state = tx.init(params)
        margin = self.triplet_loss_margin

        @partial(jax.jit, donate_argnums=(0, 1))
        def train_step(params, opt_state, user_features, interactions, pos, neg, mask):
            def loss_of(p):
                anchor, positive, negative = towers.apply({"params": p}, user_features, interactions, pos, neg)
                return triplet_margin_loss(anchor, positive, negative, margin, mask)

            loss, grads = jax.value_and_grad(loss_of)(params)
            updates, opt_state2 = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state2, loss

        n = len(train_data)
        bs = min(self.batch_size, max(n, 1))
        for epoch in range(self.max_epochs):
            order = rng_np.permutation(n)
            epoch_losses = []
            for start in range(0, n, bs):
                rows = order[start : start + bs]
                b = len(rows)
                if b < bs:
                    rows = np.concatenate([rows, np.zeros(bs - b, dtype=rows.dtype)])
                uf, inter, pos, neg = train_data.make_batch(rows, rng_np)
                mask = np.zeros(bs, dtype=np.float32)
                mask[:b] = 1.0
                params, opt_state, loss = train_step(
                    params, opt_state, jnp.asarray(uf), jnp.asarray(inter), jnp.asarray(pos), jnp.asarray(neg),
                    jnp.asarray(mask),
                )
                epoch_losses.append(loss)
            if epoch_losses:
                self.train_loss_history.append(float(jnp.mean(jnp.stack(epoch_losses))))
                if self.verbose > 0:
                    print(f"epoch {epoch + 1}: loss={self.train_loss_history[-1]:.5f}")

        self.params = jax.tree.map(np.asarray, params)

    # --------------------------------------------------------------------factors

    def _towers_module(self) -> DSSMTowers:
        if self._towers is None:
            self._towers = DSSMTowers(n_factors=self.n_factors)
        return self._towers

    def get_vectors(self, dataset: Dataset) -> tp.Tuple[np.ndarray, np.ndarray]:
        """Materialized user and item tower outputs (reference dssm.py:372-378)."""
        if not self.is_fitted:
            raise NotFittedError(self.__class__.__name__)
        return self._get_users_factors(dataset).embeddings, self._get_items_factors(dataset).embeddings

    def _get_users_factors(self, dataset: Dataset) -> Factors:
        towers = self._towers_module()
        data = self.user_dataset_type.from_dataset(dataset)
        # dispatch every batch before the first device->host fetch so batch
        # round trips overlap (same pattern as ops/topk.py serving)
        pending = []
        for start in range(0, len(data), self.batch_size):
            rows = np.arange(start, min(start + self.batch_size, len(data)))
            uf, inter = data.dense_rows(rows)
            pending.append(
                towers.apply(
                    {"params": self.params}, jnp.asarray(uf), jnp.asarray(inter), method=DSSMTowers.encode_users
                )
            )
        return Factors(np.concatenate([np.asarray(v) for v in pending], axis=0))

    def _get_items_factors(self, dataset: Dataset) -> Factors:
        towers = self._towers_module()
        data = self.item_dataset_type.from_dataset(dataset)
        pending = []
        for start in range(0, len(data), self.batch_size):
            rows = np.arange(start, min(start + self.batch_size, len(data)))
            feats = data.dense_rows(rows)
            pending.append(
                towers.apply({"params": self.params}, jnp.asarray(feats), method=DSSMTowers.encode_items)
            )
        return Factors(np.concatenate([np.asarray(v) for v in pending], axis=0))

    # ------------------------------------------------------------------ warm

    def _recommend_u2i_warm(
        self,
        user_ids: np.ndarray,
        dataset: Dataset,
        k: int,
        sorted_item_ids_to_recommend: tp.Optional[np.ndarray],
    ) -> tp.Tuple[np.ndarray, np.ndarray, np.ndarray]:
        return self._recommend_u2i(user_ids, dataset, k, False, sorted_item_ids_to_recommend)

    def _recommend_i2i_warm(
        self,
        target_ids: np.ndarray,
        dataset: Dataset,
        k: int,
        sorted_item_ids_to_recommend: tp.Optional[np.ndarray],
    ) -> tp.Tuple[np.ndarray, np.ndarray, np.ndarray]:
        return self._recommend_i2i(target_ids, dataset, k, sorted_item_ids_to_recommend)

    def __getstate__(self) -> dict:
        state = self.__dict__.copy()
        state["_towers"] = None  # flax module rebuilt from config on load
        return state
