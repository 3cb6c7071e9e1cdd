"""Item-embedding towers (flax) — TPU-native equivalent of reference
rectools/models/nn/item_net.py:26-488.

Design: the primary operation on TPU is *full-catalog* embedding
(``get_all_embeddings`` is called every training step by the backbone), so
every block exposes ``embed_catalog()`` producing the dense (n_items, d)
table in one fused pass:

- ``IdEmbeddingsItemNet``: one embedding table; the PAD row (internal id 0)
  is forced to zero, which both zeroes its output and blocks its gradient —
  the functional equivalent of torch ``nn.Embedding(padding_idx=0)``
  (reference item_net.py:260-264).
- ``CatFeaturesItemNet``: torch ``EmbeddingBag(mode="sum")`` over item
  categorical one-hot indices (reference item_net.py:60-233) becomes a
  segment-sum scatter-add over the CSR (item, feature) pairs — one
  gather + scatter instead of ragged per-item bags.
- ``SumOfEmbeddingsConstructor`` sums block outputs
  (reference item_net.py:451-488).
"""

import typing as tp
import warnings

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .dropout import HashDropout

from ...dataset.dataset import Dataset, DatasetSchema, SparseFeaturesSchema
from ...dataset.features import SparseFeatures


class ItemNetBase(nn.Module):
    """Base class for item towers. Subclasses implement ``embed_catalog``."""

    def embed_catalog(self, deterministic: bool = True) -> jnp.ndarray:
        """Return (n_items, n_factors) embeddings for the full catalog."""
        raise NotImplementedError()

    @classmethod
    def from_dataset(cls, dataset: Dataset, *args: tp.Any, **kwargs: tp.Any) -> tp.Optional["ItemNetBase"]:
        """Construct the block from a Dataset (or return None if unsupported)."""
        raise NotImplementedError()

    @classmethod
    def from_dataset_schema(
        cls, dataset_schema: DatasetSchema, *args: tp.Any, **kwargs: tp.Any
    ) -> tp.Optional["ItemNetBase"]:
        """Construct from a schema (checkpoint restore; weights overwritten later)."""
        raise NotImplementedError()


class IdEmbeddingsItemNet(ItemNetBase):
    """Id-embedding block (reference item_net.py:236-331)."""

    n_items: int
    n_factors: int
    dropout_rate: float

    @nn.compact
    def embed_catalog(self, deterministic: bool = True) -> jnp.ndarray:
        emb = self.param(
            "ids_emb",
            nn.initializers.normal(stddev=1.0),
            (self.n_items, self.n_factors),
            jnp.float32,
        )
        # PAD row -> 0: zeroes the output and stops its gradient, mirroring
        # torch Embedding(padding_idx=0).
        return emb.at[0].set(0.0)

    @classmethod
    def from_dataset(
        cls, dataset: Dataset, n_factors: int, dropout_rate: float, **kwargs: tp.Any
    ) -> "IdEmbeddingsItemNet":
        return cls(n_items=dataset.item_id_map.size, n_factors=n_factors, dropout_rate=dropout_rate)

    @classmethod
    def from_dataset_schema(
        cls, dataset_schema: DatasetSchema, n_factors: int, dropout_rate: float, **kwargs: tp.Any
    ) -> "IdEmbeddingsItemNet":
        return cls(n_items=dataset_schema.items.n_hot, n_factors=n_factors, dropout_rate=dropout_rate)


class CatFeaturesItemNet(ItemNetBase):
    """Categorical-features block: segment-sum EmbeddingBag
    (reference item_net.py:60-233).

    ``feature_rows``/``feature_cols`` are the COO coordinates of the item
    categorical feature CSR: embedding of item i = sum of
    ``cat_emb[feature_cols[j]]`` over j with ``feature_rows[j] == i``.
    """

    n_items: int
    n_cat_feature_values: int
    n_factors: int
    dropout_rate: float
    feature_rows: np.ndarray  # (nnz,) int32 item internal ids
    feature_cols: np.ndarray  # (nnz,) int32 feature-value ids

    @nn.compact
    def embed_catalog(self, deterministic: bool = True) -> jnp.ndarray:
        cat_emb = self.param(
            "cat_emb",
            nn.initializers.normal(stddev=1.0),
            (self.n_cat_feature_values, self.n_factors),
            jnp.float32,
        )
        rows = jnp.asarray(self.feature_rows)
        cols = jnp.asarray(self.feature_cols)
        gathered = cat_emb[cols]  # (nnz, d)
        out = jnp.zeros((self.n_items, self.n_factors), dtype=cat_emb.dtype).at[rows].add(gathered)
        out = HashDropout(rate=self.dropout_rate, deterministic=deterministic)(out)
        return out

    @staticmethod
    def _warn_for_unsupported_dataset_schema(dataset_schema: DatasetSchema) -> None:
        if dataset_schema.items.features is None:
            warnings.warn("Ignoring `CatFeaturesItemNet` block because dataset doesn't contain item features.")
        elif dataset_schema.items.features.kind == "dense":
            warnings.warn(
                "Ignoring `CatFeaturesItemNet` block because dataset item features are dense and "
                "one-hot-encoded categorical features were not created when constructing dataset."
            )
        elif len(dataset_schema.items.features.cat_feature_indices) == 0:
            warnings.warn(
                "Ignoring `CatFeaturesItemNet` block because dataset item features do not contain "
                "categorical features."
            )

    @classmethod
    def from_dataset(
        cls, dataset: Dataset, n_factors: int, dropout_rate: float, **kwargs: tp.Any
    ) -> tp.Optional["CatFeaturesItemNet"]:
        dataset_schema = DatasetSchema.model_validate(dataset.get_schema())
        cls._warn_for_unsupported_dataset_schema(dataset_schema)
        if isinstance(dataset.item_features, SparseFeatures):
            item_cat_features = dataset.item_features.get_cat_features()
            if item_cat_features.values.size == 0:
                return None
            csr = item_cat_features.values.tocsr()
            nnz_per_row = np.diff(csr.indptr)
            rows = np.repeat(np.arange(csr.shape[0], dtype=np.int32), nnz_per_row)
            return cls(
                n_items=csr.shape[0],
                n_cat_feature_values=len(item_cat_features.names),
                n_factors=n_factors,
                dropout_rate=dropout_rate,
                feature_rows=rows,
                feature_cols=csr.indices.astype(np.int32),
            )
        return None

    @classmethod
    def from_dataset_schema(
        cls, dataset_schema: DatasetSchema, n_factors: int, dropout_rate: float, **kwargs: tp.Any
    ) -> tp.Optional["CatFeaturesItemNet"]:
        cls._warn_for_unsupported_dataset_schema(dataset_schema)
        features_schema = dataset_schema.items.features
        if isinstance(features_schema, SparseFeaturesSchema) and len(features_schema.cat_feature_indices) > 0:
            # Placeholder coordinates; real buffers restored from checkpoint state
            # (reference item_net.py:193-228 does the same with random buffers).
            nnz = features_schema.cat_n_stored_values
            return cls(
                n_items=dataset_schema.items.n_hot,
                n_cat_feature_values=len(features_schema.cat_feature_indices),
                n_factors=n_factors,
                dropout_rate=dropout_rate,
                feature_rows=np.zeros(nnz, dtype=np.int32),
                feature_cols=np.zeros(nnz, dtype=np.int32),
            )
        return None


class ItemNetConstructorBase(ItemNetBase):
    """Aggregates item-net blocks (reference item_net.py:334-451)."""

    n_items: int
    item_net_blocks: tp.Sequence[ItemNetBase]

    @classmethod
    def from_dataset(
        cls,
        dataset: Dataset,
        n_factors: int,
        dropout_rate: float,
        item_net_block_types: tp.Sequence[tp.Type[ItemNetBase]],
        **kwargs: tp.Any,
    ) -> "ItemNetConstructorBase":
        item_net_blocks: tp.List[ItemNetBase] = []
        for block_type in item_net_block_types:
            block = block_type.from_dataset(dataset, n_factors, dropout_rate)
            if block is not None:
                item_net_blocks.append(block)
        return cls(n_items=dataset.item_id_map.size, item_net_blocks=tuple(item_net_blocks))

    @classmethod
    def from_dataset_schema(
        cls,
        dataset_schema: DatasetSchema,
        n_factors: int,
        dropout_rate: float,
        item_net_block_types: tp.Sequence[tp.Type[ItemNetBase]],
        **kwargs: tp.Any,
    ) -> "ItemNetConstructorBase":
        item_net_blocks: tp.List[ItemNetBase] = []
        for block_type in item_net_block_types:
            block = block_type.from_dataset_schema(dataset_schema, n_factors, dropout_rate)
            if block is not None:
                item_net_blocks.append(block)
        return cls(n_items=dataset_schema.items.n_hot, item_net_blocks=tuple(item_net_blocks))


class SumOfEmbeddingsConstructor(ItemNetConstructorBase):
    """Sum of block outputs (reference item_net.py:451-488)."""

    @nn.compact
    def embed_catalog(self, deterministic: bool = True) -> jnp.ndarray:
        if len(self.item_net_blocks) == 0:
            raise ValueError("At least one type of net to calculate item embeddings should be provided.")
        out = None
        for block in self.item_net_blocks:
            emb = block.embed_catalog(deterministic=deterministic)
            out = emb if out is None else out + emb
        return out
