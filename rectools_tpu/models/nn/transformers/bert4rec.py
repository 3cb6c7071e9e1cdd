"""BERT4Rec: MLM objective + bidirectional attention.

TPU-native equivalent of reference rectools/models/nn/transformers/bert4rec.py:51-452.
The per-token 80/10/10 masking runs as one vectorized draw over the whole
batch's flattened tokens (the reference loops tokens per session).
"""

import typing as tp
from collections.abc import Hashable

import numpy as np

from ..item_net import (
    CatFeaturesItemNet,
    IdEmbeddingsItemNet,
    ItemNetBase,
    ItemNetConstructorBase,
    SumOfEmbeddingsConstructor,
)
from .backbone import TransformerBackbone, TransformerBackboneBase
from .base import (
    InitKwargs,
    TransformerDataPreparatorType,
    TransformerModelBase,
    TransformerModelConfig,
    CallbacksCallable,
    ValMaskCallable,
)
from .constants import MASKING_VALUE, PADDING_VALUE
from .data_preparator import Batch, SequenceDataset, TransformerDataPreparatorBase, scatter_left_padded
from .negative_sampler import CatalogUniformSampler, TransformerNegativeSamplerBase
from .net_blocks import (
    LearnableInversePositionalEncoding,
    PositionalEncodingBase,
    PreLNTransformerLayers,
    TransformerLayersBase,
)
from .similarity import DistanceSimilarityModule, SimilarityModuleBase
from .training import TransformerTrainingModule, TransformerTrainingModuleBase


class BERT4RecDataPreparator(TransformerDataPreparatorBase):
    """MLM collation (reference bert4rec.py:51-193)."""

    train_session_max_len_addition: int = 0
    item_extra_tokens: tp.Sequence[Hashable] = (PADDING_VALUE, MASKING_VALUE)

    def __init__(
        self,
        session_max_len: int,
        batch_size: int,
        dataloader_num_workers: int = 0,
        train_min_user_interactions: int = 2,
        negative_sampler: tp.Optional[TransformerNegativeSamplerBase] = None,
        n_negatives: tp.Optional[int] = None,
        mask_prob: float = 0.15,
        get_val_mask_func: tp.Optional[ValMaskCallable] = None,
        shuffle_train: bool = True,
        get_val_mask_func_kwargs: tp.Optional[InitKwargs] = None,
        **kwargs: tp.Any,
    ) -> None:
        super().__init__(
            session_max_len=session_max_len,
            n_negatives=n_negatives,
            negative_sampler=negative_sampler,
            batch_size=batch_size,
            dataloader_num_workers=dataloader_num_workers,
            train_min_user_interactions=train_min_user_interactions,
            shuffle_train=shuffle_train,
            get_val_mask_func=get_val_mask_func,
            get_val_mask_func_kwargs=get_val_mask_func_kwargs,
        )
        self.mask_prob = mask_prob

    def _mask_tokens(
        self, tokens: np.ndarray, rng: np.random.Generator, first_border: float = 0.8, second_border: float = 0.9
    ) -> tp.Tuple[np.ndarray, np.ndarray]:
        """Vectorized 80/10/10 MLM masking (reference bert4rec.py:109-127):
        masked tokens -> 80% MASK / 10% random item / 10% keep; targets are the
        original items at masked positions, 0 elsewhere."""
        probs = rng.random(len(tokens))
        masked = probs < self.mask_prob
        sub = probs / self.mask_prob  # uniform on [0,1) given masked
        to_mask_token = masked & (sub < first_border)
        to_random = masked & (sub >= first_border) & (sub < second_border)
        x = tokens.copy()
        x[to_mask_token] = self.extra_token_ids[MASKING_VALUE]
        if to_random.any():
            x[to_random] = rng.integers(self.n_item_extra_tokens, self.item_id_map.size, size=int(to_random.sum()))
        y = np.where(masked, tokens, 0)
        return x, y

    def _collate_fn_train(
        self, dataset: SequenceDataset, rows: np.ndarray, rng: tp.Optional[np.random.Generator]
    ) -> Batch:
        starts = dataset.indptr[rows]
        lengths = dataset.lengths[rows]
        total = int(lengths.sum())
        within = np.arange(total) - np.repeat(np.cumsum(lengths) - lengths, lengths)
        flat_idx = np.repeat(starts, lengths) + within
        tokens = dataset.items[flat_idx]
        if rng is None:  # pragma: no cover
            raise ValueError("BERT4Rec train collate requires rng")
        x_flat, y_flat = self._mask_tokens(tokens, rng)
        flat_starts = np.cumsum(lengths) - lengths
        x = scatter_left_padded(x_flat, flat_starts, lengths, self.session_max_len, np.int64)
        y = scatter_left_padded(y_flat, flat_starts, lengths, self.session_max_len, np.int64)
        yw = scatter_left_padded(dataset.weights[flat_idx], flat_starts, lengths, self.session_max_len, np.float32)
        batch: Batch = {"x": x, "y": y, "yw": yw}
        self._sample_negatives(batch, rng)
        return batch

    def _collate_fn_val(
        self, dataset: SequenceDataset, rows: np.ndarray, rng: tp.Optional[np.random.Generator]
    ) -> Batch:
        """History + MASK token appended; target = first weighted row
        (reference bert4rec.py:146-175)."""
        input_flat, input_seg, y_vals, yw_vals, _ = self._val_inputs_targets(dataset, rows)
        mask_token = self.extra_token_ids[MASKING_VALUE]
        # Append MASK to each history: build values/seg with one extra element per row.
        n = len(rows)
        hist_vals = dataset.items[input_flat]
        ext_vals = np.concatenate([hist_vals, np.full(n, mask_token, dtype=hist_vals.dtype)])
        ext_seg = np.concatenate([input_seg, np.arange(n)])
        order = np.argsort(ext_seg, kind="stable")  # history first, MASK last per row
        x = self._ragged_right_align(ext_vals[order], ext_seg[order], n, self.session_max_len, np.int64)
        y = y_vals.reshape(-1, 1).astype(np.int64)
        yw = yw_vals.reshape(-1, 1).astype(np.float32)
        batch: Batch = {"x": x, "y": y, "yw": yw}
        self._sample_negatives(batch, rng, session_len_limit=1)
        return batch

    def _collate_fn_recommend(
        self, dataset: SequenceDataset, rows: np.ndarray, rng: tp.Optional[np.random.Generator]
    ) -> Batch:
        """Session + MASK appended, right-truncated to session_max_len
        (reference bert4rec.py:177-193)."""
        starts = dataset.indptr[rows]
        lengths = dataset.lengths[rows]
        n = len(rows)
        total = int(lengths.sum())
        within = np.arange(total) - np.repeat(np.cumsum(lengths) - lengths, lengths)
        flat_idx = np.repeat(starts, lengths) + within
        seg = np.repeat(np.arange(n), lengths)
        mask_token = self.extra_token_ids[MASKING_VALUE]
        ext_vals = np.concatenate([dataset.items[flat_idx], np.full(n, mask_token, dtype=np.int64)])
        ext_seg = np.concatenate([seg, np.arange(n)])
        order = np.argsort(ext_seg, kind="stable")
        x = self._ragged_right_align(ext_vals[order], ext_seg[order], n, self.session_max_len, np.int64)
        return {"x": x}


class BERT4RecModelConfig(TransformerModelConfig):
    """BERT4RecModel config."""

    data_preparator_type: TransformerDataPreparatorType = BERT4RecDataPreparator
    use_key_padding_mask: bool = True
    mask_prob: float = 0.15


class BERT4RecModel(TransformerModelBase[BERT4RecModelConfig]):
    """BERT4Rec sequential recommender (arXiv 1904.06690)
    (reference bert4rec.py:196-452)."""

    config_class = BERT4RecModelConfig

    def __init__(
        self,
        n_blocks: int = 2,
        n_heads: int = 4,
        n_factors: int = 256,
        dropout_rate: float = 0.2,
        mask_prob: float = 0.15,
        session_max_len: int = 100,
        train_min_user_interactions: int = 2,
        loss: str = "softmax",
        n_negatives: int = 1,
        gbce_t: float = 0.2,
        lr: float = 0.001,
        batch_size: int = 128,
        epochs: int = 3,
        deterministic: bool = False,
        seed: int = 0,
        verbose: int = 0,
        use_pos_emb: bool = True,
        use_key_padding_mask: bool = True,
        use_causal_attn: bool = False,
        item_net_block_types: tp.Sequence[tp.Type[ItemNetBase]] = (IdEmbeddingsItemNet, CatFeaturesItemNet),
        item_net_constructor_type: tp.Type[ItemNetConstructorBase] = SumOfEmbeddingsConstructor,
        pos_encoding_type: tp.Type[PositionalEncodingBase] = LearnableInversePositionalEncoding,
        transformer_layers_type: tp.Type[TransformerLayersBase] = PreLNTransformerLayers,
        data_preparator_type: tp.Type[TransformerDataPreparatorBase] = BERT4RecDataPreparator,
        training_module_type: tp.Type[TransformerTrainingModuleBase] = TransformerTrainingModule,
        negative_sampler_type: tp.Type[TransformerNegativeSamplerBase] = CatalogUniformSampler,
        similarity_module_type: tp.Type[SimilarityModuleBase] = DistanceSimilarityModule,
        backbone_type: tp.Type[TransformerBackboneBase] = TransformerBackbone,
        get_val_mask_func: tp.Optional[ValMaskCallable] = None,
        get_val_mask_func_kwargs: tp.Optional[InitKwargs] = None,
        get_callbacks_func: tp.Optional[CallbacksCallable] = None,
        recommend_batch_size: tp.Optional[int] = None,
        data_preparator_kwargs: tp.Optional[InitKwargs] = None,
        transformer_layers_kwargs: tp.Optional[InitKwargs] = None,
        item_net_constructor_kwargs: tp.Optional[InitKwargs] = None,
        pos_encoding_kwargs: tp.Optional[InitKwargs] = None,
        training_module_kwargs: tp.Optional[InitKwargs] = None,
        negative_sampler_kwargs: tp.Optional[InitKwargs] = None,
        similarity_module_kwargs: tp.Optional[InitKwargs] = None,
        backbone_kwargs: tp.Optional[InitKwargs] = None,
    ):
        self.mask_prob = mask_prob
        super().__init__(
            data_preparator_type=data_preparator_type,
            transformer_layers_type=transformer_layers_type,
            n_blocks=n_blocks,
            n_heads=n_heads,
            n_factors=n_factors,
            use_pos_emb=use_pos_emb,
            use_causal_attn=use_causal_attn,
            use_key_padding_mask=use_key_padding_mask,
            dropout_rate=dropout_rate,
            session_max_len=session_max_len,
            batch_size=batch_size,
            loss=loss,
            n_negatives=n_negatives,
            gbce_t=gbce_t,
            lr=lr,
            epochs=epochs,
            verbose=verbose,
            deterministic=deterministic,
            seed=seed,
            recommend_batch_size=recommend_batch_size,
            train_min_user_interactions=train_min_user_interactions,
            item_net_block_types=item_net_block_types,
            item_net_constructor_type=item_net_constructor_type,
            pos_encoding_type=pos_encoding_type,
            training_module_type=training_module_type,
            negative_sampler_type=negative_sampler_type,
            similarity_module_type=similarity_module_type,
            backbone_type=backbone_type,
            get_val_mask_func=get_val_mask_func,
            get_val_mask_func_kwargs=get_val_mask_func_kwargs,
            get_callbacks_func=get_callbacks_func,
            data_preparator_kwargs=data_preparator_kwargs,
            transformer_layers_kwargs=transformer_layers_kwargs,
            item_net_constructor_kwargs=item_net_constructor_kwargs,
            pos_encoding_kwargs=pos_encoding_kwargs,
            training_module_kwargs=training_module_kwargs,
            negative_sampler_kwargs=negative_sampler_kwargs,
            similarity_module_kwargs=similarity_module_kwargs,
            backbone_kwargs=backbone_kwargs,
        )

    def _init_data_preparator(self) -> None:
        from .losses import requires_negatives

        needs_negatives = requires_negatives(self.loss)
        self.data_preparator = self.data_preparator_type(
            session_max_len=self.session_max_len,
            n_negatives=self.n_negatives if needs_negatives else None,
            negative_sampler=self._init_negative_sampler() if needs_negatives else None,
            batch_size=self.batch_size,
            dataloader_num_workers=0,
            train_min_user_interactions=self.train_min_user_interactions,
            mask_prob=self.mask_prob,
            get_val_mask_func=self.get_val_mask_func,
            get_val_mask_func_kwargs=self.get_val_mask_func_kwargs,
            **self._get_kwargs(self.data_preparator_kwargs),
        )
