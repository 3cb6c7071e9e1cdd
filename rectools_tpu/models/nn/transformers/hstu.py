"""HSTU: pointwise-aggregated attention with relative time/position biases.

TPU-native equivalent of reference rectools/models/nn/transformers/hstu.py:47-729
(original paper arXiv 2402.17152). The STU block replaces softmax attention
with SiLU(qk + rel_bias)/L and multiplicative causal/timeline masking; the
fused uvqk projection is one MXU matmul.
"""

import typing as tp

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..dropout import HashDropout
from ..norm import FusedLayerNorm

from ....ops.stu_attention import stu_dot_product_attention
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
    TransformerLayersType,
    TransformerModelBase,
    TransformerModelConfig,
    CallbacksCallable,
    ValMaskCallable,
)
from .data_preparator import TransformerDataPreparatorBase
from .losses import requires_negatives
from .negative_sampler import CatalogUniformSampler, TransformerNegativeSamplerBase
from .net_blocks import MASK_VALUE, LearnableInversePositionalEncoding, PositionalEncodingBase, TransformerLayersBase
from .sasrec import SASRecDataPreparator
from .similarity import DistanceSimilarityModule, SimilarityModuleBase
from .training import TransformerTrainingModule, TransformerTrainingModuleBase


class RelativeAttentionBias(nn.Module):
    """Relative time + positional attention biases
    (reference hstu.py:47-153). Params live in ``setup`` so the fused STU
    kernel can consume the raw weight vectors without materializing the
    (B, L, L) bias tensor."""

    session_max_len: int
    relative_time_attention: bool
    relative_pos_attention: bool
    num_buckets: int = 128

    def setup(self) -> None:
        if self.relative_time_attention:
            self.time_weights = self.param(
                "time_weights", nn.initializers.normal(stddev=0.02), (self.num_buckets + 1,), jnp.float32
            )
        if self.relative_pos_attention:
            self.pos_weights = self.param(
                "pos_weights", nn.initializers.normal(stddev=0.02), (2 * self.session_max_len - 1,), jnp.float32
            )

    def weight_vectors(self) -> tp.Tuple[tp.Optional[jnp.ndarray], tp.Optional[jnp.ndarray]]:
        """Raw (time_weights, pos_weights) for the fused kernel; None when the
        corresponding bias is disabled."""
        tw = self.time_weights if self.relative_time_attention else None
        pw = self.pos_weights if self.relative_pos_attention else None
        return tw, pw

    def _quantize(self, diff_timestamps: jnp.ndarray) -> jnp.ndarray:
        """Log-bucket timestamp deltas (reference hstu.py:84-86)."""
        return (jnp.log(jnp.maximum(jnp.abs(diff_timestamps), 1).astype(jnp.float32)) / 0.301).astype(jnp.int32)

    def _time_attention(self, time_weights: jnp.ndarray, all_timestamps: jnp.ndarray) -> jnp.ndarray:
        """(B, L+1) timestamps incl. target time -> (B, L, L) bias
        (reference hstu.py:88-114)."""
        len_expanded = self.session_max_len + 1
        extended = jnp.concatenate([all_timestamps, all_timestamps[:, len_expanded - 1 : len_expanded]], axis=1)
        early_time_binding = extended[:, 1:, None] - extended[:, None, :-1]
        bucketed = jnp.clip(self._quantize(early_time_binding), 0, self.num_buckets)
        bucketed = jax.lax.stop_gradient(bucketed)
        from ....ops.stu_attention import _bucket_bias

        # scatter-free backward for the table gradient (see ops/stu_attention)
        rel = _bucket_bias(time_weights, bucketed)  # (B, L+1, L+1)
        return rel[:, :-1, :-1]

    def _pos_attention(self, pos_weights: jnp.ndarray) -> jnp.ndarray:
        """(2L-1,) weights -> (1, L, L) Toeplitz bias via the pad/repeat trick
        (reference hstu.py:116-128)."""
        n = self.session_max_len
        t = jnp.pad(pos_weights[: 2 * n - 1], (0, n))
        t = jnp.tile(t, n)[: -n].reshape(1, n, 3 * n - 2)
        r = (2 * n - 1) // 2
        return t[:, :, r : t.shape[2] - r]

    def __call__(self, batch: tp.Dict[str, jnp.ndarray]) -> jnp.ndarray:
        batch_size, l = batch["x"].shape
        rel_attn = jnp.zeros((batch_size, self.session_max_len, self.session_max_len), dtype=jnp.float32)
        if self.relative_time_attention:
            rel_attn = rel_attn + self._time_attention(self.time_weights, batch["unix_ts"])
        if self.relative_pos_attention:
            rel_attn = rel_attn + self._pos_attention(self.pos_weights)
        return rel_attn


class STULayer(nn.Module):
    """HSTU encoder block, dense form (reference hstu.py:156-299)."""

    n_factors: int
    n_heads: int
    linear_hidden_dim: int
    attention_dim: int
    session_max_len: int
    relative_time_attention: bool
    relative_pos_attention: bool
    attn_dropout_rate: float
    dropout_rate: float
    epsilon: float

    @nn.compact
    def __call__(
        self,
        seqs: jnp.ndarray,
        batch: tp.Dict[str, jnp.ndarray],
        attn_allowed: jnp.ndarray,  # (1, 1, L, L) float 0/1
        timeline_mask: jnp.ndarray,  # (B, L, 1) float
        deterministic: bool = True,
    ) -> jnp.ndarray:
        batch_size, l, _ = seqs.shape
        h, lh, ad = self.n_heads, self.linear_hidden_dim, self.attention_dim

        normed_x = FusedLayerNorm(epsilon=self.epsilon, name="norm_input")(seqs) * timeline_mask
        uvqk_proj = self.param(
            "uvqk_proj",
            nn.initializers.xavier_uniform(),
            (self.n_factors, lh * 2 * h + ad * h * 2),
            jnp.float32,
        )
        # silu in f32 for accuracy, then back to the working precision: under
        # bf16 compute this keeps u/v/q/k (and the (B, H, L, L) score streams
        # they feed) at bf16 instead of silently promoting the whole STU
        # stack to f32
        transformed = nn.silu(
            jnp.matmul(normed_x, uvqk_proj, preferred_element_type=jnp.float32)
        ).astype(seqs.dtype)
        u, v, q, k = jnp.split(transformed, [lh * h, lh * 2 * h, lh * 2 * h + ad * h], axis=-1)

        rel_module = RelativeAttentionBias(
            session_max_len=self.session_max_len,
            relative_time_attention=self.relative_time_attention,
            relative_pos_attention=self.relative_pos_attention,
            name="rel_attn",
        )
        tm = timeline_mask[:, :, 0]  # (B, L)

        # Fused Pallas path on TPU when the allowed-mask is batch-independent
        # (pure causal from the backbone): relative biases computed inside the
        # kernel, no (B, H, L, L) score or (B, L, L) bias tensors in HBM.
        use_fused = jax.default_backend() == "tpu" and attn_allowed.shape[0] == 1 and attn_allowed.shape[1] == 1
        if use_fused:
            q4 = q.reshape(batch_size, l, h, ad).transpose(0, 2, 1, 3)
            k4 = k.reshape(batch_size, l, h, ad).transpose(0, 2, 1, 3)
            v4 = v.reshape(batch_size, l, h, lh).transpose(0, 2, 1, 3)
            tw, pw = rel_module.weight_vectors()
            ts = batch.get("unix_ts") if self.relative_time_attention else None
            ext = jnp.concatenate([ts, ts[:, -1:]], axis=1) if ts is not None else None
            out4 = stu_dot_product_attention(
                q4, k4, v4, ext, tm, attn_allowed[0, 0], tw, pw, rel_module.num_buckets
            )
            attn_output = out4.transpose(0, 2, 1, 3).reshape(batch_size, l, h * lh)
        else:
            # Score pipeline at the working precision: under bf16 compute the
            # (B, H, L, L) score/silu/mask streams dominate this path's HBM
            # traffic at long L, and bf16 halves them (MXU still accumulates
            # f32 internally). f32 inputs keep the exact f32 pipeline.
            work = seqs.dtype if seqs.dtype == jnp.bfloat16 else jnp.float32
            qk_attn = jnp.einsum(
                "bnhd,bmhd->bhnm",
                q.reshape(batch_size, l, h, ad),
                k.reshape(batch_size, l, h, ad),
                preferred_element_type=jnp.float32,
            ).astype(work)
            rel = rel_module(batch)
            qk_attn = qk_attn + rel[:, None, :, :].astype(work)
            qk_attn = nn.silu(qk_attn) / self.session_max_len

            timeline_fix = tm[:, None, :] * timeline_mask  # (B, L, L)
            qk_attn = qk_attn * attn_allowed.astype(work) * timeline_fix[:, None, :, :].astype(work)

            attn_output = jnp.einsum(
                "bhnm,bmhd->bnhd",
                qk_attn,
                v.reshape(batch_size, l, h, lh),
                preferred_element_type=jnp.float32,
            ).reshape(batch_size, l, h * lh)
        attn_output = HashDropout(rate=self.attn_dropout_rate, deterministic=deterministic)(attn_output)

        o_input = u * FusedLayerNorm(epsilon=self.epsilon, name="norm_attn_output")(attn_output) * timeline_mask
        o_input = HashDropout(rate=self.dropout_rate, deterministic=deterministic)(o_input)
        return nn.Dense(self.n_factors, name="output_mlp")(o_input) + seqs


class STULayers(TransformerLayersBase):
    """Stacked STU blocks (reference hstu.py:302-399)."""

    n_blocks: int
    n_factors: int
    n_heads: int
    linear_hidden_dim: int
    attention_dim: int
    session_max_len: int
    relative_time_attention: bool
    relative_pos_attention: bool
    dropout_rate: float = 0.2
    attn_dropout_rate: float = 0.0
    epsilon: float = 1e-6

    @nn.compact
    def __call__(
        self,
        seqs: jnp.ndarray,
        timeline_mask: jnp.ndarray,
        attn_bias: tp.Optional[jnp.ndarray],
        batch: tp.Dict[str, jnp.ndarray],
        deterministic: bool = True,
    ) -> jnp.ndarray:
        l = seqs.shape[1]
        if attn_bias is None:
            attn_allowed = jnp.ones((1, 1, l, l), dtype=seqs.dtype)
        else:
            # Additive bias -> multiplicative 0/1 allowed mask (STU attention
            # is not a softmax, masking is by multiplication).
            attn_allowed = (attn_bias > MASK_VALUE / 2).astype(seqs.dtype)
        for block_idx in range(self.n_blocks):
            seqs = seqs * timeline_mask
            seqs = STULayer(
                n_factors=self.n_factors,
                n_heads=self.n_heads,
                linear_hidden_dim=self.linear_hidden_dim,
                attention_dim=self.attention_dim,
                session_max_len=self.session_max_len,
                relative_time_attention=self.relative_time_attention,
                relative_pos_attention=self.relative_pos_attention,
                attn_dropout_rate=self.attn_dropout_rate,
                dropout_rate=self.dropout_rate,
                epsilon=self.epsilon,
                name=f"block_{block_idx}",
            )(seqs, batch, attn_allowed, timeline_mask, deterministic)
        seqs = seqs * timeline_mask
        return seqs


class HSTUModelConfig(TransformerModelConfig):
    """HSTU model config."""

    data_preparator_type: TransformerDataPreparatorType = SASRecDataPreparator
    transformer_layers_type: TransformerLayersType = STULayers
    use_causal_attn: bool = True
    relative_time_attention: bool = True
    relative_pos_attention: bool = True


class HSTUModel(TransformerModelBase[HSTUModelConfig]):
    """HSTU sequential recommender (arXiv 2402.17152)
    (reference hstu.py:402-729). Forces cosine similarity, scaled positional
    encoding, and (with time attention) `unix_ts` batches + recommend context."""

    config_class = HSTUModelConfig

    def __init__(
        self,
        n_blocks: int = 2,
        n_heads: int = 4,
        n_factors: int = 256,
        dropout_rate: float = 0.2,
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
        use_key_padding_mask: bool = False,
        use_causal_attn: bool = True,
        relative_time_attention: bool = True,
        relative_pos_attention: bool = True,
        item_net_block_types: tp.Sequence[tp.Type[ItemNetBase]] = (IdEmbeddingsItemNet, CatFeaturesItemNet),
        item_net_constructor_type: tp.Type[ItemNetConstructorBase] = SumOfEmbeddingsConstructor,
        pos_encoding_type: tp.Type[PositionalEncodingBase] = LearnableInversePositionalEncoding,
        transformer_layers_type: tp.Type[TransformerLayersBase] = STULayers,
        data_preparator_type: tp.Type[TransformerDataPreparatorBase] = SASRecDataPreparator,
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
        self.relative_time_attention = relative_time_attention
        self.relative_pos_attention = relative_pos_attention
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

    def _init_transformer_layers(self) -> TransformerLayersBase:
        head_dim = self.n_factors // self.n_heads
        return self.transformer_layers_type(
            n_blocks=self.n_blocks,
            n_factors=self.n_factors,
            n_heads=self.n_heads,
            session_max_len=self.session_max_len,
            attention_dim=head_dim,
            linear_hidden_dim=head_dim,
            dropout_rate=self.dropout_rate,
            relative_time_attention=self.relative_time_attention,
            relative_pos_attention=self.relative_pos_attention,
            **self._get_kwargs(self.transformer_layers_kwargs),
        )

    def _init_data_preparator(self) -> None:
        needs_negatives = requires_negatives(self.loss)
        data_preparator_kwargs = dict(self.data_preparator_kwargs or {})
        if self.relative_time_attention:
            data_preparator_kwargs["add_unix_ts"] = True
        self.data_preparator = self.data_preparator_type(
            session_max_len=self.session_max_len,
            batch_size=self.batch_size,
            dataloader_num_workers=0,
            train_min_user_interactions=self.train_min_user_interactions,
            negative_sampler=self._init_negative_sampler() if needs_negatives else None,
            n_negatives=self.n_negatives if needs_negatives else None,
            get_val_mask_func=self.get_val_mask_func,
            get_val_mask_func_kwargs=self.get_val_mask_func_kwargs,
            **data_preparator_kwargs,
        )

    def _init_similarity_module(self) -> SimilarityModuleBase:
        similarity_module_kwargs = dict(self.similarity_module_kwargs or {})
        similarity_module_kwargs.setdefault("distance", "cosine")
        return self.similarity_module_type(**similarity_module_kwargs)

    def _init_pos_encoding_layer(self) -> PositionalEncodingBase:
        pos_encoding_kwargs = dict(self.pos_encoding_kwargs or {})
        pos_encoding_kwargs.setdefault("use_scale_factor", True)
        return self.pos_encoding_type(
            self.use_pos_emb,
            self.session_max_len,
            self.n_factors,
            **pos_encoding_kwargs,
        )

    @property
    def require_recommend_context(self) -> bool:
        """Time-aware inference needs per-user context timestamps
        (reference hstu.py:719-729)."""
        return self.relative_time_attention
