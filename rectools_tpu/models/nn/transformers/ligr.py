"""LiGR transformer layers (eSASRec) — gated Pre-LN blocks with SwiGLU FFN.

TPU-native equivalent of reference rectools/models/nn/transformers/ligr.py:25-191
(LiGR: arXiv 2502.03417; eSASRec = SASRec + LiGRLayers + sampled_softmax,
reference README.md:120).
"""

import typing as tp

import jax.numpy as jnp
from flax import linen as nn

from ..dropout import HashDropout
from ..norm import FusedLayerNorm

from .net_blocks import MultiHeadAttention, TransformerLayersBase, init_feed_forward


class LiGRLayer(nn.Module):
    """Pre-LN block where both MHA and FFN residuals are gated by
    sigmoid(linear(seqs)) learnable skips (reference ligr.py:25-107)."""

    n_factors: int
    n_heads: int
    dropout_rate: float
    ff_factors_multiplier: int = 4
    bias_in_ff: bool = False
    ff_activation: str = "swiglu"

    @nn.compact
    def __call__(
        self,
        seqs: jnp.ndarray,
        attn_bias: tp.Optional[jnp.ndarray],
        deterministic: bool = True,
    ) -> jnp.ndarray:
        mha_input = FusedLayerNorm(name="layer_norm_1")(seqs)
        mha_output = MultiHeadAttention(self.n_factors, self.n_heads, self.dropout_rate, name="multi_head_attn")(
            mha_input, mha_input, mha_input, attn_bias, deterministic
        )
        gated_skip = nn.sigmoid(nn.Dense(self.n_factors, name="gating_linear_1")(seqs))
        seqs = seqs + gated_skip * HashDropout(rate=self.dropout_rate, deterministic=deterministic)(mha_output)

        ff_input = FusedLayerNorm(name="layer_norm_2")(seqs)
        ff_output = init_feed_forward(
            self.n_factors, self.ff_factors_multiplier, self.dropout_rate, self.ff_activation,
            self.bias_in_ff, name="feed_forward",
        )(ff_input, deterministic)
        gated_skip = nn.sigmoid(nn.Dense(self.n_factors, name="gating_linear_2")(seqs))
        seqs = seqs + gated_skip * HashDropout(rate=self.dropout_rate, deterministic=deterministic)(ff_output)
        return seqs


class LiGRLayers(TransformerLayersBase):
    """LiGR stack (reference ligr.py:110-191)."""

    n_blocks: int
    n_factors: int
    n_heads: int
    dropout_rate: float
    ff_factors_multiplier: int = 4
    ff_activation: str = "swiglu"
    bias_in_ff: bool = False

    @nn.compact
    def __call__(
        self,
        seqs: jnp.ndarray,
        timeline_mask: jnp.ndarray,
        attn_bias: tp.Optional[jnp.ndarray],
        batch: tp.Dict[str, jnp.ndarray],
        deterministic: bool = True,
    ) -> jnp.ndarray:
        for block_idx in range(self.n_blocks):
            seqs = LiGRLayer(
                self.n_factors,
                self.n_heads,
                self.dropout_rate,
                self.ff_factors_multiplier,
                self.bias_in_ff,
                self.ff_activation,
                name=f"block_{block_idx}",
            )(seqs, attn_bias, deterministic)
        return seqs
