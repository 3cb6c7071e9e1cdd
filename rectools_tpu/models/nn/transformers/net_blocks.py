"""Transformer building blocks (flax) — feed-forwards, multi-head attention,
Pre-LN layers, positional encodings.

TPU-native equivalent of reference rectools/models/nn/transformers/net_blocks.py.
Attention masks are *additive float biases* throughout (large negative instead
of boolean -inf masks): XLA fuses the bias add into the attention softmax, and
finite masking keeps fully-masked rows NaN-free, which matters because batches
are padded to static shapes on TPU (all-pad dummy rows would otherwise produce
NaN under a boolean key-padding mask).
"""

import typing as tp
from functools import partial

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..dropout import HashDropout
from ..norm import FusedLayerNorm

from ....ops.attention import dot_product_attention

MASK_VALUE = -1e9  # additive attention-bias "minus infinity"

# exact (erf) GELU — the reference's torch.nn.GELU default; flax's default is
# the tanh approximation, which drifts ~4e-3 on logits
_exact_gelu = partial(nn.gelu, approximate=False)


class MultiHeadAttention(nn.Module):
    """Standard MHA with additive attention bias.

    Equivalent contract to torch ``nn.MultiheadAttention(batch_first=True)``
    as used by all reference layer families: separate query and key/value
    inputs, dropout on attention probabilities.
    """

    n_factors: int
    n_heads: int
    dropout_rate: float

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,  # (B, L, D)
        key: jnp.ndarray,  # (B, L, D)
        value: jnp.ndarray,  # (B, L, D)
        attn_bias: tp.Optional[jnp.ndarray],  # (B or 1, 1, L, L) additive
        deterministic: bool = True,
    ) -> jnp.ndarray:
        b, l, d = query.shape
        head_dim = self.n_factors // self.n_heads
        q = nn.Dense(self.n_factors, name="q_proj")(query)
        k = nn.Dense(self.n_factors, name="k_proj")(key)
        v = nn.Dense(self.n_factors, name="v_proj")(value)
        q = q.reshape(b, l, self.n_heads, head_dim)
        k = k.reshape(b, l, self.n_heads, head_dim)
        v = v.reshape(b, l, self.n_heads, head_dim)
        scale = 1.0 / float(head_dim) ** 0.5

        # One path for training AND inference: the fused kernel (or its XLA
        # twin off-TPU) applies attention-probability dropout in-kernel with
        # a counter-based mask, so the default dropout_rate=0.2 config stays
        # on the Pallas kernel. The seed comes from the flax dropout stream.
        rate = 0.0 if deterministic else self.dropout_rate
        seed = None
        if rate > 0.0:
            rng = self.make_rng("dropout")
            seed = jax.random.randint(rng, (1,), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
        out = dot_product_attention(q, k, v, attn_bias, scale, dropout_rate=rate, dropout_seed=seed)
        out = out.reshape(b, l, self.n_factors)
        return nn.Dense(self.n_factors, name="out_proj")(out)


class PointWiseFeedForward(nn.Module):
    """Two-layer FFN (reference net_blocks.py:21-65)."""

    n_factors: int
    n_factors_ff: int
    dropout_rate: float
    activation: tp.Callable[[jnp.ndarray], jnp.ndarray]
    use_bias: bool = True

    @nn.compact
    def __call__(self, seqs: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        output = self.activation(nn.Dense(self.n_factors_ff, use_bias=self.use_bias, name="ff_linear_1")(seqs))
        output = HashDropout(rate=self.dropout_rate, deterministic=deterministic)(output)
        return nn.Dense(self.n_factors, use_bias=self.use_bias, name="ff_linear_2")(output)


class SwigluFeedForward(nn.Module):
    """SwiGLU FFN (reference net_blocks.py:68-110)."""

    n_factors: int
    n_factors_ff: int
    dropout_rate: float
    use_bias: bool = True

    @nn.compact
    def __call__(self, seqs: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        gate = nn.silu(nn.Dense(self.n_factors_ff, use_bias=self.use_bias, name="ff_linear_1")(seqs))
        output = gate * nn.Dense(self.n_factors_ff, use_bias=self.use_bias, name="ff_linear_3")(seqs)
        output = HashDropout(rate=self.dropout_rate, deterministic=deterministic)(output)
        return nn.Dense(self.n_factors, use_bias=self.use_bias, name="ff_linear_2")(output)


def init_feed_forward(
    n_factors: int,
    ff_factors_multiplier: int,
    dropout_rate: float,
    ff_activation: str,
    use_bias: bool = True,
    name: tp.Optional[str] = None,
) -> nn.Module:
    """FFN factory: "swiglu" / "relu" / "gelu" (reference net_blocks.py:113-151)."""
    if ff_activation == "swiglu":
        return SwigluFeedForward(n_factors, n_factors * ff_factors_multiplier, dropout_rate, use_bias, name=name)
    if ff_activation == "gelu":
        return PointWiseFeedForward(
            n_factors, n_factors * ff_factors_multiplier, dropout_rate, _exact_gelu, use_bias, name=name
        )
    if ff_activation == "relu":
        return PointWiseFeedForward(
            n_factors, n_factors * ff_factors_multiplier, dropout_rate, nn.relu, use_bias, name=name
        )
    raise ValueError(f"Unsupported ff_activation: {ff_activation}")


class TransformerLayersBase(nn.Module):
    """Base class for transformer layer stacks.

    Contract (reference net_blocks.py:154-185): ``__call__(seqs, timeline_mask,
    attn_bias, batch, deterministic)`` where ``timeline_mask`` is the float
    (B, L, 1) non-padding indicator and ``attn_bias`` the merged additive
    attention bias (or None).
    """

    def __call__(
        self,
        seqs: jnp.ndarray,
        timeline_mask: jnp.ndarray,
        attn_bias: tp.Optional[jnp.ndarray],
        batch: tp.Dict[str, jnp.ndarray],
        deterministic: bool = True,
    ) -> jnp.ndarray:
        raise NotImplementedError()


class PreLNTransformerLayer(nn.Module):
    """Pre-LN block (reference net_blocks.py:188-261)."""

    n_factors: int
    n_heads: int
    dropout_rate: float
    ff_factors_multiplier: int = 4

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
        seqs = seqs + HashDropout(rate=self.dropout_rate, deterministic=deterministic)(mha_output)
        ff_input = FusedLayerNorm(name="layer_norm_2")(seqs)
        ff_output = PointWiseFeedForward(
            self.n_factors, self.n_factors * self.ff_factors_multiplier, self.dropout_rate, _exact_gelu,
            name="feed_forward",
        )(ff_input, deterministic)
        seqs = seqs + HashDropout(rate=self.dropout_rate, deterministic=deterministic)(ff_output)
        seqs = HashDropout(rate=self.dropout_rate, deterministic=deterministic)(seqs)
        return seqs


class PreLNTransformerLayers(TransformerLayersBase):
    """Pre-LN stack — BERT4Rec default (reference net_blocks.py:264-335)."""

    n_blocks: int
    n_factors: int
    n_heads: int
    dropout_rate: float
    ff_factors_multiplier: int = 4

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
            seqs = PreLNTransformerLayer(
                self.n_factors, self.n_heads, self.dropout_rate, self.ff_factors_multiplier,
                name=f"block_{block_idx}",
            )(seqs, attn_bias, deterministic)
        return seqs


class PositionalEncodingBase(nn.Module):
    """Base class for positional encodings."""

    def __call__(self, sessions: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        raise NotImplementedError()


class LearnableInversePositionalEncoding(PositionalEncodingBase):
    """Learnable embeddings indexed by inverse positions
    (reference net_blocks.py:346-401): position L-1..0 so that left-padded
    variable-length sessions align on the "distance from the end" axis.
    """

    use_pos_emb: bool
    session_max_len: int
    n_factors: int
    use_scale_factor: bool = False

    @nn.compact
    def __call__(self, sessions: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        batch_size, session_max_len, n_factors = sessions.shape
        if self.use_scale_factor:
            sessions = sessions * (n_factors**0.5)
        if self.use_pos_emb:
            pos_emb = self.param(
                "pos_emb",
                nn.initializers.normal(stddev=1.0),
                (self.session_max_len, self.n_factors),
                jnp.float32,
            )
            positions = jnp.arange(session_max_len - 1, -1, -1)
            sessions = sessions + pos_emb[positions][None, :, :]
        return sessions
