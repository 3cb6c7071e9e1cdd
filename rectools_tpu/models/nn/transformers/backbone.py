"""Transformer backbone: item embeddings + session encoding + similarity logits.

TPU-native equivalent of reference rectools/models/nn/transformers/torch_backbone.py:24-286.
The whole forward (full-catalog item embedding, session encoding, logits) is one
jit-compiled graph; masks are additive float biases (see net_blocks.py).
"""

import typing as tp

import jax.numpy as jnp
from flax import linen as nn

from ..dropout import HashDropout

from ..item_net import ItemNetBase
from .net_blocks import MASK_VALUE, PositionalEncodingBase, TransformerLayersBase
from .similarity import SimilarityModuleBase


class TransformerBackboneBase(nn.Module):
    """Base class for transformer backbones."""

    def encode_sessions(
        self, batch: tp.Dict[str, jnp.ndarray], item_embs: jnp.ndarray, deterministic: bool = True
    ) -> jnp.ndarray:
        """Encode user sessions -> (B, L, D)."""
        raise NotImplementedError()

    def __call__(
        self,
        batch: tp.Dict[str, jnp.ndarray],
        candidate_item_ids: tp.Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        raise NotImplementedError()


class TransformerBackbone(TransformerBackboneBase):
    """Default backbone (reference torch_backbone.py:118-286).

    Mask semantics follow the reference exactly:
    - causal: strict upper triangle disallowed (torch_backbone.py:249-252)
    - key padding: padded keys disallowed (torch_backbone.py:253-254)
    - both: merged and the diagonal force-enabled (torch_backbone.py:172-218)
    """

    item_model: ItemNetBase
    pos_encoding_layer: PositionalEncodingBase
    transformer_layers: TransformerLayersBase
    similarity_module: SimilarityModuleBase
    n_heads: int
    dropout_rate: float
    use_causal_attn: bool = True
    use_key_padding_mask: bool = False

    def setup(self) -> None:
        self.emb_dropout = HashDropout(rate=self.dropout_rate)

    def _build_attn_bias(self, sessions: jnp.ndarray) -> tp.Optional[jnp.ndarray]:
        b, l = sessions.shape
        causal = None
        key_padding = None
        if self.use_causal_attn:
            allowed = jnp.tril(jnp.ones((l, l), dtype=bool))
            causal = jnp.where(allowed, 0.0, MASK_VALUE)[None, None, :, :]  # (1,1,L,L)
        if self.use_key_padding_mask:
            pad = sessions == 0  # (B, L) True for padded keys
            key_padding = jnp.where(pad, MASK_VALUE, 0.0)[:, None, None, :]  # (B,1,1,L)
        if causal is not None and key_padding is not None:
            merged = causal + key_padding  # (B,1,L,L)
            eye = jnp.eye(l, dtype=bool)[None, None, :, :]
            return jnp.where(eye, 0.0, merged)
        if causal is not None:
            return causal
        if key_padding is not None:
            # Force-enable the diagonal so fully-padded dummy rows (batch
            # padding to static shapes) stay numerically clean.
            eye = jnp.eye(l, dtype=bool)[None, None, :, :]
            return jnp.where(eye, 0.0, jnp.broadcast_to(key_padding, (b, 1, l, l)))
        return None

    def encode_sessions(
        self, batch: tp.Dict[str, jnp.ndarray], item_embs: jnp.ndarray, deterministic: bool = True
    ) -> jnp.ndarray:
        sessions = batch["x"]  # (B, L) int
        timeline_mask = (sessions != 0).astype(item_embs.dtype)[:, :, None]  # (B, L, 1)
        seqs = item_embs[sessions]  # (B, L, D)
        seqs = self.pos_encoding_layer(seqs, deterministic=deterministic)
        seqs = self.emb_dropout(seqs, deterministic=deterministic)
        attn_bias = self._build_attn_bias(sessions)
        seqs = self.transformer_layers(seqs, timeline_mask, attn_bias, batch, deterministic=deterministic)
        return seqs

    def __call__(
        self,
        batch: tp.Dict[str, jnp.ndarray],
        candidate_item_ids: tp.Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        item_embs = self.item_model.embed_catalog(deterministic=deterministic)
        session_embs = self.encode_sessions(batch, item_embs, deterministic=deterministic)
        logits = self.similarity_module(session_embs, item_embs, candidate_item_ids, deterministic=deterministic)
        return logits
