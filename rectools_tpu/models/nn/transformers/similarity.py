"""Similarity heads: session/item towers -> logits; owns u2i ranking.

TPU-native equivalent of reference rectools/models/nn/transformers/similarity.py:26-140.
"""

import typing as tp

import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from scipy import sparse

from ...base import InternalRecoTriplet
from ...rank import Distance, TPURanker

EPSILON_COSINE_DIST = 1e-8

_DISTANCE_FROM_STR = {"dot": Distance.DOT, "cosine": Distance.COSINE}


class SimilarityModuleBase(nn.Module):
    """Base class for similarity modules."""

    def _get_full_catalog_logits(self, session_embs: jnp.ndarray, item_embs: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError()

    def _get_pos_neg_logits(
        self, session_embs: jnp.ndarray, item_embs: jnp.ndarray, candidate_item_ids: jnp.ndarray
    ) -> jnp.ndarray:
        raise NotImplementedError()

    def session_tower_forward(self, session_embs: jnp.ndarray) -> jnp.ndarray:
        """Forward pass for session tower."""
        return session_embs

    def item_tower_forward(self, item_embs: jnp.ndarray) -> jnp.ndarray:
        """Forward pass for item tower."""
        return item_embs

    def catalog_loss_towers(
        self, session_embs: jnp.ndarray, item_embs: jnp.ndarray
    ) -> tp.Optional[tp.Tuple[jnp.ndarray, jnp.ndarray]]:
        """(s, i) such that ``einsum('bld,nd->bln', s, i)`` equals
        `_get_full_catalog_logits`, or None when the module's logits are not a
        plain dot product (disables the fused chunked softmax loss)."""
        return None

    def __call__(
        self,
        session_embs: jnp.ndarray,
        item_embs: jnp.ndarray,
        candidate_item_ids: tp.Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        raise NotImplementedError()

    def recommend_u2i(
        self,
        user_embs: np.ndarray,
        item_embs: np.ndarray,
        user_ids: np.ndarray,
        k: int,
        sorted_item_ids_to_recommend: tp.Optional[np.ndarray],
        ui_csr_for_filter: tp.Optional[sparse.csr_matrix],
    ) -> InternalRecoTriplet:
        """Host-side u2i ranking over materialized tower outputs."""
        raise NotImplementedError()


class DistanceSimilarityModule(SimilarityModuleBase):
    """Dot/cosine logits (reference similarity.py:67-140)."""

    distance: str = "dot"

    def _dist(self) -> Distance:
        if self.distance not in _DISTANCE_FROM_STR:
            raise ValueError("`distance` can only be either `dot` or `cosine`.")
        return _DISTANCE_FROM_STR[self.distance]

    def _get_full_catalog_logits(self, session_embs: jnp.ndarray, item_embs: jnp.ndarray) -> jnp.ndarray:
        # (B, L, D) @ (N, D)^T -> (B, L, N); f32 accumulation on MXU.
        return jnp.einsum("bld,nd->bln", session_embs, item_embs, preferred_element_type=jnp.float32)

    def _get_pos_neg_logits(
        self, session_embs: jnp.ndarray, item_embs: jnp.ndarray, candidate_item_ids: jnp.ndarray
    ) -> jnp.ndarray:
        # Candidates (B, L, C): gather then per-position dot (reference similarity.py:88-95).
        pos_neg_embs = item_embs[candidate_item_ids]  # (B, L, C, D)
        return jnp.einsum("blcd,bld->blc", pos_neg_embs, session_embs, preferred_element_type=jnp.float32)

    def _normalize(self, embeddings: jnp.ndarray) -> jnp.ndarray:
        # sqrt(max(|x|^2, eps^2)) instead of max(|x|, eps): identical forward
        # value, but the gradient at x == 0 is exactly 0 instead of NaN
        # (jnp norm has a NaN grad at zero; padded positions are exact zeros
        # after timeline masking, and `where` does not stop NaN grads).
        norm_sq = jnp.sum(embeddings * embeddings, axis=-1, keepdims=True)
        norm = jnp.sqrt(jnp.maximum(norm_sq, EPSILON_COSINE_DIST**2))
        return embeddings / norm

    def catalog_loss_towers(
        self, session_embs: jnp.ndarray, item_embs: jnp.ndarray
    ) -> tp.Tuple[jnp.ndarray, jnp.ndarray]:
        if self._dist() == Distance.COSINE:
            return self._normalize(session_embs), self._normalize(item_embs)
        return session_embs, item_embs

    def __call__(
        self,
        session_embs: jnp.ndarray,
        item_embs: jnp.ndarray,
        candidate_item_ids: tp.Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        if self._dist() == Distance.COSINE:
            session_embs = self._normalize(session_embs)
            item_embs = self._normalize(item_embs)
        if candidate_item_ids is None:
            return self._get_full_catalog_logits(session_embs, item_embs)
        return self._get_pos_neg_logits(session_embs, item_embs, candidate_item_ids)

    def recommend_u2i(
        self,
        user_embs: np.ndarray,
        item_embs: np.ndarray,
        user_ids: np.ndarray,
        k: int,
        sorted_item_ids_to_recommend: tp.Optional[np.ndarray],
        ui_csr_for_filter: tp.Optional[sparse.csr_matrix],
    ) -> InternalRecoTriplet:
        ranker = TPURanker(
            distance=self._dist(),
            subjects_factors=user_embs[user_ids],
            objects_factors=item_embs,
        )
        user_ids_indices, all_reco_ids, all_scores = ranker.rank(
            subject_ids=np.arange(len(user_ids)),
            k=k,
            filter_pairs_csr=ui_csr_for_filter,
            sorted_object_whitelist=sorted_item_ids_to_recommend,
        )
        return user_ids[user_ids_indices], all_reco_ids, all_scores
