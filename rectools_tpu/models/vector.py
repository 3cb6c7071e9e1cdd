"""Base class for embedding-dot-product models (reference rectools/models/vector.py:39).

User/item factor tables score through the TPU top-k engine; biases fold into
padded vectors exactly as in the reference (vector.py:105-134) so DOT ranking
covers `bias_u + bias_i + <e_u, e_i>`.
"""

import typing as tp

import attr
import numpy as np

from ..dataset import Dataset
from .base import ModelBase, ModelConfig_T
from .rank import Distance, TPURanker


@attr.s(auto_attribs=True)
class Factors:
    """Embeddings and optional biases."""

    embeddings: np.ndarray
    biases: tp.Optional[np.ndarray] = None


class VectorModel(ModelBase[ModelConfig_T]):
    """Models that represent users and items as vectors."""

    u2i_dist: Distance = NotImplemented
    i2i_dist: Distance = NotImplemented

    def _recommend_u2i(
        self,
        user_ids: np.ndarray,
        dataset: Dataset,
        k: int,
        filter_viewed: bool,
        sorted_item_ids_to_recommend: tp.Optional[np.ndarray],
    ) -> tp.Tuple[np.ndarray, np.ndarray, np.ndarray]:
        if filter_viewed:
            user_items = dataset.get_user_item_matrix(include_weights=False)
            ui_csr_for_filter = user_items[user_ids]
        else:
            ui_csr_for_filter = None
        user_vectors, item_vectors = self._get_u2i_vectors(dataset)
        ranker = TPURanker(self.u2i_dist, user_vectors, item_vectors)
        return ranker.rank(
            subject_ids=user_ids,
            k=k,
            filter_pairs_csr=ui_csr_for_filter,
            sorted_object_whitelist=sorted_item_ids_to_recommend,
        )

    def _recommend_i2i(
        self,
        target_ids: np.ndarray,
        dataset: Dataset,
        k: int,
        sorted_item_ids_to_recommend: tp.Optional[np.ndarray],
    ) -> tp.Tuple[np.ndarray, np.ndarray, np.ndarray]:
        item_vectors_1, item_vectors_2 = self._get_i2i_vectors(dataset)
        ranker = TPURanker(self.i2i_dist, item_vectors_1, item_vectors_2)
        return ranker.rank(
            subject_ids=target_ids,
            k=k,
            filter_pairs_csr=None,
            sorted_object_whitelist=sorted_item_ids_to_recommend,
        )

    def _process_biases_to_vectors(
        self,
        distance: Distance,
        subject_embeddings: np.ndarray,
        subject_biases: np.ndarray,
        object_embeddings: np.ndarray,
        object_biases: np.ndarray,
    ) -> tp.Tuple[np.ndarray, np.ndarray]:
        if distance == Distance.DOT:
            subject_vectors = np.hstack(
                (subject_biases[:, np.newaxis], np.ones((subject_biases.size, 1)), subject_embeddings)
            )
            object_vectors = np.hstack(
                (np.ones((object_biases.size, 1)), object_biases[:, np.newaxis], object_embeddings)
            )
        elif distance in (Distance.COSINE, Distance.EUCLIDEAN):
            subject_vectors = np.hstack((subject_biases[:, np.newaxis], subject_embeddings))
            object_vectors = np.hstack((object_biases[:, np.newaxis], object_embeddings))
        else:
            raise ValueError(f"Unexpected distance `{distance}`")
        return subject_vectors, object_vectors

    def _get_u2i_vectors(self, dataset: Dataset) -> tp.Tuple[np.ndarray, np.ndarray]:
        user_factors = self._get_users_factors(dataset)
        item_factors = self._get_items_factors(dataset)
        user_vectors = user_factors.embeddings
        item_vectors = item_factors.embeddings
        if user_factors.biases is not None and item_factors.biases is not None:
            user_vectors, item_vectors = self._process_biases_to_vectors(
                self.u2i_dist, user_vectors, user_factors.biases, item_vectors, item_factors.biases
            )
        return user_vectors, item_vectors

    def _get_i2i_vectors(self, dataset: Dataset) -> tp.Tuple[np.ndarray, np.ndarray]:
        item_factors = self._get_items_factors(dataset)
        item_vectors = item_factors.embeddings
        item_vectors_1 = item_vectors_2 = item_vectors
        if item_factors.biases is not None:
            item_vectors_1, item_vectors_2 = self._process_biases_to_vectors(
                self.i2i_dist, item_vectors, item_factors.biases, item_vectors, item_factors.biases
            )
        return item_vectors_1, item_vectors_2

    def _get_users_factors(self, dataset: Dataset) -> Factors:
        raise NotImplementedError()

    def _get_items_factors(self, dataset: Dataset) -> Factors:
        raise NotImplementedError()
