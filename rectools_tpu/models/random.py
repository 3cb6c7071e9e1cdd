"""Random recommendation model (reference rectools/models/random.py:61).

Random ranking runs on device via the same masked top-k path as MIPS ranking
(ops/topk.py `random_rank_topk`) instead of a per-user host loop. Scores are
descending integers n_reco..1 per user, as in the reference.
"""

import typing as tp

import jax
import numpy as np
import typing_extensions as tpe

from ..dataset import Dataset
from ..ops.topk import random_rank_topk
from .base import ModelBase, ModelConfig


class RandomModelConfig(ModelConfig):
    """Config for `RandomModel`."""

    random_state: tp.Optional[int] = None


class RandomModel(ModelBase[RandomModelConfig]):
    """Uniform random recommendations over the item catalog (or whitelist)."""

    recommends_for_warm = False
    recommends_for_cold = True

    config_class = RandomModelConfig

    def __init__(self, random_state: tp.Optional[int] = None, verbose: int = 0):
        super().__init__(verbose=verbose)
        self.random_state = random_state
        self._key = jax.random.PRNGKey(random_state if random_state is not None else 0)
        self.all_item_ids: np.ndarray

    def _get_config(self) -> RandomModelConfig:
        return RandomModelConfig(cls=self.__class__, random_state=self.random_state, verbose=self.verbose)

    @classmethod
    def _from_config(cls, config: RandomModelConfig) -> tpe.Self:
        return cls(random_state=config.random_state, verbose=config.verbose)

    def _fit(self, dataset: Dataset) -> None:
        self.all_item_ids = dataset.item_id_map.internal_ids
        self._key = jax.random.PRNGKey(self.random_state if self.random_state is not None else 0)

    def _next_key(self) -> jax.Array:
        self._key, sub = jax.random.split(self._key)
        return sub

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
            filter_csr = user_items[user_ids]
        else:
            filter_csr = None
        return random_rank_topk(
            self._next_key(),
            n_objects=len(self.all_item_ids),
            subject_ids=user_ids,
            k=k,
            filter_pairs_csr=filter_csr,
            sorted_object_whitelist=sorted_item_ids_to_recommend,
        )

    def _recommend_i2i(
        self,
        target_ids: np.ndarray,
        dataset: Dataset,
        k: int,
        sorted_item_ids_to_recommend: tp.Optional[np.ndarray],
    ) -> tp.Tuple[np.ndarray, np.ndarray, np.ndarray]:
        return self._recommend_u2i(target_ids, dataset, k, False, sorted_item_ids_to_recommend)

    def _recommend_cold(
        self,
        target_ids: np.ndarray,
        dataset: Dataset,
        k: int,
        sorted_item_ids_to_recommend: tp.Optional[np.ndarray],
    ) -> tp.Tuple[np.ndarray, np.ndarray, np.ndarray]:
        positions = np.arange(len(target_ids))
        subj_pos, obj, scores = random_rank_topk(
            self._next_key(),
            n_objects=len(self.all_item_ids),
            subject_ids=positions,
            k=k,
            sorted_object_whitelist=sorted_item_ids_to_recommend,
        )
        return np.asarray(target_ids)[subj_pos], obj, scores
