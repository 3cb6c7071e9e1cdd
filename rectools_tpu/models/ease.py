"""EASE: closed-form shallow autoencoder (https://arxiv.org/abs/1905.03375).

Behavioral parity with reference rectools/models/ease.py:122-188, but the
Gram build + inverse run on TPU (Cholesky solve, see ops/linalg.py) and both
u2i and i2i ranking run through the device top-k engine — the reference's
host argpartition i2i path (ease.py:163-188) is replaced by ranking sparse
one-hot subjects against the similarity table.
"""

import typing as tp

import numpy as np
import typing_extensions as tpe
from scipy import sparse

from ..dataset import Dataset
from ..ops.linalg import ease_weight
from .base import ModelBase, ModelConfig
from .rank import Distance, TPURanker


class EASEModelConfig(ModelConfig):
    """Config for `EASEModel`."""

    regularization: float = 500.0
    mesh_shape: tp.Optional[tp.Tuple[int, int]] = None
    solver: str = "auto"


class EASEModel(ModelBase[EASEModelConfig]):
    """Embarrassingly Shallow Autoencoder.

    Note: fit materializes an (n_items, n_items) dense matrix; reasonable
    catalog size is ~30k items (same bound as the reference).
    """

    recommends_for_warm = False
    recommends_for_cold = False

    config_class = EASEModelConfig

    def __init__(
        self,
        regularization: float = 500.0,
        mesh_shape: tp.Optional[tp.Tuple[int, int]] = None,
        solver: str = "auto",
        verbose: int = 0,
    ):
        super().__init__(verbose=verbose)
        self.weight: np.ndarray
        self.regularization = regularization
        self.mesh_shape = tuple(mesh_shape) if mesh_shape is not None else None
        self.solver = solver

    def _get_config(self) -> EASEModelConfig:
        return EASEModelConfig(
            cls=self.__class__,
            regularization=self.regularization,
            mesh_shape=self.mesh_shape,
            solver=self.solver,
            verbose=self.verbose,
        )

    @classmethod
    def _from_config(cls, config: EASEModelConfig) -> tpe.Self:
        return cls(
            regularization=config.regularization,
            mesh_shape=config.mesh_shape,
            solver=config.solver,
            verbose=config.verbose,
        )

    def _fit(self, dataset: Dataset) -> None:
        ui_csr = dataset.get_user_item_matrix(include_weights=True)
        mesh = None
        if self.mesh_shape is not None:
            from ..parallel.mesh import make_mesh

            mesh = make_mesh(n_data=self.mesh_shape[0], n_model=self.mesh_shape[1])
        self.weight = ease_weight(ui_csr, self.regularization, mesh=mesh, solver=self.solver)

    def _recommend_u2i(
        self,
        user_ids: np.ndarray,
        dataset: Dataset,
        k: int,
        filter_viewed: bool,
        sorted_item_ids_to_recommend: tp.Optional[np.ndarray],
    ) -> tp.Tuple[np.ndarray, np.ndarray, np.ndarray]:
        user_items = dataset.get_user_item_matrix(include_weights=True)
        ranker = TPURanker(Distance.DOT, user_items, self.weight)
        ui_csr_for_filter = user_items[user_ids] if filter_viewed else None
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
        # scores for target t = weight[t] row: one-hot subjects vs weight^T.
        n = self.weight.shape[0]
        one_hot = sparse.identity(n, dtype=np.float32, format="csr")
        ranker = TPURanker(Distance.DOT, one_hot, np.ascontiguousarray(self.weight.T))
        return ranker.rank(
            subject_ids=target_ids,
            k=k,
            filter_pairs_csr=None,
            sorted_object_whitelist=sorted_item_ids_to_recommend,
        )
