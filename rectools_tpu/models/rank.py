"""Ranker protocol over the TPU top-k engine.

One ranker replaces both of the reference's rankers (ImplicitRanker at
rectools/models/rank/rank_implicit.py:34 and TorchRanker at
rank_torch.py:30); contract per rank/rank.py:36-64.
"""

import typing as tp

import numpy as np
from scipy import sparse

from ..ops.topk import Distance, rank_topk
from ..ops.topk_sharded import rank_topk_sharded

if tp.TYPE_CHECKING:  # pragma: no cover
    from jax.sharding import Mesh

__all__ = ["Distance", "Ranker", "TPURanker"]


def _is_jax_array(x: tp.Any) -> bool:
    import jax

    return isinstance(x, jax.Array)


class Ranker(tp.Protocol):
    """Protocol: batched top-k ranking returning flattened sorted triplets."""

    def rank(
        self,
        subject_ids: np.ndarray,
        k: int,
        filter_pairs_csr: tp.Optional[sparse.csr_matrix] = None,
        sorted_object_whitelist: tp.Optional[np.ndarray] = None,
    ) -> tp.Tuple[np.ndarray, np.ndarray, np.ndarray]:
        ...  # pragma: no cover


class TPURanker:
    """Exact top-k MIPS over subject/object factor matrices on TPU.

    Pass a ``mesh`` to shard the serving across chips: the object table
    splits over the ``model`` axis (per-shard top-k, candidates all-gathered
    over ICI and merged), query batches over the ``data`` axis. Results are
    identical to the single-device path — exact search either way.
    """

    def __init__(
        self,
        distance: Distance,
        subjects_factors: tp.Union[np.ndarray, sparse.csr_matrix],
        objects_factors: np.ndarray,
        batch_size: int = 4096,
        mesh: tp.Optional["Mesh"] = None,
    ) -> None:
        self.distance = distance
        self.subjects_factors = subjects_factors
        # device-resident (jax) factor matrices pass through untouched — the
        # engine pads/gathers them with XLA ops; np.asarray here would force
        # a device->host round trip per recommend call
        if _is_jax_array(objects_factors):
            self.objects_factors: tp.Any = objects_factors
        else:
            self.objects_factors = np.asarray(objects_factors, dtype=np.float32)
        self.batch_size = batch_size
        self.mesh = mesh

    def rank(
        self,
        subject_ids: np.ndarray,
        k: int,
        filter_pairs_csr: tp.Optional[sparse.csr_matrix] = None,
        sorted_object_whitelist: tp.Optional[np.ndarray] = None,
    ) -> tp.Tuple[np.ndarray, np.ndarray, np.ndarray]:
        subject_ids = np.asarray(subject_ids)
        if filter_pairs_csr is not None and filter_pairs_csr.shape[0] != len(subject_ids):
            raise ValueError("Number of rows in `filter_pairs_csr` must match `subject_ids` length")
        if self.mesh is not None:
            # device-resident factors pass through: the sharded engine
            # reshards them over the mesh with XLA ops (one fetch per
            # recommend holds on the multichip serving path too)
            subjects = self.subjects_factors
            if not (sparse.issparse(subjects) or _is_jax_array(subjects)):
                subjects = np.asarray(subjects, dtype=np.float32)
            return rank_topk_sharded(
                subjects=subjects,
                objects=self.objects_factors,
                subject_ids=subject_ids,
                k=k,
                mesh=self.mesh,
                distance=self.distance,
                filter_pairs_csr=filter_pairs_csr,
                sorted_object_whitelist=sorted_object_whitelist,
                batch_size=self.batch_size,
            )
        return rank_topk(
            subjects=self.subjects_factors,
            objects=self.objects_factors,
            subject_ids=subject_ids,
            k=k,
            distance=self.distance,
            filter_pairs_csr=filter_pairs_csr,
            sorted_object_whitelist=sorted_object_whitelist,
            batch_size=self.batch_size,
        )
