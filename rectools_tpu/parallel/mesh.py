"""Device mesh and sharding helpers.

This framework scales via SPMD over a 2-axis ``jax.sharding.Mesh``:
``data`` (batch/user axis) x ``model`` (item/embedding-table axis). The
reference library had no tensor-parallel path at all (SURVEY.md §2.9); here it
is a first-class module: XLA inserts ICI collectives from sharding
annotations, there is no hand-written NCCL-style code.
"""

import typing as tp
from functools import lru_cache

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: tp.Optional[int] = None,
    n_model: int = 1,
    devices: tp.Optional[tp.Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    By default all devices go on the ``data`` axis. For column-sharded item
    tables (top-k MIPS, sampled softmax) pass ``n_model > 1``.
    """
    if devices is None:
        devices = jax.devices()
    n_devices = len(devices)
    if n_data is None:
        n_data = n_devices // n_model
    if n_data * n_model != n_devices:
        raise ValueError(f"n_data * n_model must equal device count {n_devices}")
    dev_array = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


@lru_cache(maxsize=1)
def default_mesh() -> Mesh:
    """All devices on the data axis."""
    return make_mesh()


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh, axis: int = 0) -> NamedSharding:
    spec: tp.List[tp.Optional[str]] = [None] * (axis + 1)
    spec[axis] = DATA_AXIS
    return NamedSharding(mesh, P(*spec))


def model_sharded(mesh: Mesh, axis: int = 0) -> NamedSharding:
    spec: tp.List[tp.Optional[str]] = [None] * (axis + 1)
    spec[axis] = MODEL_AXIS
    return NamedSharding(mesh, P(*spec))


def pad_to_multiple(n: int, m: int) -> int:
    """Round n up to a multiple of m (for even sharding / MXU tiling)."""
    return ((n + m - 1) // m) * m
