"""Multi-host distributed runtime: process initialization, DCN x ICI meshes,
and host-local -> global batch assembly.

SURVEY.md §2.9 plans the collective backend as a first-class module: within a
slice, collectives ride ICI from sharding annotations; across hosts/slices
they cross DCN. The rules this module encodes:

* every process calls :func:`initialize` once before touching devices —
  afterwards ``jax.devices()`` is the GLOBAL device list and any jitted
  computation is automatically SPMD across all hosts;
* meshes are built so the ``model`` axis (item tables, top-k shards — the
  all-gather/psum-heavy axis) NEVER crosses a slice boundary: model-parallel
  collectives stay on ICI, only data-parallel gradient reductions cross DCN
  (:func:`make_multihost_mesh`);
* each host feeds only its own rows of the global batch
  (:func:`host_local_batch_to_global`), so the input pipeline scales with
  host count.

Typical 2-host data-parallel training::

    from rectools_tpu.parallel import distributed as dist

    dist.initialize()                      # env-driven on TPU pods
    mesh = dist.make_multihost_mesh(n_model=1)
    model = SASRecModel(..., training_module_kwargs={
        "mesh_shape": (mesh.shape["data"], mesh.shape["model"]),
    })

On Cloud TPU pods `jax.distributed.initialize()` discovers the coordinator
from the TPU environment; elsewhere pass coordinator_address/num_processes/
process_id explicitly (the same triple works for multi-process CPU
simulation, which is how tests/parallel/test_distributed.py exercises this
module without a pod).
"""

import typing as tp

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS, MODEL_AXIS

_initialized = False


def initialize(
    coordinator_address: tp.Optional[str] = None,
    num_processes: tp.Optional[int] = None,
    process_id: tp.Optional[int] = None,
    local_device_ids: tp.Optional[tp.Sequence[int]] = None,
) -> None:
    """Join (or form) the multi-host cluster. Idempotent per process.

    With no arguments, relies on environment auto-detection (TPU pods, SLURM,
    GKE). A single-process setup (num_processes in (None, 1) and no
    coordinator) skips initialization entirely so single-host code paths
    don't pay for the distributed runtime.
    """
    global _initialized
    if _initialized:
        return
    if coordinator_address is None and (num_processes is None or num_processes == 1):
        env_hint = jax.config.jax_coordinator_address if hasattr(jax.config, "jax_coordinator_address") else None
        if not env_hint:
            return  # single-process: nothing to do
    kwargs: tp.Dict[str, tp.Any] = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = list(local_device_ids)
    jax.distributed.initialize(**kwargs)
    _initialized = True


def is_initialized() -> bool:
    return _initialized


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def _devices_by_slice() -> tp.List[tp.List[jax.Device]]:
    """Group global devices by slice (TPU pods expose slice_index; hosts of a
    CPU simulation each count as one 'slice')."""
    groups: tp.Dict[int, tp.List[jax.Device]] = {}
    for device in jax.devices():
        slice_id = getattr(device, "slice_index", None)
        if slice_id is None:
            slice_id = device.process_index
        groups.setdefault(slice_id, []).append(device)
    return [groups[key] for key in sorted(groups)]


def make_multihost_mesh(n_model: int = 1, n_data: tp.Optional[int] = None) -> Mesh:
    """(data, model) mesh over ALL hosts with the model axis inside a slice.

    The device array is laid out slice-major on the data axis: rows of the
    data axis that belong to one slice are contiguous, and each model-axis
    group lives entirely within one slice — so psum/all_gather over
    ``model`` never crosses DCN. Raises if ``n_model`` does not divide the
    per-slice device count.
    """
    slices = _devices_by_slice()
    per_slice = len(slices[0])
    if any(len(group) != per_slice for group in slices):
        raise ValueError("slices expose different device counts; cannot build a regular mesh")
    if per_slice % n_model != 0:
        raise ValueError(
            f"n_model={n_model} must divide the per-slice device count {per_slice} "
            "(the model axis must not cross a DCN boundary)"
        )
    total = per_slice * len(slices)
    expected_data = total // n_model
    if n_data is not None and n_data != expected_data:
        raise ValueError(f"n_data={n_data} inconsistent with {total} devices / n_model={n_model}")
    dev_array = np.empty((expected_data, n_model), dtype=object)
    row = 0
    for group in slices:
        block = np.asarray(group, dtype=object).reshape(per_slice // n_model, n_model)
        dev_array[row : row + block.shape[0]] = block
        row += block.shape[0]
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def data_parallel_row_range(global_batch_size: int, mesh: Mesh) -> tp.Tuple[int, int]:
    """[start, stop) rows of the global batch this PROCESS is responsible
    for. Rows are assigned data-axis-major, so they line up with the
    slice-major mesh layout of :func:`make_multihost_mesh`."""
    n_proc = jax.process_count()
    if global_batch_size % n_proc != 0:
        raise ValueError(f"global batch {global_batch_size} must divide by process count {n_proc}")
    per_proc = global_batch_size // n_proc
    start = jax.process_index() * per_proc
    return start, start + per_proc


def host_local_batch_to_global(
    local_batch: tp.Dict[str, np.ndarray], mesh: Mesh, global_batch_size: int
) -> tp.Dict[str, jax.Array]:
    """Assemble per-host batch shards into global jax.Arrays sharded over the
    ``data`` axis. Each process passes ONLY its rows (see
    :func:`data_parallel_row_range`); no host ever materializes the global
    batch."""
    out: tp.Dict[str, jax.Array] = {}
    for key, arr in local_batch.items():
        global_shape = (global_batch_size,) + arr.shape[1:]
        spec = P(DATA_AXIS, *([None] * (arr.ndim - 1)))
        sharding = NamedSharding(mesh, spec)
        out[key] = jax.make_array_from_process_local_data(sharding, np.asarray(arr), global_shape)
    return out
