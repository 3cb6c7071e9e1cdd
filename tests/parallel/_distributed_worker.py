"""Worker process for the multi-host simulation test: joins a 2-process CPU
cluster, builds the DCN x ICI mesh, and runs a cross-host data-parallel
reduction plus host-local batch assembly. Prints CHECK lines the parent
asserts on."""

import os
import sys

os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"

import jax

jax.config.update("jax_platforms", "cpu")  # sitecustomize may force the TPU tunnel otherwise

import numpy as np

sys.path.insert(0, os.environ["REPO_ROOT"])

from rectools_tpu.parallel import DATA_AXIS, distributed as dist  # noqa: E402


def main() -> None:
    coordinator = sys.argv[1]
    process_id = int(sys.argv[2])
    dist.initialize(coordinator_address=coordinator, num_processes=2, process_id=process_id)
    assert dist.is_initialized()
    assert dist.process_count() == 2

    # 2 hosts x 2 local devices; model axis must stay within a host
    mesh = dist.make_multihost_mesh(n_model=2)
    assert mesh.shape[DATA_AXIS] == 2 and mesh.shape["model"] == 2
    for row in mesh.devices:  # each model group on one process
        assert len({d.process_index for d in row}) == 1, mesh.devices

    # host-local batch -> global array; rows are process-distinct
    global_batch = 8
    start, stop = dist.data_parallel_row_range(global_batch, mesh)
    assert stop - start == 4
    local = {"x": np.arange(start, stop, dtype=np.float32).reshape(4, 1)}
    device_batch = dist.host_local_batch_to_global(local, mesh, global_batch)

    @jax.jit
    def total(x):
        return x.sum()

    value = float(total(device_batch["x"]))
    expected = float(np.arange(global_batch, dtype=np.float32).sum())
    print(f"CHECK process={process_id} sum={value} expected={expected}", flush=True)
    assert value == expected, (value, expected)
    print(f"CHECK process={process_id} OK", flush=True)


if __name__ == "__main__":
    main()
