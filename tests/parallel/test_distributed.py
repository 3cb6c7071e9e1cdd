"""Multi-host module test: a real 2-process jax.distributed CPU cluster
(each process simulating one host with 2 local devices) exercises
initialization, the DCN x ICI mesh layout, and global batch assembly."""

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

REPO_ROOT = str(Path(__file__).resolve().parents[2])
WORKER = str(Path(__file__).parent / "_distributed_worker.py")


def _free_port() -> int:
    with socket.socket() as sock:
        sock.bind(("127.0.0.1", 0))
        return sock.getsockname()[1]


@pytest.mark.timeout(300)
def test_two_process_cpu_cluster() -> None:
    coordinator = f"127.0.0.1:{_free_port()}"
    env = {k: v for k, v in os.environ.items() if k != "PALLAS_AXON_POOL_IPS"}
    env["REPO_ROOT"] = REPO_ROOT
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, coordinator, str(pid)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for pid in range(2)
    ]
    outputs = []
    for proc in procs:
        try:
            out, _ = proc.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for p in procs:
                p.kill()
            raise
        outputs.append(out)
    for pid, (proc, out) in enumerate(zip(procs, outputs)):
        assert proc.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"CHECK process={pid} OK" in out, out


def test_single_process_initialize_is_noop() -> None:
    from rectools_tpu.parallel import distributed as dist

    dist.initialize()  # no coordinator, single process -> must not start a cluster
    assert not dist.is_initialized()


def test_row_range_single_process_covers_batch() -> None:
    from rectools_tpu.parallel import distributed as dist
    from rectools_tpu.parallel import make_mesh

    mesh = make_mesh()
    start, stop = dist.data_parallel_row_range(16, mesh)
    assert (start, stop) == (0, 16)  # one process feeds everything
