"""Every example script must run end-to-end on the CPU backend.

The examples are the documented user surface (README / docs point at them);
this guard keeps them from rotting as APIs move. Long-running scale knobs
are overridden through each script's own CLI/env where available.
"""

import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
EXAMPLES = sorted((REPO / "examples").glob("*.py"))

# per-script args to keep runtimes CI-sized
_ARGS = {
    "benchmark_scale.py": ["--users", "2000"],
}
# scripts that need the virtual multi-device mesh
_MESH = {"distributed.py"}
_TIMEOUT_S = 600


@pytest.mark.slow
@pytest.mark.parametrize("script", EXAMPLES, ids=lambda p: p.name)
def test_example_runs(script: Path) -> None:
    env = dict(os.environ)
    env["RECTOOLS_PLATFORM"] = "cpu"
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = str(REPO)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    if script.name in _MESH:
        env["XLA_FLAGS"] = env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    result = subprocess.run(
        [sys.executable, str(script), *(_ARGS.get(script.name, []))],
        capture_output=True,
        text=True,
        timeout=_TIMEOUT_S,
        env=env,
        cwd=REPO,
    )
    assert result.returncode == 0, f"{script.name} failed:\n{result.stdout[-2000:]}\n{result.stderr[-2000:]}"
