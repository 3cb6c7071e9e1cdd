"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is unavailable in CI; sharding correctness is
validated on fake CPU devices (the "fake backend" the reference never had —
SURVEY.md §4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ.setdefault("JAX_ENABLE_X64", "0")
# Persistent compilation cache: test shapes are stable across runs, so
# cached executables cut suite time drastically.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_compilation_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")

# Some CI images install a TPU-tunnel PJRT plugin through sitecustomize that
# calls jax.config.update("jax_platforms", ...) at interpreter start, which
# overrides the env var above. Re-assert the CPU platform through the config
# API after importing jax — the last write before first backend use wins.
import jax  # noqa: E402

try:
    jax.config.update("jax_platforms", "cpu")
except Exception:  # pragma: no cover - config name drift
    pass


# Enforce the `timeout` marker (pyproject declares it; no plugin installed):
# SIGALRM interrupts a hung test at its declared bound instead of hanging CI.
import signal  # noqa: E402

import pytest  # noqa: E402


@pytest.hookimpl(hookwrapper=True)
def pytest_runtest_call(item):
    marker = item.get_closest_marker("timeout")
    seconds = int(marker.args[0]) if marker and marker.args else 0
    if seconds > 0 and hasattr(signal, "SIGALRM"):
        def _on_timeout(signum, frame):
            raise TimeoutError(f"test exceeded its timeout marker ({seconds}s)")

        previous = signal.signal(signal.SIGALRM, _on_timeout)
        signal.alarm(seconds)
        try:
            yield
        finally:
            signal.alarm(0)
            signal.signal(signal.SIGALRM, previous)
    else:
        yield
