"""Profiling and roofline utilities.

The reference library has no tracing/profiling at all (SURVEY.md §5 — only
tqdm bars); serving and training at production scale need both. This module
wraps the jax profiler for trace capture and provides a simple roofline
report: achieved FLOP/s and HBM bandwidth vs the device's peak.
"""

import contextlib
import time
import typing as tp

import jax

# (peak_flops_bf16, peak_flops_f32, hbm_bytes_per_s) by device kind substring.
# Public bf16 MXU peaks: v4 275 TFLOP/s @ 1.2 TB/s; v5e 197 TFLOP/s @
# 0.82 TB/s (the oft-quoted 394 is the int8 figure); v5p 459 TFLOP/s @
# 2.77 TB/s; v6e 918 TFLOP/s @ 1.64 TB/s. "f32" rows are the effective
# highest-precision matmul rate (~half of bf16 — f32 runs as multi-pass
# bf16 on the MXU).
_DEVICE_PEAKS: tp.Dict[str, tp.Tuple[float, float, float]] = {
    "v4": (275e12, 137.5e12, 1.2e12),
    "v5 lite": (197e12, 98.5e12, 0.82e12),
    "v5e": (197e12, 98.5e12, 0.82e12),
    "v5p": (459e12, 229.5e12, 2.77e12),
    "v6": (918e12, 459e12, 1.64e12),
    "cpu": (1e12, 5e11, 1e11),  # rough host figures so reports stay readable
}


def device_peaks(device: tp.Optional[jax.Device] = None) -> tp.Tuple[float, float, float]:
    """(peak bf16 FLOP/s, peak f32 FLOP/s, peak HBM B/s) for a device."""
    if device is None:
        device = jax.devices()[0]
    kind = getattr(device, "device_kind", "cpu").lower()
    for key, peaks in _DEVICE_PEAKS.items():
        if key in kind:
            return peaks
    return _DEVICE_PEAKS["cpu"]


@contextlib.contextmanager
def trace(log_dir: str) -> tp.Iterator[None]:
    """Capture a jax profiler trace viewable in TensorBoard / Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class RooflineReport(tp.NamedTuple):
    """Measured kernel performance vs device peaks."""

    seconds_per_call: float
    achieved_flops: tp.Optional[float]
    flops_fraction_of_peak: tp.Optional[float]
    achieved_bandwidth: tp.Optional[float]
    bandwidth_fraction_of_peak: tp.Optional[float]
    bound: str

    def __str__(self) -> str:
        parts = [f"{self.seconds_per_call * 1e6:.1f} us/call"]
        if self.achieved_flops is not None:
            parts.append(
                f"{self.achieved_flops / 1e12:.2f} TFLOP/s ({self.flops_fraction_of_peak:.1%} of peak)"
            )
        if self.achieved_bandwidth is not None:
            parts.append(
                f"{self.achieved_bandwidth / 1e9:.1f} GB/s ({self.bandwidth_fraction_of_peak:.1%} of peak)"
            )
        parts.append(f"{self.bound}-bound")
        return "  ".join(parts)


def roofline(
    fn: tp.Callable[..., tp.Any],
    *args: tp.Any,
    flops: tp.Optional[float] = None,
    bytes_accessed: tp.Optional[float] = None,
    n_iters: int = 20,
    warmup: int = 2,
    use_f32_peak: bool = True,
) -> RooflineReport:
    """Time a (jitted) function and report where it sits on the roofline.

    Pass the op's FLOP count and/or HBM traffic; fractions are computed
    against the current device's peaks.
    """
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n_iters

    peak_bf16, peak_f32, peak_bw = device_peaks()
    peak_flops = peak_f32 if use_f32_peak else peak_bf16

    achieved_flops = flops / dt if flops is not None else None
    flops_frac = achieved_flops / peak_flops if achieved_flops is not None else None
    achieved_bw = bytes_accessed / dt if bytes_accessed is not None else None
    bw_frac = achieved_bw / peak_bw if achieved_bw is not None else None

    if flops_frac is not None and bw_frac is not None:
        bound = "compute" if flops_frac >= bw_frac else "memory"
    elif flops_frac is not None:
        bound = "compute"
    elif bw_frac is not None:
        bound = "memory"
    else:
        bound = "unknown"
    return RooflineReport(dt, achieved_flops, flops_frac, achieved_bw, bw_frac, bound)
