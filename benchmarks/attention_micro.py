"""Micro-benchmark: fused Pallas attention vs the XLA-math path, fwd+bwd.

Motivation: at the headline bench shapes (B=512, H=4, L=100, dh=32) the
Pallas forward launches B*H = 2048 programs of one tiny (100, 32) matmul
each — per-program overhead, not FLOPs, may dominate. This sweep measures
both paths across L to (a) quantify that overhead and (b) place the
dispatch crossover for `dot_product_attention`.

Timing through the axon tunnel follows the repo rule: one dispatch runs
STEPS iterations in a lax.scan with step-dependence threaded into q (so the
body is not hoisted), and the clock closes on a host value fetch.
"""

import json
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from rectools_tpu.ops.attention import _reference_attention, fused_attention

STEPS = 20


def bench(fn, *args) -> float:
    """ms per iteration of fn(*args) -> scalar, fwd+bwd, scan-timed.

    Two-window differenced (STEPS vs 4*STEPS): the transport's fixed
    ~25-30 ms dispatch+fetch round trip cancels in the slope — at STEPS=20
    it would otherwise add ~1.3 ms to every kernel, swamping short-L rows."""

    def make_run(n_steps):
        @jax.jit
        def run(q, rest):
            def body(carry, i):
                qi = q * (1.0 + 1e-9 * i.astype(q.dtype))

                def loss(qq):
                    return fn(qq, *rest)

                val, grad = jax.value_and_grad(loss)(qi)
                return carry + val + grad.sum(), None

            acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(n_steps))
            return acc

        return run

    q, *rest = args
    small, large = make_run(STEPS), make_run(4 * STEPS)
    float(small(q, rest)), float(large(q, rest))  # compile + settle
    slopes = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(small(q, rest))
        t_small = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(large(q, rest))
        t_large = time.perf_counter() - t0
        slopes.append((t_large - t_small) / (3 * STEPS) * 1e3)
    slopes.sort()
    return slopes[len(slopes) // 2]


def main() -> None:
    results = []
    for b, h, l, dh, dropout in [
        (512, 4, 100, 32, 0.2),
        (512, 4, 100, 32, 0.0),
        (128, 4, 256, 32, 0.2),
        (32, 4, 512, 32, 0.2),
        (8, 4, 1024, 32, 0.2),
        (512, 4, 100, 64, 0.2),
    ]:
        rng = np.random.default_rng(0)
        shape = (b, h, l, dh)
        q = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        k = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        v = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        causal = jnp.where(
            jnp.tril(jnp.ones((l, l), bool))[None, None], 0.0, -1e9
        ).astype(jnp.float32)
        seed = jnp.zeros((1,), jnp.int32)
        scale = 1.0 / np.sqrt(dh)

        def pallas_loss(qq, kk, vv):
            return fused_attention(qq, kk, vv, causal, seed, scale, dropout, 128, False, False).sum()

        def xla_loss(qq, kk, vv):
            out, _ = _reference_attention(qq, kk, vv, causal, scale, dropout, seed)
            return out.sum()

        ms_pallas = bench(pallas_loss, q, k, v)
        ms_xla = bench(xla_loss, q, k, v)
        row = {
            "shape": f"B{b} H{h} L{l} dh{dh} p{dropout}",
            "pallas_ms": round(ms_pallas, 3),
            "xla_ms": round(ms_xla, 3),
            "xla_over_pallas": round(ms_pallas / ms_xla, 2),
        }
        print(json.dumps(row), flush=True)
        results.append(row)


if __name__ == "__main__":
    main()
