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
    """ms per iteration of fn(*args) -> scalar, fwd+bwd, scan-timed."""

    @jax.jit
    def run(q, rest):
        def body(carry, i):
            qi = q * (1.0 + 1e-9 * i.astype(q.dtype))

            def loss(qq):
                return fn(qq, *rest)

            val, grad = jax.value_and_grad(loss)(qi)
            return carry + val + grad.sum(), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(STEPS))
        return acc

    q, *rest = args
    acc = run(q, rest)
    float(acc)  # compile + settle
    t0 = time.perf_counter()
    acc = run(q, rest)
    float(acc)  # host value fetch = trustworthy sync
    return (time.perf_counter() - t0) / STEPS * 1e3


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
