"""Attribute the towers fwd+bwd slice (step_decomposition: ~10 ms at KION).

Times the tower's constituent patterns in isolation at the exact KION shapes
so the non-attention, non-loss time is attributed:

  embed_gather_fwd    table[x] gather only
  embed_fwdbwd        gather + scatter-add gradient into the (N, D) table
  matmul_chain        the 12 (M, D) x (D, D) projection/FFN matmuls, fwd+bwd
  ln_stack            5 LayerNorms over (B, L, D), fwd+bwd
  attn_in_situ        fused attention kernel fwd+bwd at (B, H, L, dh)

Run:  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/towers_micro.py
"""

import json
import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

B, L, D, N, H = 512, 100, 128, 15872, 4
M = B * L
STEPS = 30
T0 = time.time()


def log(msg: str) -> None:
    print(f"[towers +{time.time() - T0:7.1f}s] {msg}", flush=True)


def _time_scan(body, init_carry):
    """Two-window differenced ms/step (cancels the transport's fixed
    ~25-30 ms dispatch+fetch round trip; see step_decomposition._time_scan)."""
    import jax
    import jax.numpy as jnp

    def make_many(n_steps):
        @partial(jax.jit, donate_argnums=(0,))
        def many(carry):
            carry, outs = jax.lax.scan(body, carry, jnp.arange(n_steps))
            return carry, outs[-1]

        return many

    small, large = make_many(STEPS), make_many(4 * STEPS)
    carry = jax.tree.map(jnp.array, init_carry)
    for _ in range(2):
        carry, probe = small(carry)
        carry, probe = large(carry)
    float(jnp.asarray(probe).ravel()[0].astype(jnp.float32))
    slopes = []
    for _ in range(3):
        t0 = time.perf_counter()
        carry, probe = small(carry)
        float(jnp.asarray(probe).ravel()[0].astype(jnp.float32))
        t_small = time.perf_counter() - t0
        t0 = time.perf_counter()
        carry, probe = large(carry)
        float(jnp.asarray(probe).ravel()[0].astype(jnp.float32))
        t_large = time.perf_counter() - t0
        slopes.append((t_large - t_small) / (3 * STEPS) * 1e3)
    slopes.sort()
    return slopes[len(slopes) // 2]


def main() -> None:
    import jax
    import jax.numpy as jnp

    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(1, N, size=(B, L)))
    results = {}

    table0 = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))

    def gather_body(carry, step_idx):
        table = carry
        out = table[x] * (1.0 + 1e-9 * step_idx.astype(jnp.float32))
        return table, out.sum()

    results["embed_gather_fwd"] = _time_scan(gather_body, table0)
    log(f"embed_gather_fwd: {results['embed_gather_fwd']:.3f} ms/step")

    def embed_fwdbwd_body(carry, step_idx):
        table = carry

        def loss(t):
            return (t[x] * (1.0 + 1e-9 * step_idx.astype(jnp.float32))).sum()

        val, g = jax.value_and_grad(loss)(table)
        return table + 0.0 * g, val

    results["embed_fwdbwd"] = _time_scan(embed_fwdbwd_body, table0)
    log(f"embed_fwdbwd: {results['embed_fwdbwd']:.3f} ms/step")

    ws0 = [jnp.asarray(rng.normal(size=(D, D)).astype(np.float32) * 0.05) for _ in range(12)]
    h0 = jnp.asarray(rng.normal(size=(M, D)).astype(np.float32))

    def matmul_body(carry, step_idx):
        ws = carry

        def loss(ws):
            h = h0 * (1.0 + 1e-9 * step_idx.astype(jnp.float32))
            for w in ws:
                h = jnp.tanh(h @ w)
            return h.sum()

        val, g = jax.value_and_grad(loss)(ws)
        return [w + 0.0 * gw for w, gw in zip(ws, g)], val

    results["matmul_chain"] = _time_scan(matmul_body, ws0)
    log(f"matmul_chain: {results['matmul_chain']:.3f} ms/step")

    def ln(p, h):
        mu = h.mean(-1, keepdims=True)
        var = ((h - mu) ** 2).mean(-1, keepdims=True)
        return (h - mu) / jnp.sqrt(var + 1e-6) * p["g"] + p["b"]

    lnp0 = {"g": jnp.ones((D,)), "b": jnp.zeros((D,))}
    h3 = jnp.asarray(rng.normal(size=(B, L, D)).astype(np.float32))

    def ln_body(carry, step_idx):
        p = carry

        def loss(p):
            h = h3 * (1.0 + 1e-9 * step_idx.astype(jnp.float32))
            for _ in range(5):
                h = ln(p, h)
            return h.sum()

        val, g = jax.value_and_grad(loss)(p)
        return jax.tree.map(lambda a, b: a + 0.0 * b, p, g), val

    results["ln_stack"] = _time_scan(ln_body, lnp0)
    log(f"ln_stack: {results['ln_stack']:.3f} ms/step")

    from rectools_tpu.ops.attention import fused_attention

    dh = D // H
    q0 = jnp.asarray(rng.normal(size=(B, H, L, dh)).astype(np.float32))
    bias = jnp.asarray(np.where(np.tril(np.ones((L, L))), 0.0, -1e9).astype(np.float32))[None, None]

    def attn_body(carry, step_idx):
        q = carry

        def loss(q):
            seed = step_idx.astype(jnp.int32).reshape(1)
            out = fused_attention(q, q, q, bias, seed, scale=1.0 / dh**0.5, dropout_rate=0.2, bias_has_grad=False)
            return out.astype(jnp.float32).sum()

        val, g = jax.value_and_grad(loss)(q)
        return q + 0.0 * g, val

    results["attn_in_situ"] = _time_scan(attn_body, q0)
    log(f"attn_in_situ: {results['attn_in_situ']:.3f} ms/step")

    out = Path(__file__).with_name("results_towers_micro.json")
    out.write_text(json.dumps({"shapes": dict(B=B, L=L, D=D, N=N, H=H), "ms_per_step": results}, indent=1))
    log(f"wrote {out}")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
