"""Roofline attribution of the KION train step (VERDICT r3 item 8).

For each timed slice of the step (towers fwd, towers fwd+bwd, loss fwd+bwd,
Adam, full step) this reports measured time against BOTH chip ceilings:

  flop bound   = slice FLOPs / bf16 peak        (XLA cost_analysis flops)
  byte bound   = slice HBM bytes / HBM peak     (XLA cost_analysis bytes accessed)

and states which bound the slice sits nearer — the "what fraction of
achievable does each op reach" table PERF_r02 was missing. FLOPs/bytes are
ANALYTIC itemizations (stated inline): XLA's cost_analysis cannot see inside
Pallas custom-calls (they are opaque custom-call HLOs), so hand math over the
known tensor streams is the only credible accounting.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/roofline_step.py
"""

import json
import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

CFG = dict(B=512, L=100, D=128, N=15872, heads=4, blocks=2)
# per-slice unroll lengths are set in main() (hi, lo pairs)

# v5e (TPU v5 lite) single-chip peaks
PEAK_BF16 = 197e12
PEAK_F32 = 98.5e12
PEAK_BW = 819e9


def log(msg: str) -> None:
    print(f"[roofline] {msg}", flush=True)


def _analytic_costs():
    """Per-step FLOPs and HBM bytes per slice, itemized.

    Shapes: M = B*L tokens, activations bf16 (2 B/el), attention scores f32,
    probabilities bf16 (ops/attention.py r3), loss kernels stream the item
    table per m-block (ops/softmax_lse.py)."""
    B, L, D, N, H, BLK = (CFG[k] for k in ("B", "L", "D", "N", "heads", "blocks"))
    M = B * L
    act = M * D * 2  # one (M, D) bf16 activation pass

    # ---- towers forward
    proj_flops = 4 * M * D * D * 2          # q,k,v,o projections
    ffn_flops = 2 * M * D * D * 2           # 2-layer pointwise FFN (mult=1)
    attn_flops = 2 * B * H * L * L * (D // H) * 2
    blk_flops = proj_flops + ffn_flops + attn_flops
    towers_fwd_flops = BLK * blk_flops + N * D * 4  # + item tower LN-ish
    # scores AND probs stream at the input precision since the r3 attention
    # change (ops/attention.py _reference_attention / _xla_bwd_math)
    score_b = B * H * L * L * 2
    prob_b = B * H * L * L * 2
    blk_bytes = (
        4 * 2 * act          # projections read+write
        + 3 * act            # q,k,v into attention
        + 2 * score_b        # scores write+read (input precision since r3)
        + 2 * prob_b         # probs write+read (bf16 since r3)
        + prob_b             # dropout mask materialized at prob dtype
        + 2 * 2 * act        # ffn read+write
        + 3 * 2 * act        # layernorms read+write
        + 3 * 2 * act        # residuals + elementwise dropout r/w
    )
    towers_fwd_bytes = BLK * blk_bytes + 3 * act  # + embedding gather + pos enc

    # ---- towers fwd+bwd: backward re-streams ~2x the forward tensors and
    # the xla_attention recompute VJP re-materializes scores once more
    towers_fwdbwd_flops = 3 * towers_fwd_flops
    towers_fwdbwd_bytes = 3 * towers_fwd_bytes + BLK * (2 * score_b)

    # ---- loss (streaming-lse fwd + grads-from-z bwd), chunk=(256, 4096)
    items_bytes = N * D * 2
    s_bytes = M * D * 2
    n_m = M // 256
    lse_fwd_flops = 2 * M * N * D
    lse_fwd_bytes = n_m * items_bytes + s_bytes  # item table streamed per m-block
    bwd_flops = 3 * 2 * M * N * D                # logit recompute + ds + di matmuls
    n_chunks = -(-N // 4096)
    dsp_partials = n_chunks * M * D * 2          # bf16 partials write + read
    bwd_bytes = n_m * 2 * items_bytes + s_bytes + 2 * dsp_partials + M * D * 4
    loss_flops = lse_fwd_flops + bwd_flops
    loss_bytes = lse_fwd_bytes + bwd_bytes

    # ---- adam (flattened): p, m, v read+write in f32 + grads read
    n_params = N * D + L * D + BLK * (4 * D * D + 2 * D * D + 8 * D) + 2 * D
    adam_bytes = n_params * 4 * (3 * 2 + 1)
    adam_flops = n_params * 12

    return {
        "towers_fwd": (towers_fwd_flops, towers_fwd_bytes),
        "towers_fwdbwd": (towers_fwdbwd_flops, towers_fwdbwd_bytes),
        "loss_fwdbwd": (loss_flops, loss_bytes),
        "adam": (adam_flops, adam_bytes),
        "full_step": (
            towers_fwdbwd_flops + loss_flops + adam_flops,
            towers_fwdbwd_bytes + loss_bytes + adam_bytes,
        ),
    }


def _fetch(out) -> float:
    import jax

    return float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])


def _time_diff(make_many, args, hi: int, lo: int, reps: int = 3) -> float:
    """Per-step seconds as a two-length difference of UNROLLED chains.

    `make_many(n)` returns a jitted function executing n data-chained
    applications of the slice in ONE dispatch (straight-line HLO, no
    lax.scan: the while-loop's per-iteration carry copies inflated small
    slices ~6x — the flat Adam slice measured 0.95 ms under scan vs
    0.15 ms dispatched directly). Timing (hi-step run) - (lo-step run)
    cancels the dispatch + value-fetch round trip through the tunnel;
    min over `reps` discards scheduling noise (additive, never negative).
    """
    f_hi, f_lo = make_many(hi), make_many(lo)
    for f in (f_lo, f_hi):
        _fetch(f(*args))
        _fetch(f(*args))
    best = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _fetch(f_hi(*args))
        t1 = time.perf_counter()
        _fetch(f_lo(*args))
        t2 = time.perf_counter()
        best.append(((t1 - t0) - (t2 - t1)) / (hi - lo))
    return min(best)


def main() -> None:
    import jax
    import jax.numpy as jnp
    import optax

    from __graft_entry__ import _build_flagship
    from rectools_tpu.models.nn.transformers.losses import fused_softmax_loss

    backbone = _build_flagship(
        n_items=CFG["N"], session_max_len=CFG["L"], n_factors=CFG["D"],
        n_heads=CFG["heads"], n_blocks=CFG["blocks"], dropout_rate=0.2,
    )
    rng = np.random.default_rng(0)
    batch = {
        "x": jnp.asarray(rng.integers(1, CFG["N"], size=(CFG["B"], CFG["L"]))),
        "y": jnp.asarray(rng.integers(1, CFG["N"], size=(CFG["B"], CFG["L"]))),
        "yw": jnp.ones((CFG["B"], CFG["L"]), jnp.float32),
    }
    params = backbone.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        {"x": batch["x"][:8]}, deterministic=False,
    )["params"]
    tx = optax.flatten(optax.adam(1e-3, b1=0.9, b2=0.98))
    opt_state = tx.init(params)

    def cast(p):
        return jax.tree.map(lambda x: x.astype(jnp.bfloat16) if jnp.issubdtype(x.dtype, jnp.floating) else x, p)

    def towers(module, b, det=False):
        item_embs = module.item_model.embed_catalog(deterministic=det)
        session_embs = module.encode_sessions(b, item_embs, deterministic=det)
        return session_embs, item_embs

    slices = {}

    def towers_fwd_once(p, b, i):
        rngs = {"dropout": jax.random.fold_in(jax.random.PRNGKey(7), i)}
        s_t, i_t = backbone.apply({"params": cast(p)}, b, method=towers, rngs=rngs)
        return (s_t.astype(jnp.float32).sum() + i_t.astype(jnp.float32).sum())

    def make_towers_fwd(n):
        @jax.jit
        def many(p, b):
            c = jnp.zeros((), jnp.float32)
            for i in range(n):  # distinct dropout fold per i: no CSE
                c = c + towers_fwd_once(p, b, i)
            return c
        return many

    slices["towers_fwd"] = (make_towers_fwd, (params, batch), 24, 8)

    def make_towers_fwdbwd(n):
        @jax.jit
        def many(p, b):
            c = jnp.zeros((), jnp.float32)
            for i in range(n):
                loss, grads = jax.value_and_grad(lambda p_: towers_fwd_once(p_, b, i))(p)
                c = c + loss + jax.tree.leaves(grads)[0].ravel()[0]
            return c
        return many

    slices["towers_fwdbwd"] = (make_towers_fwdbwd, (params, batch), 12, 4)

    rngs0 = {"dropout": jax.random.PRNGKey(7)}
    s_t0, i_t0 = backbone.apply({"params": cast(params)}, batch, method=towers, rngs=rngs0)

    def make_loss_fwdbwd(n):
        @jax.jit
        def many(st, it, b):
            c = jnp.zeros((), jnp.float32)
            for _ in range(n):
                def of(st_, it_):
                    return fused_softmax_loss(st_, it_, b["y"], b["yw"])
                loss, (ds, di) = jax.value_and_grad(of, argnums=(0, 1))(st, it)
                c = c + loss
                st = st + (0.0 * ds).astype(st.dtype)  # data-chain the iterations
            return c
        return many

    slices["loss_fwdbwd"] = (make_loss_fwdbwd, (s_t0, i_t0, batch), 12, 4)

    grads0 = jax.tree.map(jnp.ones_like, params)

    def make_adam(n):
        @jax.jit
        def many(g, o, p):
            c = jnp.zeros((), jnp.float32)
            for _ in range(n):  # (p, o) chain through every update: no CSE
                upd, o = tx.update(g, o, p)
                p = optax.apply_updates(p, upd)
            return c + jax.tree.leaves(p)[0].ravel()[0]
        return many

    slices["adam"] = (make_adam, (grads0, opt_state, params), 96, 24)

    def make_full(n):
        @jax.jit
        def many(p, o, b):
            c = jnp.zeros((), jnp.float32)
            for i in range(n):  # real training chain: p/o evolve each step
                def of(p_):
                    rngs = {"dropout": jax.random.fold_in(jax.random.PRNGKey(7), i)}
                    s_t, i_t = backbone.apply({"params": cast(p_)}, b, method=towers, rngs=rngs)
                    return fused_softmax_loss(s_t, i_t, b["y"], b["yw"])
                loss, grads = jax.value_and_grad(of)(p)
                upd, o = tx.update(grads, o, p)
                p = optax.apply_updates(p, upd)
                c = c + loss
            return c
        return many

    slices["full_step"] = (make_full, (params, opt_state, batch), 10, 4)

    rows = {}
    costs = _analytic_costs()
    for name, (make_many, args, hi, lo) in slices.items():
        flops, bytes_ = costs[name]
        dt = _time_diff(make_many, args, hi, lo)
        flop_bound_s = flops / PEAK_BF16
        byte_bound_s = bytes_ / PEAK_BW
        bound = "compute" if flop_bound_s >= byte_bound_s else "memory"
        frac = max(flop_bound_s, byte_bound_s) / dt
        rows[name] = {
            "ms": round(dt * 1e3, 3),
            "gflops": round(flops / 1e9, 1),
            "hbm_mb": round(bytes_ / 1e6, 1),
            "tflops_s": round(flops / dt / 1e12, 1),
            "gb_s": round(bytes_ / dt / 1e9, 1),
            "flop_bound_ms": round(flop_bound_s * 1e3, 3),
            "byte_bound_ms": round(byte_bound_s * 1e3, 3),
            "nearest_bound": bound,
            "frac_of_achievable": round(frac, 3),
        }
        log(f"{name:14s} {rows[name]}")

    Path(REPO / "benchmarks/results_roofline_step.json").write_text(
        json.dumps({"config": {**CFG, "compute_dtype": "bfloat16"},
                    "peaks": {"bf16_flops": PEAK_BF16, "hbm_bw": PEAK_BW},
                    "slices": rows}, indent=1)
    )
    log("wrote benchmarks/results_roofline_step.json")


if __name__ == "__main__":
    main()
