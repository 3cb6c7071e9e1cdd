"""Decompose the KION train step into timed slices -> where does the time go?

PERF_r02.md shows the end-to-end KION bf16 step at 22.5 ms (31 TFLOP/s, ~16%
bf16 MFU) while the streaming-lse loss kernel alone sustains ~96 TFLOP/s.
This harness times the pieces separately at the exact KION config so the
remaining optimization target is attributed, not guessed:

  full            complete train step (towers + streaming-lse + adam)
  towers_fwd      session/item towers forward only
  towers_fwdbwd   towers + surrogate-sum loss fwd+bwd (embedding scatter-add
                  and all transformer backward included, loss excluded)
  loss_fwdbwd     streaming-lse fwd+bwd on frozen tower outputs
  adam_only       optimizer update on fixed gradients
  full_nodrop     complete step with dropout off (isolates RNG/mask cost)

Slices overlap by design (full ~= towers_fwdbwd + loss_fwdbwd + adam_only);
the residual is interaction/fusion effects.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/step_decomposition.py
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
STEPS = 30
T0 = time.time()


def log(msg: str) -> None:
    print(f"[decomp +{time.time() - T0:7.1f}s] {msg}", flush=True)


def _setup(dropout_rate=0.2, compute_dtype="bfloat16"):
    import jax
    import jax.numpy as jnp
    import optax

    from __graft_entry__ import _build_flagship

    backbone = _build_flagship(
        n_items=CFG["N"], session_max_len=CFG["L"], n_factors=CFG["D"],
        n_heads=CFG["heads"], n_blocks=CFG["blocks"], dropout_rate=dropout_rate,
    )
    rng = np.random.default_rng(0)
    batch = {
        "x": jnp.asarray(rng.integers(1, CFG["N"], size=(CFG["B"], CFG["L"]))),
        "y": jnp.asarray(rng.integers(1, CFG["N"], size=(CFG["B"], CFG["L"]))),
        "yw": jnp.ones((CFG["B"], CFG["L"]), jnp.float32),
    }
    params = backbone.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        {"x": batch["x"]}, deterministic=dropout_rate == 0.0,
    )["params"]
    tx = optax.flatten(optax.adam(1e-3, b1=0.9, b2=0.98))  # mirrors training._make_optimizer
    work = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
    return backbone, batch, params, tx, work


def _time_scan(body, init_carry):
    """Two-window differenced ms/step of `body` on device.

    The remote transport charges a fixed ~25-30 ms per dispatch+fetch
    regardless of dispatched work; timing one STEPS-size window would
    inflate each slice by ~1 ms/step at STEPS=30 — larger than some of the
    slices themselves. Per-step time is the slope between a STEPS and a
    4*STEPS window (median-of-3 paired slopes); the fixed round trip
    cancels exactly. Sync is a host VALUE fetch (block_until_ready can
    acknowledge early through the tunnel)."""
    import jax
    import jax.numpy as jnp

    def make_many(n_steps):
        @partial(jax.jit, donate_argnums=(0,))
        def many(carry):
            carry, outs = jax.lax.scan(body, carry, jnp.arange(n_steps))
            return carry, outs[-1]

        return many

    small, large = make_many(STEPS), make_many(4 * STEPS)
    # donation consumes the carry buffers — deep-copy so callers can reuse
    # the same params tree across slices
    carry = jax.tree.map(jnp.array, init_carry)
    for _ in range(2):
        carry, probe = small(carry)
        carry, probe = large(carry)
    float(jax.numpy.asarray(probe).ravel()[0].astype(jax.numpy.float32))
    slopes = []
    for _ in range(3):
        t0 = time.perf_counter()
        carry, probe = small(carry)
        float(jax.numpy.asarray(probe).ravel()[0].astype(jax.numpy.float32))
        t_small = time.perf_counter() - t0
        t0 = time.perf_counter()
        carry, probe = large(carry)
        float(jax.numpy.asarray(probe).ravel()[0].astype(jax.numpy.float32))
        t_large = time.perf_counter() - t0
        slopes.append((t_large - t_small) / (3 * STEPS) * 1e3)
    slopes.sort()
    return slopes[len(slopes) // 2]  # ms/step


def main() -> None:
    import jax
    import jax.numpy as jnp
    import optax

    from rectools_tpu.models.nn.transformers.losses import fused_softmax_loss

    log(f"devices: {jax.devices()}")
    results = {}

    for label, dropout in (("full", 0.2), ("full_nodrop", 0.0)):
        backbone, batch, params, tx, work = _setup(dropout_rate=dropout)
        opt_state = tx.init(params)

        def towers(module, batch, det=dropout == 0.0):
            item_embs = module.item_model.embed_catalog(deterministic=det)
            session_embs = module.encode_sessions(batch, item_embs, deterministic=det)
            return session_embs, item_embs

        def full_body(carry, step_idx, backbone=backbone, batch=batch, tx=tx,
                      towers=towers, work=work, dropout=dropout):
            params, opt_state = carry

            def loss_of(p):
                p = jax.tree.map(lambda x: x.astype(work) if jnp.issubdtype(x.dtype, jnp.floating) else x, p)
                rngs = None if dropout == 0.0 else {"dropout": jax.random.fold_in(jax.random.PRNGKey(7), step_idx)}
                s_t, i_t = backbone.apply({"params": p}, batch, method=towers, rngs=rngs)
                return fused_softmax_loss(s_t.astype(work), i_t.astype(work), batch["y"], batch["yw"], chunk=2048)

            loss, grads = jax.value_and_grad(loss_of)(params)
            updates, opt_state2 = tx.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state2), loss

        results[label] = _time_scan(full_body, (params, opt_state))
        log(f"{label}: {results[label]:.3f} ms/step")

    backbone, batch, params, tx, work = _setup(dropout_rate=0.2)

    def towers(module, batch):
        item_embs = module.item_model.embed_catalog(deterministic=False)
        session_embs = module.encode_sessions(batch, item_embs, deterministic=False)
        return session_embs, item_embs

    def cast(p):
        return jax.tree.map(lambda x: x.astype(work) if jnp.issubdtype(x.dtype, jnp.floating) else x, p)

    def towers_fwd_body(carry, step_idx):
        params = carry
        rngs = {"dropout": jax.random.fold_in(jax.random.PRNGKey(7), step_idx)}
        s_t, i_t = backbone.apply({"params": cast(params)}, batch, method=towers, rngs=rngs)
        return params, (s_t.sum() + i_t.sum()).astype(jnp.float32)

    results["towers_fwd"] = _time_scan(towers_fwd_body, params)
    log(f"towers_fwd: {results['towers_fwd']:.3f} ms/step")

    def towers_fwd_nodrop_body(carry, step_idx):
        params = carry
        # step-dependence threaded into the params: without rngs the body is
        # loop-invariant and XLA hoists it out of the scan (the slice would
        # measure ~0 under differenced timing, and pure dispatch round trip
        # under single-window timing)
        eps = (1.0 + 1e-9 * step_idx.astype(jnp.float32))

        def det_towers(module, batch):
            item_embs = module.item_model.embed_catalog(deterministic=True)
            session_embs = module.encode_sessions(batch, item_embs, deterministic=True)
            return session_embs, item_embs

        p = jax.tree.map(
            lambda x: x * eps.astype(x.dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x,
            cast(params),
        )
        s_t, i_t = backbone.apply({"params": p}, batch, method=det_towers)
        return params, (s_t.sum() + i_t.sum()).astype(jnp.float32)

    results["towers_fwd_nodrop"] = _time_scan(towers_fwd_nodrop_body, params)
    log(f"towers_fwd_nodrop: {results['towers_fwd_nodrop']:.3f} ms/step")

    # what flax Dropout costs by itself: the train step draws ~6 (B, L, D)
    # threefry masks per forward (2 blocks x [attn-out, ffn, ffn-out])
    def masks_body(carry, step_idx):
        key = jax.random.fold_in(carry, step_idx)
        tot = jnp.zeros((), jnp.float32)
        for i in range(6):
            m = jax.random.bernoulli(jax.random.fold_in(key, i), 0.8, (CFG["B"], CFG["L"], CFG["D"]))
            tot = tot + m.sum(dtype=jnp.float32)
        return carry, tot

    results["threefry_masks_x6"] = _time_scan(masks_body, jax.random.PRNGKey(3))
    log(f"threefry_masks_x6: {results['threefry_masks_x6']:.3f} ms/step")

    def towers_fwdbwd_body(carry, step_idx):
        params = carry

        def surrogate(p):
            rngs = {"dropout": jax.random.fold_in(jax.random.PRNGKey(7), step_idx)}
            s_t, i_t = backbone.apply({"params": cast(p)}, batch, method=towers, rngs=rngs)
            # multiply by per-row weights so the backward keeps the same
            # dataflow shape (scatter into both towers) without the loss math
            return (s_t.astype(jnp.float32).sum() + i_t.astype(jnp.float32).sum())

        loss, grads = jax.value_and_grad(surrogate)(params)
        leaf = jax.tree.leaves(grads)[0]
        return params, loss + leaf.ravel()[0]

    results["towers_fwdbwd"] = _time_scan(towers_fwdbwd_body, params)
    log(f"towers_fwdbwd: {results['towers_fwdbwd']:.3f} ms/step")

    # loss on frozen towers: differentiate w.r.t. tower OUTPUTS
    rngs = {"dropout": jax.random.PRNGKey(7)}
    s_t0, i_t0 = backbone.apply({"params": cast(params)}, batch, method=towers, rngs=rngs)
    s_t0, i_t0 = s_t0.astype(work), i_t0.astype(work)

    def loss_body(carry, step_idx):
        s_t, i_t = carry

        def loss_of(st, it):
            return fused_softmax_loss(st, it, batch["y"], batch["yw"], chunk=2048)

        loss, (ds, di) = jax.value_and_grad(loss_of, argnums=(0, 1))(s_t, i_t)
        # fold grads back so the scan carry depends on the computation
        return (s_t + 0.0 * ds, i_t + 0.0 * di), loss

    results["loss_fwdbwd"] = _time_scan(loss_body, (s_t0, i_t0))
    log(f"loss_fwdbwd: {results['loss_fwdbwd']:.3f} ms/step")

    grads0 = jax.tree.map(jnp.ones_like, params)
    opt_state0 = tx.init(params)

    def adam_body(carry, step_idx):
        params, opt_state = carry
        updates, opt_state2 = tx.update(grads0, opt_state, params)
        params2 = optax.apply_updates(params, updates)
        return (params2, opt_state2), jax.tree.leaves(params2)[0].ravel()[0]

    results["adam_only"] = _time_scan(adam_body, (params, opt_state0))
    log(f"adam_only: {results['adam_only']:.3f} ms/step")

    # flattened optimizer: one fused update over a single contiguous vector
    tx_flat = optax.flatten(optax.adam(1e-3, b1=0.9, b2=0.98))
    opt_state_flat = tx_flat.init(params)

    def adam_flat_body(carry, step_idx):
        params, opt_state = carry
        updates, opt_state2 = tx_flat.update(grads0, opt_state, params)
        params2 = optax.apply_updates(params, updates)
        return (params2, opt_state2), jax.tree.leaves(params2)[0].ravel()[0]

    results["adam_flat"] = _time_scan(adam_flat_body, (params, opt_state_flat))
    log(f"adam_flat: {results['adam_flat']:.3f} ms/step")

    out = Path(__file__).with_name("results_step_decomposition.json")
    out.write_text(json.dumps({"config": {**CFG, "compute_dtype": "bfloat16"}, "steps": STEPS, "ms_per_step": results}, indent=1))
    log(f"wrote {out}")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
