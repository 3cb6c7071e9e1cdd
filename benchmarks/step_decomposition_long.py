"""Decompose the long-context and remat train steps (VERDICT r4 item 8).

PERF_r04 left two rows without floor analyses: train_long_ctx (B=64, L=1024,
0.209 MFU) and train_ml20m_b512_remat_bf16 (0.254 MFU). This harness times
their pieces at the exact configs so the MFU deficit is attributed:

long_ctx (B=64, L=1024, D=128, N=15872, bf16):
  full / towers_fwd / towers_fwdbwd / loss_fwdbwd / adam_only
ml20m_remat (B=512, L=200, D=256, N=20480, bf16, remat towers):
  full_remat / full_b256_noremat (the fits-in-HBM half-batch) /
  towers_fwdbwd_b256 / loss_fwdbwd / adam_only

Timing protocol: two-window differenced (see step_decomposition._time_scan).

Run:  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/step_decomposition_long.py
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "benchmarks"))

from step_decomposition import _time_scan  # noqa: E402

T0 = time.time()


def log(msg: str) -> None:
    print(f"[long-decomp +{time.time() - T0:7.1f}s] {msg}", flush=True)


def _make(cfg, dropout=0.2):
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build_flagship

    backbone = _build_flagship(
        n_items=cfg["N"], session_max_len=cfg["L"], n_factors=cfg["D"],
        n_heads=cfg["heads"], n_blocks=cfg["blocks"], dropout_rate=dropout,
    )
    rng = np.random.default_rng(0)
    batch = {
        "x": jnp.asarray(rng.integers(1, cfg["N"], size=(cfg["B"], cfg["L"]))),
        "y": jnp.asarray(rng.integers(1, cfg["N"], size=(cfg["B"], cfg["L"]))),
        "yw": jnp.ones((cfg["B"], cfg["L"]), jnp.float32),
    }
    params = backbone.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        {"x": batch["x"][:8]}, deterministic=False,
    )["params"]
    return backbone, batch, params


def _slices(cfg, label_prefix, remat=False, also_full=True):
    import jax
    import jax.numpy as jnp
    import optax

    from rectools_tpu.models.nn.transformers.losses import fused_softmax_loss

    backbone, batch, params = _make(cfg)
    tx = optax.flatten(optax.adam(1e-3, b1=0.9, b2=0.98))
    opt_state = tx.init(params)
    out = {}

    def cast(p):
        return jax.tree.map(lambda x: x.astype(jnp.bfloat16) if jnp.issubdtype(x.dtype, jnp.floating) else x, p)

    def towers(module, b):
        item_embs = module.item_model.embed_catalog(deterministic=False)
        session_embs = module.encode_sessions(b, item_embs, deterministic=False)
        return session_embs, item_embs

    def towers_value(p, b, r):
        return backbone.apply({"params": p}, b, method=towers, rngs=r)

    tv = jax.checkpoint(towers_value) if remat else towers_value

    if also_full:
        def full_body(carry, step_idx):
            params, opt_state = carry

            def loss_of(p):
                rngs = {"dropout": jax.random.fold_in(jax.random.PRNGKey(7), step_idx)}
                s_t, i_t = tv(cast(p), batch, rngs)
                return fused_softmax_loss(
                    s_t.astype(jnp.bfloat16), i_t.astype(jnp.bfloat16), batch["y"], batch["yw"], chunk=2048
                )

            loss, grads = jax.value_and_grad(loss_of)(params)
            updates, opt_state2 = tx.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state2), loss

        out[f"{label_prefix}_full"] = _time_scan(full_body, (params, opt_state))
        log(f"{label_prefix}_full: {out[f'{label_prefix}_full']:.3f} ms/step")

    def towers_fwdbwd_body(carry, step_idx):
        p0 = carry

        def surrogate(p):
            rngs = {"dropout": jax.random.fold_in(jax.random.PRNGKey(7), step_idx)}
            s_t, i_t = tv(cast(p), batch, rngs)
            return s_t.astype(jnp.float32).sum() + i_t.astype(jnp.float32).sum()

        loss, grads = jax.value_and_grad(surrogate)(p0)
        return p0, loss + jax.tree.leaves(grads)[0].ravel()[0]

    try:
        out[f"{label_prefix}_towers_fwdbwd"] = _time_scan(towers_fwdbwd_body, params)
        log(f"{label_prefix}_towers_fwdbwd: {out[f'{label_prefix}_towers_fwdbwd']:.3f} ms/step")
    except Exception as exc:  # keep the rest of the suite alive
        log(f"{label_prefix}_towers_fwdbwd FAILED: {str(exc)[:160]}")

    rng = np.random.default_rng(5)
    s_t0 = jnp.asarray(rng.normal(0, 1, (cfg["B"], cfg["L"], cfg["D"])), jnp.bfloat16)
    i_t0 = jnp.asarray(rng.normal(0, 1, (cfg["N"], cfg["D"])), jnp.bfloat16)

    def loss_body(carry, step_idx):
        s_t, i_t = carry

        def loss_of(st, it):
            return fused_softmax_loss(st, it, batch["y"], batch["yw"], chunk=2048)

        loss, (ds, di) = jax.value_and_grad(loss_of, argnums=(0, 1))(s_t, i_t)
        return (s_t + (0.0 * ds).astype(s_t.dtype), i_t + (0.0 * di).astype(i_t.dtype)), loss

    try:
        out[f"{label_prefix}_loss_fwdbwd"] = _time_scan(loss_body, (s_t0, i_t0))
        log(f"{label_prefix}_loss_fwdbwd: {out[f'{label_prefix}_loss_fwdbwd']:.3f} ms/step")
    except Exception as exc:
        log(f"{label_prefix}_loss_fwdbwd FAILED: {str(exc)[:160]}")

    grads0 = jax.tree.map(jnp.ones_like, params)

    def adam_body(carry, step_idx):
        params, opt_state = carry
        updates, opt_state2 = tx.update(grads0, opt_state, params)
        return (optax.apply_updates(params, updates), opt_state2), jax.tree.leaves(params)[0].ravel()[0]

    out[f"{label_prefix}_adam"] = _time_scan(adam_body, (params, tx.init(params)))
    log(f"{label_prefix}_adam: {out[f'{label_prefix}_adam']:.3f} ms/step")
    return out


def main() -> None:
    import jax

    log(f"devices: {jax.devices()}")
    results = {}
    results.update(_slices(dict(B=64, L=1024, D=128, N=15872, heads=4, blocks=2), "long_ctx"))
    # remat config: full step needs remat to fit; the half-batch no-remat
    # run bounds the recompute overhead (2x its step = the no-remat floor)
    results.update(_slices(dict(B=512, L=200, D=256, N=20480, heads=8, blocks=2), "ml20m_b512", remat=True))
    results.update(
        {f"ml20m_b256_noremat_{k.split('_', 2)[-1]}": v
         for k, v in _slices(dict(B=256, L=200, D=256, N=20480, heads=8, blocks=2), "ml20m_b256").items()}
    )

    out = Path(__file__).with_name("results_step_decomposition_long.json")
    out.write_text(json.dumps({"protocol": "two-window-differenced", "ms_per_step": results}, indent=1))
    log(f"wrote {out}")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
