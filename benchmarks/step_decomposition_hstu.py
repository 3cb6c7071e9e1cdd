"""Decompose the HSTU KION bf16 train step — where do the ms over SASRec go?

PERF_r04 measured train_hstu_kion_bf16 at 15.26 ms/step (0.233 MFU) vs the
SASRec twin at 10.42 ms (0.341 MFU) on the identical B=512/L=100/D=128/N=15872
workload — a ~4.9 ms gap with no attribution. This harness times the HSTU
step's pieces at that exact config so the gap is measured, not guessed:

  full              complete HSTU train step (STU towers + streaming-lse + adam)
  full_nodrop       dropout off
  full_no_time      relative_time_attention off (pos bias only)
  full_no_pos       relative_pos_attention off (time bias only)
  full_no_bias      both relative biases off
  towers_fwd        STU towers forward only
  towers_fwdbwd     towers + surrogate-sum fwd+bwd (loss excluded)
  towers_fwdbwd_no_time   same without the time bias
  bias_fwdbwd       the two blocks' combined relative bias alone, fwd+bwd
  attn_fwdbwd       stu_dot_product_attention alone on frozen projections
  loss_fwdbwd       streaming-lse fwd+bwd (identical to the SASRec slice)

Slices overlap by design; full ~= towers_fwdbwd + loss_fwdbwd + adam.
Timing protocol: two-window differenced (see step_decomposition._time_scan).

Run:  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/step_decomposition_hstu.py
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from step_decomposition import _time_scan  # noqa: E402  (same timing protocol)

CFG = dict(B=512, L=100, D=128, N=15872, heads=4, blocks=2)
T0 = time.time()


def log(msg: str) -> None:
    print(f"[hstu-decomp +{time.time() - T0:7.1f}s] {msg}", flush=True)


def _build(dropout_rate=0.2, use_time=True, use_pos=True):
    sys.path.insert(0, str(REPO / "benchmarks"))
    from perf_suite import _build_hstu_backbone

    cfg = dict(CFG)
    backbone = _build_hstu_backbone(cfg, dropout_rate)
    if not (use_time and use_pos):
        from rectools_tpu.models.nn.item_net import IdEmbeddingsItemNet, SumOfEmbeddingsConstructor
        from rectools_tpu.models.nn.transformers.backbone import TransformerBackbone
        from rectools_tpu.models.nn.transformers.hstu import STULayers
        from rectools_tpu.models.nn.transformers.net_blocks import LearnableInversePositionalEncoding
        from rectools_tpu.models.nn.transformers.similarity import DistanceSimilarityModule

        d, heads = cfg["D"], cfg["heads"]
        head_dim = d // heads
        backbone = TransformerBackbone(
            item_model=SumOfEmbeddingsConstructor(
                n_items=cfg["N"],
                item_net_blocks=(IdEmbeddingsItemNet(n_items=cfg["N"], n_factors=d, dropout_rate=0.0),),
            ),
            pos_encoding_layer=LearnableInversePositionalEncoding(
                use_pos_emb=True, session_max_len=cfg["L"], n_factors=d, use_scale_factor=True
            ),
            transformer_layers=STULayers(
                n_blocks=cfg["blocks"], n_factors=d, n_heads=heads,
                linear_hidden_dim=head_dim, attention_dim=head_dim,
                session_max_len=cfg["L"], relative_time_attention=use_time,
                relative_pos_attention=use_pos, dropout_rate=dropout_rate,
            ),
            similarity_module=DistanceSimilarityModule(distance="cosine"),
            n_heads=heads,
            dropout_rate=dropout_rate,
            use_causal_attn=True,
        )
    return backbone


def _batch():
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    batch = {
        "x": jnp.asarray(rng.integers(1, CFG["N"], size=(CFG["B"], CFG["L"]))),
        "y": jnp.asarray(rng.integers(1, CFG["N"], size=(CFG["B"], CFG["L"]))),
        "yw": jnp.ones((CFG["B"], CFG["L"]), jnp.float32),
        "unix_ts": jnp.asarray(
            1_600_000_000
            + np.sort(np.random.default_rng(1).integers(0, 10_000_000, size=(CFG["B"], CFG["L"] + 1)), axis=1)
        ),
    }
    return batch


def _step_body(backbone, batch, dropout_rate, tx):
    import jax
    import jax.numpy as jnp
    import optax

    from rectools_tpu.models.nn.transformers.losses import fused_softmax_loss

    def towers(module, b, det):
        item_embs = module.item_model.embed_catalog(deterministic=det)
        session_embs = module.encode_sessions(b, item_embs, deterministic=det)
        return module.similarity_module.catalog_loss_towers(session_embs, item_embs)

    def body(carry, step_idx):
        params, opt_state = carry

        def loss_of(p):
            p = jax.tree.map(lambda x: x.astype(jnp.bfloat16) if jnp.issubdtype(x.dtype, jnp.floating) else x, p)
            det = dropout_rate == 0.0
            rngs = None if det else {"dropout": jax.random.fold_in(jax.random.PRNGKey(7), step_idx)}
            s_t, i_t = backbone.apply({"params": p}, batch, method=lambda m, b: towers(m, b, det), rngs=rngs)
            return fused_softmax_loss(
                s_t.astype(jnp.bfloat16), i_t.astype(jnp.bfloat16), batch["y"], batch["yw"], chunk=2048
            )

        loss, grads = jax.value_and_grad(loss_of)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), opt_state2), loss

    return body


def main() -> None:
    import jax
    import jax.numpy as jnp
    import optax

    from rectools_tpu.models.nn.transformers.losses import fused_softmax_loss
    from rectools_tpu.ops.stu_attention import stu_dot_product_attention

    log(f"devices: {jax.devices()}")
    results = {}
    batch = _batch()
    tx = optax.flatten(optax.adam(1e-3, b1=0.9, b2=0.98))

    variants = [
        ("full", dict(dropout_rate=0.2, use_time=True, use_pos=True)),
        ("full_nodrop", dict(dropout_rate=0.0, use_time=True, use_pos=True)),
        ("full_no_time", dict(dropout_rate=0.2, use_time=False, use_pos=True)),
        ("full_no_pos", dict(dropout_rate=0.2, use_time=True, use_pos=False)),
        ("full_no_bias", dict(dropout_rate=0.2, use_time=False, use_pos=False)),
    ]
    for label, kw in variants:
        backbone = _build(**kw)
        params = backbone.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            {k: v[:8] for k, v in batch.items() if k in ("x", "unix_ts")},
            deterministic=kw["dropout_rate"] == 0.0,
        )["params"]
        opt_state = tx.init(params)
        body = _step_body(backbone, batch, kw["dropout_rate"], tx)
        results[label] = _time_scan(body, (params, opt_state))
        log(f"{label}: {results[label]:.3f} ms/step")

    backbone = _build(dropout_rate=0.2)
    params = backbone.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        {k: v[:8] for k, v in batch.items() if k in ("x", "unix_ts")},
        deterministic=False,
    )["params"]

    def cast(p):
        return jax.tree.map(lambda x: x.astype(jnp.bfloat16) if jnp.issubdtype(x.dtype, jnp.floating) else x, p)

    def towers(module, b, det=False):
        item_embs = module.item_model.embed_catalog(deterministic=det)
        session_embs = module.encode_sessions(b, item_embs, deterministic=det)
        return module.similarity_module.catalog_loss_towers(session_embs, item_embs)

    def towers_fwd_body(carry, step_idx):
        p = carry
        rngs = {"dropout": jax.random.fold_in(jax.random.PRNGKey(7), step_idx)}
        s_t, i_t = backbone.apply({"params": cast(p)}, batch, method=towers, rngs=rngs)
        return p, (s_t.astype(jnp.float32).sum() + i_t.astype(jnp.float32).sum())

    results["towers_fwd"] = _time_scan(towers_fwd_body, params)
    log(f"towers_fwd: {results['towers_fwd']:.3f} ms/step")

    def towers_fwdbwd_body(carry, step_idx):
        p0 = carry

        def surrogate(p):
            rngs = {"dropout": jax.random.fold_in(jax.random.PRNGKey(7), step_idx)}
            s_t, i_t = backbone.apply({"params": cast(p)}, batch, method=towers, rngs=rngs)
            return s_t.astype(jnp.float32).sum() + i_t.astype(jnp.float32).sum()

        loss, grads = jax.value_and_grad(surrogate)(p0)
        return p0, loss + jax.tree.leaves(grads)[0].ravel()[0]

    results["towers_fwdbwd"] = _time_scan(towers_fwdbwd_body, params)
    log(f"towers_fwdbwd: {results['towers_fwdbwd']:.3f} ms/step")

    backbone_nt = _build(dropout_rate=0.2, use_time=False, use_pos=True)
    params_nt = backbone_nt.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        {k: v[:8] for k, v in batch.items() if k in ("x", "unix_ts")},
        deterministic=False,
    )["params"]

    def towers_nt_body(carry, step_idx):
        p0 = carry

        def surrogate(p):
            rngs = {"dropout": jax.random.fold_in(jax.random.PRNGKey(7), step_idx)}
            s_t, i_t = backbone_nt.apply({"params": cast(p)}, batch, method=towers, rngs=rngs)
            return s_t.astype(jnp.float32).sum() + i_t.astype(jnp.float32).sum()

        loss, grads = jax.value_and_grad(surrogate)(p0)
        return p0, loss + jax.tree.leaves(grads)[0].ravel()[0]

    results["towers_fwdbwd_no_time"] = _time_scan(towers_nt_body, params_nt)
    log(f"towers_fwdbwd_no_time: {results['towers_fwdbwd_no_time']:.3f} ms/step")

    # combined relative bias alone (x2 blocks), fwd + bwd w.r.t. both tables
    from rectools_tpu.ops.stu_attention import _combined_bias

    nb = 128
    tw0 = jnp.asarray(np.random.default_rng(2).normal(0, 0.02, nb + 1), jnp.float32)
    tw1 = tw0 * 1.01
    pw0 = jnp.asarray(np.random.default_rng(3).normal(0, 0.02, 2 * CFG["L"] - 1), jnp.float32)
    pw1 = pw0 * 1.01
    ext_ts = jnp.concatenate([batch["unix_ts"], batch["unix_ts"][:, -1:]], axis=1).astype(jnp.int32)

    def bias_body(carry, step_idx):
        tws, pws = carry

        def f(tws, pws):
            tot = jnp.zeros((), jnp.float32)
            for tw, pw in zip(tws, pws):
                b, _ = _combined_bias(ext_ts, tw, pw, CFG["L"], nb, True, True)
                tot = tot + b.sum()
            return tot

        val, grads = jax.value_and_grad(f, argnums=(0, 1))(tws, pws)
        new_tws = tuple(t + 0.0 * g for t, g in zip(tws, grads[0]))
        new_pws = tuple(t + 0.0 * g for t, g in zip(pws, grads[1]))
        return (new_tws, new_pws), val

    results["bias_fwdbwd_x2"] = _time_scan(bias_body, ((tw0, tw1), (pw0, pw1)))
    log(f"bias_fwdbwd_x2: {results['bias_fwdbwd_x2']:.3f} ms/step")

    # attention op alone on frozen projections (x2 blocks worth: one timed, x1)
    b_sz, h, l = CFG["B"], CFG["heads"], CFG["L"]
    ad = lh = CFG["D"] // h
    rng = np.random.default_rng(5)
    q0 = jnp.asarray(rng.normal(0, 1, (b_sz, h, l, ad)), jnp.bfloat16)
    k0 = jnp.asarray(rng.normal(0, 1, (b_sz, h, l, ad)), jnp.bfloat16)
    v0 = jnp.asarray(rng.normal(0, 1, (b_sz, h, l, lh)), jnp.bfloat16)
    tm = jnp.ones((b_sz, l), jnp.float32)
    allowed = jnp.tril(jnp.ones((l, l), jnp.float32))

    def attn_body(carry, step_idx):
        q, k, v = carry

        def f(q, k, v, tw, pw):
            out = stu_dot_product_attention(q, k, v, ext_ts, tm, allowed, tw, pw, nb)
            return out.astype(jnp.float32).sum()

        val, grads = jax.value_and_grad(f, argnums=(0, 1, 2))(q, k, v, tw0, pw0)
        return tuple(x + (0.0 * g).astype(x.dtype) for x, g in zip((q, k, v), grads)), val

    results["attn_fwdbwd_x1"] = _time_scan(attn_body, (q0, k0, v0))
    log(f"attn_fwdbwd_x1: {results['attn_fwdbwd_x1']:.3f} ms/step")

    # loss slice (identical shape to the SASRec decomposition's loss_fwdbwd)
    s_t0 = jnp.asarray(rng.normal(0, 1, (b_sz, l, CFG["D"])), jnp.bfloat16)
    i_t0 = jnp.asarray(rng.normal(0, 1, (CFG["N"], CFG["D"])), jnp.bfloat16)

    def loss_body(carry, step_idx):
        s_t, i_t = carry

        def loss_of(st, it):
            return fused_softmax_loss(st, it, batch["y"], batch["yw"], chunk=2048)

        loss, (ds, di) = jax.value_and_grad(loss_of, argnums=(0, 1))(s_t, i_t)
        return (s_t + (0.0 * ds).astype(s_t.dtype), i_t + (0.0 * di).astype(i_t.dtype)), loss

    results["loss_fwdbwd"] = _time_scan(loss_body, (s_t0, i_t0))
    log(f"loss_fwdbwd: {results['loss_fwdbwd']:.3f} ms/step")

    out = Path(__file__).with_name("results_step_decomposition_hstu.json")
    out.write_text(
        json.dumps(
            {
                "config": {**CFG, "compute_dtype": "bfloat16"},
                "protocol": "two-window-differenced",
                "ms_per_step": results,
            },
            indent=1,
        )
    )
    log(f"wrote {out}")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
