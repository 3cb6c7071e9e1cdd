"""Per-op TPU profile of the KION train step (the bench.py workload).

Captures a jax profiler trace of the full bf16 train step (towers +
streaming-lse softmax loss + Adam) and aggregates XLA-op durations from the
device xplane — the attribution PERF notes cite. Prints the top ops by total
device time per step and writes benchmarks/results_profile_step.json.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/profile_step.py
"""

import glob
import json
import sys
import time
from collections import defaultdict
from functools import partial
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

CFG = dict(B=512, L=100, D=128, N=15872, heads=4, blocks=2)
STEPS = 30
TRACE_DIR = "/tmp/jax_step_trace"


def build_step():
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

    def towers(module, batch):
        item_embs = module.item_model.embed_catalog(deterministic=False)
        session_embs = module.encode_sessions(batch, item_embs, deterministic=False)
        return session_embs, item_embs

    def body(carry, step_idx):
        params, opt_state = carry

        def loss_of(p):
            p = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16) if jnp.issubdtype(x.dtype, jnp.floating) else x, p
            )
            rngs = {"dropout": jax.random.fold_in(jax.random.PRNGKey(7), step_idx)}
            s_t, i_t = backbone.apply({"params": p}, batch, method=towers, rngs=rngs)
            return fused_softmax_loss(s_t, i_t, batch["y"], batch["yw"], chunk=2048)

        loss, grads = jax.value_and_grad(loss_of)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), opt_state2), loss

    @partial(jax.jit, donate_argnums=(0, 1))
    def many(params, opt_state):
        (params, opt_state), losses = jax.lax.scan(body, (params, opt_state), jnp.arange(STEPS))
        return params, opt_state, losses[-1]

    return many, params, opt_state


def capture():
    import jax

    many, params, opt_state = build_step()
    for _ in range(2):  # compile + settle
        params, opt_state, loss = many(params, opt_state)
    float(loss)
    with jax.profiler.trace(TRACE_DIR):
        params, opt_state, loss = many(params, opt_state)
        float(loss)


def aggregate():
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(f"{TRACE_DIR}/plugins/profile/*/*.xplane.pb"))
    space = xplane_pb2.XSpace()
    space.ParseFromString(Path(paths[-1]).read_bytes())
    per_op = defaultdict(float)
    for plane in space.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        meta = {m_id: m.name for m_id, m in plane.event_metadata.items()}
        for line in plane.lines:
            if "XLA Ops" not in line.name and "XLA TraceMe" not in line.name and line.name != "Steps":
                if "op" not in line.name.lower():
                    continue
            for event in line.events:
                per_op[meta.get(event.metadata_id, "?")] += event.duration_ps / 1e9  # ms
    return {name: ms / STEPS for name, ms in per_op.items()}


def main() -> None:
    t0 = time.time()
    capture()
    print(f"trace captured in {time.time() - t0:.0f}s")
    per_op = aggregate()
    total = sum(per_op.values())
    rows = sorted(per_op.items(), key=lambda kv: -kv[1])
    print(f"{'ms/step':>9}  {'%':>5}  op")
    for name, ms in rows[:45]:
        print(f"{ms:9.3f}  {100 * ms / total:5.1f}  {name[:110]}")
    print(f"{total:9.3f}  total device op time")
    out = {"config": CFG, "steps": STEPS, "total_ms": total, "ops_ms": dict(rows)}
    Path(REPO / "benchmarks/results_profile_step.json").write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
