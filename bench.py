"""Headline benchmark: SASRec training throughput (examples/s/chip).

Workload mirrors BASELINE.json's KION training scale: batch 512, session
length 100, d=128, 15,872-item catalog (KION has 15,706 items), dropout 0.2,
full-catalog softmax loss (the reference's default and its compute-dominant
path, O(B*L*n_items*d) logits — reference similarity.py:84-86), Adam.

Measured config: the framework's OUT-OF-THE-BOX default. Transformer models
ship ``compute_dtype="auto"`` (training.py), which resolves to bf16 compute
with f32 master weights and f32 softmax statistics on TPU hardware (exact
f32 on any other backend; quality drift pinned by
tests/models/nn/transformers/test_bf16_drift.py and documented in
docs/tpu_performance_guide.md). This script mirrors that default step
one-to-one — the dtype it casts to is asserted equal to the resolved
default at runtime. The loss runs through the streaming-logsumexp Pallas
kernel with the loss-level VJP (ops/softmax_lse.py,
losses._fused_ce_pallas); attention takes the shape-dispatched XLA path
with the recompute VJP (ops/attention.py).

Output fields:
- ``value``: measured steady-state examples/s on one chip. Host-fetch timed
  (on remote transports `block_until_ready` can acknowledge before execution
  finishes, so only a value round trip is trustworthy) and two-window
  differenced: the remote transport charges a fixed ~25-30 ms per
  dispatch+fetch regardless of the work dispatched, so per-step time is
  computed as the slope between a 50-step and a 400-step timed window
  (median-of-3 each) — the fixed round trip cancels exactly, leaving the
  chip's steady-state step time, which is what a production fit loop
  (continuous dispatches, steps_per_dispatch>=8) actually experiences.
- ``vs_baseline``: the reference throughput bar this is judged against —
  11,971.07 examples/s. Provenance, plainly: this number ORIGINATED as the
  round-2 measured speedup RATIO (35,512.22 jax examples/s divided by the
  ~2.97 examples/s the reference's torch-CPU substrate measures on this
  workload) and was adopted as the throughput bar by the round-2 review
  ("value / vs_baseline >= 3x", BENCH_r02.json). No GPU measurement of the
  reference exists in this environment; the only measured reference point
  is torch-CPU (it materializes the 3.25 GB logits tensor) — run
  `python bench.py --with-torch` to re-measure it. That comparison is
  ~12,000x and is reported in PERF_r03.md, not in this line.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np

# Persistent XLA compilation cache: repeat bench runs skip the 20-40 s
# first-compile of the train step (timing always warms up first regardless).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_tpu_compilation_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

B, L, D, N_ITEMS, HEADS, BLOCKS = 512, 100, 128, 15872, 4, 2
DROPOUT = 0.2
# Two-window differenced timing: the remote transport charges a fixed
# ~25-30 ms per dispatch+fetch round trip regardless of how much work the
# dispatch carries (measured: a trivial 1-step scan costs ~26 ms wall, a
# 200-step one ~31 ms). Timing a single 50-step window therefore inflates
# the per-step number by ~0.5 ms (~5% at this workload). Steady-state
# production training amortizes dispatch (the fit loop runs continuous
# dispatches, steps_per_dispatch>=8), so the honest per-step time is the
# slope, not the intercept: time a small and a large window and divide the
# difference by the step-count difference — the fixed round trip cancels
# exactly. Both windows are median-of-BENCH_REPS.
WARMUP_STEPS = 2
BENCH_WINDOW_SMALL, BENCH_WINDOW_LARGE, BENCH_REPS = 50, 400, 3
TORCH_BENCH_STEPS = 5

# The reference bar adopted by the round-2 review (see module docstring for
# its provenance: r02 measured ratio repurposed as a throughput bar).
BASELINE_EPS = 11971.07


def bench_jax() -> float:
    import jax
    import jax.numpy as jnp
    import optax
    from functools import partial

    from __graft_entry__ import _build_flagship
    from rectools_tpu.models.nn.transformers.losses import fused_softmax_loss

    # the measured dtype must BE the out-of-the-box default on this backend
    # (compute_dtype="auto" -> bf16 on TPU): fail loudly if they ever diverge
    assert jax.default_backend() == "tpu", "headline bench must run on the TPU chip"
    from rectools_tpu.models.nn.transformers.training import TransformerTrainingModule

    import inspect

    resolved = "bfloat16" if jax.default_backend() == "tpu" else "float32"
    sig_default = inspect.signature(TransformerTrainingModule.__init__).parameters["compute_dtype"].default
    assert sig_default == "auto" and resolved == "bfloat16", (sig_default, resolved)

    backbone = _build_flagship(
        n_items=N_ITEMS, session_max_len=L, n_factors=D, n_heads=HEADS, n_blocks=BLOCKS,
        dropout_rate=DROPOUT,
    )
    rng = np.random.default_rng(0)
    batch = {
        "x": jnp.asarray(rng.integers(1, N_ITEMS, size=(B, L))),
        "y": jnp.asarray(rng.integers(1, N_ITEMS, size=(B, L))),
        "yw": jnp.ones((B, L), jnp.float32),
    }
    # init on 8 rows: flax init runs the forward eagerly (un-jitted), so a
    # full-batch init would materialize the (B, L, n_items) catalog logits
    params = backbone.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        {"x": batch["x"][:8]},
        deterministic=False,
    )["params"]
    tx = optax.flatten(optax.adam(1e-3, b1=0.9, b2=0.98))  # mirrors training._make_optimizer
    opt_state = tx.init(params)

    def towers(module, batch):
        item_embs = module.item_model.embed_catalog(deterministic=False)
        session_embs = module.encode_sessions(batch, item_embs, deterministic=False)
        return session_embs, item_embs

    def step(carry, step_idx):
        params, opt_state = carry

        def loss_of(p):
            # compute_dtype="bfloat16": params cast per step, f32 masters in
            # Adam — exactly training.py's bf16 path (training.py:261-263)
            p = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16) if jnp.issubdtype(x.dtype, jnp.floating) else x, p
            )
            rngs = {"dropout": jax.random.fold_in(jax.random.PRNGKey(7), step_idx)}
            s_t, i_t = backbone.apply({"params": p}, batch, method=towers, rngs=rngs)
            return fused_softmax_loss(s_t, i_t, batch["y"], batch["yw"])

        loss, grads = jax.value_and_grad(loss_of)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), opt_state2), loss

    # One dispatch runs n_steps optimizer steps on device (lax.scan) and the
    # timing closes with a HOST FETCH of the final loss (on remote transports
    # `block_until_ready` can acknowledge before execution finishes, so only
    # a value round trip is trustworthy). Per-step time is the two-window
    # SLOPE — see the BENCH_WINDOW_* comment at the top for why.
    def make_multi_step(n_steps):
        @partial(jax.jit, donate_argnums=(0, 1))
        def multi_step(params, opt_state):
            (params, opt_state), losses = jax.lax.scan(
                step, (params, opt_state), jnp.arange(n_steps)
            )
            return params, opt_state, losses[-1]

        return multi_step

    def timed_window(multi_step, params, opt_state):
        times = []
        for _ in range(BENCH_REPS):
            t0 = time.perf_counter()
            params, opt_state, loss = multi_step(params, opt_state)
            float(loss)  # sync point: value materialized on host
            times.append(time.perf_counter() - t0)
        times.sort()
        return times[len(times) // 2], params, opt_state

    small, large = make_multi_step(BENCH_WINDOW_SMALL), make_multi_step(BENCH_WINDOW_LARGE)
    for _ in range(WARMUP_STEPS):  # compile both windows + let clocks settle
        params, opt_state, loss = small(params, opt_state)
        params, opt_state, loss = large(params, opt_state)
    float(loss)
    t_small, params, opt_state = timed_window(small, params, opt_state)
    t_large, params, opt_state = timed_window(large, params, opt_state)
    step_s = (t_large - t_small) / (BENCH_WINDOW_LARGE - BENCH_WINDOW_SMALL)
    return B / step_s


def bench_torch_cpu(max_seconds: float = 60.0) -> float:
    """Equivalent torch CPU train step (the reference substrate without CUDA).

    Materializes the full (B, L, n_items) logits tensor exactly as the
    reference's softmax path does (similarity.py:84-86 there) — 3.25 GB at
    this workload, ~170 s/step on this host (~2.97 examples/s)."""
    import torch

    torch.manual_seed(0)

    class Block(torch.nn.Module):
        def __init__(self) -> None:
            super().__init__()
            self.mha = torch.nn.MultiheadAttention(D, HEADS, DROPOUT, batch_first=True)
            self.ln1 = torch.nn.LayerNorm(D)
            self.ln2 = torch.nn.LayerNorm(D)
            self.ff1 = torch.nn.Linear(D, D)
            self.ff2 = torch.nn.Linear(D, D)

        def forward(self, x, mask):
            q = self.ln1(x)
            a, _ = self.mha(q, x, x, attn_mask=mask, need_weights=False)
            x = q + a
            h = self.ln2(x)
            return x + self.ff2(torch.relu(self.ff1(h)))

    class Net(torch.nn.Module):
        def __init__(self) -> None:
            super().__init__()
            self.emb = torch.nn.Embedding(N_ITEMS, D, padding_idx=0)
            self.pos = torch.nn.Embedding(L, D)
            self.blocks = torch.nn.ModuleList([Block() for _ in range(BLOCKS)])
            self.ln = torch.nn.LayerNorm(D)

        def forward(self, x, mask):
            item_embs = self.emb.weight
            h = item_embs[x] + self.pos.weight[None]
            for b in self.blocks:
                h = b(h, mask)
            h = self.ln(h)
            return h @ item_embs.T

    net = Net()
    opt = torch.optim.Adam(net.parameters(), lr=1e-3, betas=(0.9, 0.98))
    rng = np.random.default_rng(0)
    x = torch.from_numpy(rng.integers(1, N_ITEMS, size=(B, L)))
    y = torch.from_numpy(rng.integers(1, N_ITEMS, size=(B, L)))
    mask = ~torch.tril(torch.ones(L, L, dtype=torch.bool))

    def step() -> None:
        opt.zero_grad()
        logits = net(x, mask)
        loss = torch.nn.functional.cross_entropy(logits.transpose(1, 2), y, ignore_index=0)
        loss.backward()
        opt.step()

    step()  # warmup
    n, t0 = 0, time.perf_counter()
    while n < TORCH_BENCH_STEPS and time.perf_counter() - t0 < max_seconds:
        step()
        n += 1
    dt = time.perf_counter() - t0
    return B * n / dt


def main() -> None:
    jax_eps = bench_jax()
    if "--with-torch" in sys.argv:
        torch_eps = bench_torch_cpu()
        print(f"# torch-CPU reference: {torch_eps:.2f} examples/s "
              f"({jax_eps / torch_eps:.0f}x)", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "sasrec_train_examples_per_s_per_chip",
                "value": round(jax_eps, 2),
                "unit": "examples/s",
                "vs_baseline": BASELINE_EPS,
                "protocol": "two-window-differenced",
            }
        )
    )


if __name__ == "__main__":
    main()
