"""Temporal benchmark: a generative process where relative-TIME attention has
provable headroom — the dataset VERDICT r2 asked for ("prove HSTU on data
where its time bias matters").

The gate dataset (quality_gate.generate_dataset) steps hourly with no gap
structure, so HSTU's log-bucketed relative time bias
(reference rectools/models/nn/transformers/hstu.py:47-153) is never load-
bearing. Here the NEXT-item distribution is conditioned on the time gap
since the previous event:

  short gap (2-20 min, p=0.5)  -> "continuation": strong first-order
      markov kernel over transition features (the user keeps going)
  long gap (2-6 days)           -> "re-engagement": user-affinity +
      popularity kernel, independent of the previous item (a new session)

A time-blind sequential model can only learn the p-weighted mixture; a
time-aware model reads the query-time gap (supplied through the HSTU
``context`` timestamp at recommend, reference get_context contract) and
picks the right kernel. The two oracles below bound what each model class
can achieve:

  oracle_time_aware  — Bayes rank under the TRUE kernel for the held-out
      event's actual gap type (upper bound for HSTU-class models)
  oracle_time_blind  — Bayes rank under the gap-marginalized mixture
      (upper bound for SASRec-class models)

The spread between them is the available time signal. Success criterion
(VERDICT r3 item 2): reference HSTU > reference SASRec here, and our HSTU
within seed variance of the reference's.

Run (CPU; the reference side is torch-CPU):
  env -u PALLAS_AXON_POOL_IPS PYTHONPATH=/root/repo python \
      benchmarks/temporal_benchmark.py [--scale small|full] [--epochs N] \
      [--seeds 32,33,34] [--models hstu,sasrec] [--skip-reference]
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np
import pandas as pd

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests" / "parity" / "implicit_stub"))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from benchmarks import quality_gate as qg  # noqa: E402
from benchmarks.hstu_head_to_head import run_ours, run_reference  # noqa: E402

T0 = time.time()
LATENT_DIM = 24
P_SHORT = 0.5
CONT_SCALE = 4.0
OPEN_SCALE = 2.5


def log(msg: str) -> None:
    print(f"[temporal +{time.time() - T0:7.1f}s] {msg}", flush=True)


def generate(seed: int, n_users: int, n_items: int, session_len: int):
    """Sample gap-conditioned sessions; returns (df, truth)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    user_f = rng.normal(size=(n_users, LATENT_DIM)).astype(np.float32)
    item_f = rng.normal(size=(n_items, LATENT_DIM)).astype(np.float32)
    trans_f = rng.normal(size=(n_items, LATENT_DIM)).astype(np.float32)
    pop_bias = -0.8 * np.log1p(np.arange(n_items)).astype(np.float32)

    uf, itf, trf = jnp.asarray(user_f), jnp.asarray(item_f), jnp.asarray(trans_f)
    open_logits = OPEN_SCALE * (uf @ itf.T) / np.sqrt(LATENT_DIM) + jnp.asarray(pop_bias)[None, :]

    def step(prev, inputs):
        key, is_short = inputs  # is_short: (U,) bool
        cont = CONT_SCALE * (trf[prev] @ itf.T) / np.sqrt(LATENT_DIM)
        logits = jnp.where(is_short[:, None], cont, open_logits)
        logits = logits.at[jnp.arange(n_users), prev].set(-1e9)  # no immediate repeats
        gumbel = jax.random.gumbel(key, logits.shape)
        nxt = jnp.argmax(logits + gumbel, axis=1).astype(jnp.int32)
        return nxt, nxt

    keys = jax.random.split(jax.random.PRNGKey(seed), session_len)
    short_flags = rng.random(size=(session_len - 1, n_users)) < P_SHORT  # per-step gap type
    first = jax.random.categorical(jax.random.PRNGKey(seed + 1), open_logits, axis=1).astype(jnp.int32)
    _, seq = jax.lax.scan(step, first, (keys[1:], jnp.asarray(short_flags)))
    sessions = np.concatenate([np.asarray(first)[None, :], np.asarray(seq)], axis=0).T  # (U, L)

    # gap seconds consistent with the flags that conditioned the kernels
    gaps = np.where(
        short_flags.T,  # (U, L-1)
        rng.uniform(120, 1200, size=(n_users, session_len - 1)),
        rng.uniform(2 * 86400, 6 * 86400, size=(n_users, session_len - 1)),
    )
    start = rng.uniform(0, 86400, size=(n_users, 1))
    ts = np.concatenate([start, start + np.cumsum(gaps, axis=1)], axis=1)  # (U, L)

    users = np.repeat(np.arange(n_users), session_len)
    df = pd.DataFrame(
        {
            "user_id": users,
            "item_id": sessions.reshape(-1),
            "weight": 1.0,
            "datetime": pd.Timestamp("2024-01-01") + pd.to_timedelta(ts.reshape(-1), unit="s"),
        }
    )
    truth = {
        "user_f": user_f, "item_f": item_f, "trans_f": trans_f, "pop_bias": pop_bias,
        "final_is_short": short_flags[-1],  # gap type of the LAST transition (the held-out event)
    }
    return df, truth


def _true_logits(prev: np.ndarray, truth: dict, mode: str) -> np.ndarray:
    cont = CONT_SCALE * (truth["trans_f"][prev] @ truth["item_f"].T) / np.sqrt(LATENT_DIM)
    n_users = prev.shape[0]
    open_ = (
        OPEN_SCALE * (truth["user_f"] @ truth["item_f"].T) / np.sqrt(LATENT_DIM)
        + truth["pop_bias"][None, :]
    )
    if mode == "aware":
        logits = np.where(truth["final_is_short"][:, None], cont, open_)
    else:  # blind: probability mixture over the gap type
        def softmax(x):
            x = x - x.max(axis=1, keepdims=True)
            e = np.exp(x)
            return e / e.sum(axis=1, keepdims=True)

        logits = np.log(P_SHORT * softmax(cont) + (1 - P_SHORT) * softmax(open_) + 1e-30)
    logits[np.arange(n_users), prev] = -1e9
    return logits


def oracle(train: pd.DataFrame, truth: dict, mode: str, k: int = 10) -> pd.DataFrame:
    """Bayes ranking under the true kernels; mode in ('aware', 'blind')."""
    last = train.sort_values(["user_id", "datetime"], kind="stable").groupby("user_id").tail(1)
    prev = last.set_index("user_id")["item_id"].sort_index().to_numpy()
    logits = _true_logits(prev, truth, mode)
    logits[train["user_id"].to_numpy(), train["item_id"].to_numpy()] = -1e9  # filter_viewed
    top = np.argsort(-logits, axis=1)[:, :k]
    n_users = logits.shape[0]
    return pd.DataFrame(
        {
            "user_id": np.repeat(np.arange(n_users), k),
            "item_id": top.reshape(-1),
            "rank": np.tile(np.arange(1, k + 1), n_users),
        }
    )


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--scale", choices=["small", "full"], default="small")
    parser.add_argument("--epochs", type=int, default=30)
    parser.add_argument("--models", default="hstu,sasrec")
    parser.add_argument("--seeds", default="32")
    parser.add_argument("--skip-reference", action="store_true")
    parser.add_argument("--out", default=None)
    args = parser.parse_args()
    models = tuple(args.models.split(","))
    seeds = [int(s) for s in args.seeds.split(",")]

    if args.scale == "small":
        n_users, session_len, session_max_len = 1500, 40, 40
    else:
        n_users, session_len, session_max_len = 6040, 60, 60
    df, truth = generate(0, n_users=n_users, n_items=3706, session_len=session_len)
    train, test = qg.split_leave_one_out(df)
    context = test[["user_id", "datetime"]].reset_index(drop=True)  # query-time context
    hyper = dict(
        n_blocks=2, n_heads=4, n_factors=64, session_max_len=session_max_len,
        batch_size=128, lr=1e-3, loss="sampled_softmax", n_negatives=128,
    )
    # each family runs its tutorial-documented head config: HSTU takes the
    # logits temperature its tutorial pins (logits_t=0.05 — "same as in the
    # original repository"); SASRec keeps its default dot-product head
    per_model = {"hstu": {"logits_t": 0.05}}
    log(f"scale={args.scale}: {len(df)} interactions, {n_users} users, "
        f"{int(truth['final_is_short'].sum())} short-gap holdouts")

    results = {
        "scale": args.scale, "epochs": args.epochs, "hyper": hyper, "seeds": seeds,
        "p_short": P_SHORT,
        "oracle_time_aware": qg.evaluate(oracle(train, truth, "aware"), test),
        "oracle_time_blind": qg.evaluate(oracle(train, truth, "blind"), test),
    }
    log(f"oracle aware: {results['oracle_time_aware']}")
    log(f"oracle blind: {results['oracle_time_blind']}")

    for seed in seeds:
        results[f"tpu_seed{seed}"] = run_ours(
            train, test, args.epochs, hyper, models=models, seed=seed, context_df=context,
            per_model_hyper=per_model,
        )
        if not args.skip_reference:
            results[f"reference_seed{seed}"] = run_reference(
                train, test, args.epochs, hyper, models=models, seed=seed, context_df=context,
                per_model_hyper=per_model,
            )
        out_path = args.out or f"/tmp/temporal_{args.scale}.json"
        Path(out_path).write_text(json.dumps(results, indent=1))
        log(f"wrote {out_path} (through seed {seed})")


if __name__ == "__main__":
    main()
