"""Quality-parity gate at ML-1M scale.

BASELINE.md's acceptance gate asks for Recall@10 / NDCG@10 on MovieLens-1M
and KION. Neither dataset is reachable from this image (zero network egress;
the bundled KION directory ships only a README — its data/ folder is empty),
so this gate substitutes the strongest offline evidence available:

1. A SYNTHETIC dataset at ML-1M scale (6,040 users x 3,706 items x ~1M
   interactions) drawn from a generative model with the three structures the
   real models exploit: user-item latent affinity (matrix-factorization
   signal), first-order sequential dynamics (transformer signal), and Zipf
   popularity skew (baseline signal). Ground truth is known, so model
   ordering expectations are checkable.
2. Leave-one-out evaluation (last interaction per user held out; k=10,
   filter_viewed) — the protocol of the reference HSTU tutorial.
3. HEAD-TO-HEAD runs of the actual reference implementation (EASE, PureSVD,
   Popular via the numpy implicit-stub in tests/parity) on the same data:
   those rows must match ours within run variance — exact quality parity
   where the reference can execute at all.

Outputs: QUALITY_r02.json (machine) + QUALITY_r02_auto.md (table) at repo
root. QUALITY_r02.md is the CURATED narrative document - never overwritten here.

Run:  PYTHONPATH=/root/repo[:/root/.axon_site] python benchmarks/quality_gate.py
"""

import json
import os
import sys
import time
from pathlib import Path

import numpy as np
import pandas as pd

# Persistent XLA compilation cache: first-compile through the device tunnel
# dominates small fits/recommends (measured: PureSVD reco 17 s cold vs 0.4 s
# warm for 6k users); cached executables make repeat runs reflect compute.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_tpu_compilation_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests" / "parity" / "implicit_stub"))

N_USERS = 6040
N_ITEMS = 3706
SESSION_LEN = 165  # ~1M interactions, matching ML-1M's mean
LATENT_DIM = 24
K = 10


def log(msg: str) -> None:
    print(f"[quality_gate +{time.time() - T0:7.1f}s] {msg}", flush=True)


T0 = time.time()


# --------------------------------------------------------------------- data


def generate_dataset(seed: int = 0) -> pd.DataFrame:
    """Sample sessions from softmax(user-affinity + markov + popularity)."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    user_f = rng.normal(size=(N_USERS, LATENT_DIM)).astype(np.float32)
    item_f = rng.normal(size=(N_ITEMS, LATENT_DIM)).astype(np.float32)
    pop_bias = -0.8 * np.log1p(np.arange(N_ITEMS)).astype(np.float32)  # Zipf-ish skew
    # separate low-rank transition structure so sequential models have signal
    # that pure MF cannot capture
    trans_f = rng.normal(size=(N_ITEMS, LATENT_DIM)).astype(np.float32)

    uf = jnp.asarray(user_f)
    itf = jnp.asarray(item_f)
    trf = jnp.asarray(trans_f)
    base = 1.4 * (uf @ itf.T) / np.sqrt(LATENT_DIM) + jnp.asarray(pop_bias)[None, :]  # (U, I)

    def step(carry, key):
        prev = carry  # (U,) int32
        markov = 2.2 * (trf[prev] @ itf.T) / np.sqrt(LATENT_DIM)
        logits = base + markov
        # forbid immediate repeats
        logits = logits.at[jnp.arange(N_USERS), prev].set(-1e9)
        gumbel = jax.random.gumbel(key, logits.shape)
        nxt = jnp.argmax(logits + gumbel, axis=1).astype(jnp.int32)
        return nxt, nxt

    keys = jax.random.split(jax.random.PRNGKey(seed), SESSION_LEN)
    first = jax.random.categorical(jax.random.PRNGKey(seed + 1), base, axis=1).astype(jnp.int32)
    _, seq = jax.lax.scan(step, first, keys[1:])
    sessions = np.concatenate([np.asarray(first)[None, :], np.asarray(seq)], axis=0).T  # (U, L)
    log(f"sampled sessions {sessions.shape}")

    users = np.repeat(np.arange(N_USERS), SESSION_LEN)
    items = sessions.reshape(-1)
    step_idx = np.tile(np.arange(SESSION_LEN), N_USERS)
    dt = pd.Timestamp("2024-01-01") + pd.to_timedelta(step_idx * 3600 + (users % 997), unit="s")
    df = pd.DataFrame({"user_id": users, "item_id": items, "weight": 1.0, "datetime": dt})
    truth = {"base": np.asarray(base), "item_f": item_f, "trans_f": trans_f}
    return df, truth


def oracle_recommend(train: pd.DataFrame, truth: dict, k: int) -> pd.DataFrame:
    """Bayes ceiling: rank by the TRUE generative logits for the held-out
    step (seen items excluded) — no trained model can beat this in
    expectation."""
    last = train.sort_values(["user_id", "datetime"], kind="stable").groupby("user_id").tail(1)
    prev = last.set_index("user_id")["item_id"].sort_index().to_numpy()
    markov = 2.2 * (truth["trans_f"][prev] @ truth["item_f"].T) / np.sqrt(LATENT_DIM)
    logits = truth["base"] + markov
    logits[np.arange(N_USERS), prev] = -1e9
    seen_users = train["user_id"].to_numpy()
    seen_items = train["item_id"].to_numpy()
    logits[seen_users, seen_items] = -1e9  # filter_viewed
    top = np.argsort(-logits, axis=1)[:, :k]
    return pd.DataFrame(
        {
            "user_id": np.repeat(np.arange(N_USERS), k),
            "item_id": top.reshape(-1),
            "rank": np.tile(np.arange(1, k + 1), N_USERS),
        }
    )


def split_leave_one_out(df: pd.DataFrame):
    order = df.sort_values(["user_id", "datetime"], kind="stable")
    last = order.groupby("user_id").tail(1)
    train = order.drop(last.index)
    return train.reset_index(drop=True), last.reset_index(drop=True)


# ---------------------------------------------------------------- evaluation


def evaluate(reco: pd.DataFrame, test: pd.DataFrame) -> dict:
    import rectools_tpu.metrics as m

    metrics = {
        f"recall@{K}": m.Recall(k=K),
        f"ndcg@{K}": m.NDCG(k=K, log_base=2),
        f"map@{K}": m.MAP(k=K),
    }
    return {name: round(float(v), 4) for name, v in m.calc_metrics(metrics, reco, test).items()}


def run_tpu_models(train: pd.DataFrame, test: pd.DataFrame) -> dict:
    from rectools_tpu.dataset import Dataset
    from rectools_tpu.models import (
        BPRModel,
        EASEModel,
        HybridMFModel,
        ItemKNNModel,
        PopularModel,
        PureSVDModel,
        RandomModel,
        ALSModel,
    )
    from rectools_tpu.models.nn.transformers import (
        BERT4RecModel,
        BestStateKeeper,
        EarlyStopping,
        HSTUModel,
        LiGRLayers,
        SASRecModel,
        leave_one_out_mask,
    )

    ds = Dataset.construct(train)
    users = test["user_id"].unique()
    results = {}

    def callbacks():
        return [
            EarlyStopping(monitor=f"val_recall@{K}", patience=3, mode="max"),
            BestStateKeeper(monitor=f"val_recall@{K}", mode="max"),
        ]

    transformer_common = dict(
        n_blocks=2,
        n_heads=4,
        n_factors=64,
        session_max_len=100,
        batch_size=128,
        lr=1e-3,
        epochs=40,
        get_val_mask_func=leave_one_out_mask,
        get_callbacks_func=callbacks,
        training_module_kwargs={"val_recall_k": K},
        seed=32,
    )

    specs = {
        "random": lambda: RandomModel(random_state=32),
        "popular": lambda: PopularModel(),
        "ease": lambda: EASEModel(regularization=100.0),
        "pure_svd": lambda: PureSVDModel(factors=64),
        "ials_64": lambda: ALSModel(factors=64, regularization=0.05, iterations=15, random_state=32),
        "bpr_64": lambda: BPRModel(factors=64, iterations=60, random_state=32),
        "item_knn_cosine": lambda: ItemKNNModel(variant="cosine", K=50),
        "hybrid_mf_warp": lambda: HybridMFModel(no_components=64, loss="warp", epochs=20, random_state=32),
        "sasrec_sampled": lambda: SASRecModel(
            loss="sampled_softmax", n_negatives=128, **transformer_common
        ),
        # TPU-recommended sampled mode: one negative set shared across each
        # session's positions (PERF_r02.md "gather inversion" — 15x faster
        # at production scale, same quality tier here). Shared-negative
        # training dips deeper through the early epochs, so its early
        # stopping needs the warmup guard (the trap the narrative documents).
        "sasrec_shared_negs": lambda: SASRecModel(
            loss="sampled_softmax",
            n_negatives=128,
            **{
                **transformer_common,
                "training_module_kwargs": {"val_recall_k": K, "negatives_sharing": "batch"},
                "get_callbacks_func": lambda: [
                    EarlyStopping(monitor=f"val_recall@{K}", patience=3, mode="max", warmup_epochs=8),
                    BestStateKeeper(monitor=f"val_recall@{K}", mode="max"),
                ],
            },
        ),
        "esasrec": lambda: SASRecModel(
            loss="sampled_softmax",
            n_negatives=128,
            transformer_layers_type=LiGRLayers,
            **transformer_common,
        ),
        "bert4rec": lambda: BERT4RecModel(loss="softmax", **transformer_common),
        "hstu": lambda: HSTUModel(loss="sampled_softmax", n_negatives=128, **transformer_common),
    }

    context = None
    for name, build in specs.items():
        t = time.time()
        try:
            model = build()
            model.fit(ds)
            kwargs = {}
            if getattr(model, "require_recommend_context", False):
                last_dt = train.groupby("user_id")["datetime"].max() + pd.Timedelta(hours=1)
                context = pd.DataFrame({"user_id": last_dt.index, "datetime": last_dt.to_numpy()})
                kwargs["context"] = context
            reco = model.recommend(users, ds, k=K, filter_viewed=True, **kwargs)
            results[name] = {**evaluate(reco, test), "fit+reco_s": round(time.time() - t, 1)}
            log(f"tpu/{name}: {results[name]}")
        except Exception as exc:  # keep the gate running; report the failure
            import traceback

            traceback.print_exc()
            results[name] = {"error": repr(exc)}
            log(f"tpu/{name}: FAILED {exc!r}")
    return results


def run_reference_models(train: pd.DataFrame, test: pd.DataFrame) -> dict:
    """The actual reference implementation on its pure-python paths."""
    try:
        import typeguard as loaded_typeguard

        if not hasattr(loaded_typeguard, "TypeCheckError"):
            import importlib.util

            shim_path = REPO / "tests" / "parity" / "implicit_stub" / "typeguard.py"
            spec = importlib.util.spec_from_file_location("_typeguard_shim", shim_path)
            shim = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(shim)
            loaded_typeguard.TypeCheckError = shim.TypeCheckError
            loaded_typeguard.check_type = shim.check_type
        sys.path.append("/root/reference")
        from rectools.dataset import Dataset as RefDataset
        from rectools.models import EASEModel, PopularModel, PureSVDModel
    except Exception as exc:  # pragma: no cover
        log(f"reference unavailable: {exc!r}")
        return {"error": repr(exc)}

    ds = RefDataset.construct(train)
    users = test["user_id"].unique()
    results = {}
    for name, build in {
        "popular": lambda: PopularModel(),
        "ease": lambda: EASEModel(regularization=100.0),
        "pure_svd": lambda: PureSVDModel(factors=64),
    }.items():
        t = time.time()
        try:
            reco = build().fit(ds).recommend(users, ds, k=K, filter_viewed=True)
            results[name] = {**evaluate(reco, test), "fit+reco_s": round(time.time() - t, 1)}
            log(f"ref/{name}: {results[name]}")
        except Exception as exc:
            results[name] = {"error": repr(exc)}
            log(f"ref/{name}: FAILED {exc!r}")
    return results


def main() -> None:
    import jax

    log(f"backend: {jax.default_backend()}")
    df, truth = generate_dataset()
    train, test = split_leave_one_out(df)
    log(f"train {len(train)} rows, test {len(test)} users")

    oracle_metrics = evaluate(oracle_recommend(train, truth, K), test)
    log(f"oracle (true generative logits): {oracle_metrics}")

    tpu_results = run_tpu_models(train, test)
    tpu_results = {"oracle_ceiling": oracle_metrics, **tpu_results}
    ref_results = run_reference_models(train, test)

    payload = {
        "protocol": {
            "dataset": f"synthetic ML-1M scale ({N_USERS} users x {N_ITEMS} items x {len(df)} interactions; "
            "latent-affinity + first-order markov + zipf popularity)",
            "why_synthetic": "ML-1M/KION unreachable: zero network egress and the bundled KION data dir is empty",
            "split": "leave-one-out (last interaction per user), k=10, filter_viewed",
            "backend": jax.default_backend(),
        },
        "rectools_tpu": tpu_results,
        "reference": ref_results,
    }
    json_path = REPO / "QUALITY_r02.json"
    if json_path.exists():  # preserve auxiliary record sections (push_runs, ...)
        try:
            for key, value in json.loads(json_path.read_text()).items():
                payload.setdefault(key, value)
        except (json.JSONDecodeError, OSError):
            pass
    json_path.write_text(json.dumps(payload, indent=2))

    lines = [
        "# Quality gate — round 2",
        "",
        payload["protocol"]["dataset"],
        "",
        f"Protocol: {payload['protocol']['split']}. ",
        "ML-1M/KION are unreachable from this image (zero egress; KION data dir ships empty), "
        "so the gate pairs this structured synthetic benchmark with head-to-head runs of the "
        "actual reference implementation (numpy implicit-stub) on the same data — matching rows "
        "demonstrate quality parity directly; tests/parity pins the same at small scale in CI.",
        "",
        "| model | recall@10 | ndcg@10 | map@10 | fit+reco (s) |",
        "|---|---|---|---|---|",
    ]
    for scope, results in (("tpu", tpu_results), ("reference", ref_results)):
        for name, vals in results.items():
            if "error" in vals:
                lines.append(f"| {scope}/{name} | ERROR: {vals['error']} | | | |")
            else:
                lines.append(
                    f"| {scope}/{name} | {vals[f'recall@{K}']} | {vals[f'ndcg@{K}']} "
                    f"| {vals[f'map@{K}']} | {vals.get('fit+reco_s', '-')} |"
                )
    (REPO / "QUALITY_r02_auto.md").write_text("\n".join(lines) + "\n")
    log("wrote QUALITY_r02.json / QUALITY_r02_auto.md (QUALITY_r02.md is the curated doc)")


if __name__ == "__main__":
    main()
