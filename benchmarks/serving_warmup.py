"""Serving warmup benchmark: cold first query vs `model.warmup` + warm query.

PERF_r02 flagged serving cold-start: the first `recommend` per batch shape
pays 17-36 s of XLA compile. `ModelBase.warmup(dataset, k, ...)` (added r3)
moves that cost to deployment time. This measures, at a KION-catalog-scale
config on the real chip:

  warmup_s            model.warmup(ds, k, filter_viewed=True) — the compile,
                      paid once at deploy
  first_query_s       first REAL query (4096 users) after warmup
  steady_query_s      the same query again (steady state)

Run with a FRESH compilation cache dir so "cold" is genuinely cold:
  JAX_COMPILATION_CACHE_DIR=$(mktemp -d) PYTHONPATH=/root/repo:/root/.axon_site \
      python benchmarks/serving_warmup.py
"""

import json
import sys
import time
from pathlib import Path

import numpy as np
import pandas as pd

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

N_USERS, N_ITEMS, SESSION_LEN = 50_000, 15_700, 12
T0 = time.time()


def log(msg: str) -> None:
    print(f"[warmup_bench +{time.time() - T0:7.1f}s] {msg}", flush=True)


def main() -> None:
    from rectools_tpu import Columns
    from rectools_tpu.dataset import Dataset
    from rectools_tpu.models import SASRecModel

    rng = np.random.default_rng(0)
    n = N_USERS * SESSION_LEN
    df = pd.DataFrame(
        {
            Columns.User: np.repeat(np.arange(N_USERS), SESSION_LEN),
            Columns.Item: (rng.zipf(1.3, n) - 1) % N_ITEMS,
            Columns.Weight: 1.0,
            Columns.Datetime: pd.Timestamp("2024-01-01")
            + pd.to_timedelta(np.tile(np.arange(SESSION_LEN), N_USERS), unit="h"),
        }
    )
    ds = Dataset.construct(df)
    log(f"dataset: {n} interactions, {N_USERS} users, {df[Columns.Item].nunique()} items")

    model = SASRecModel(
        n_blocks=2, n_heads=4, n_factors=128, session_max_len=100, epochs=1,
        batch_size=512, seed=0, training_module_kwargs={"compute_dtype": "bfloat16"},
    )
    t = time.time()
    model.fit(ds)
    log(f"fit (1 epoch): {time.time() - t:.1f}s")

    users = df[Columns.User].unique()
    t = time.time()
    model.warmup(ds, k=10, filter_viewed=True)
    warmup_s = time.time() - t
    log(f"warmup: {warmup_s:.1f}s")

    t = time.time()
    reco = model.recommend(users[:4096], ds, k=10, filter_viewed=True)
    first_query_s = time.time() - t
    log(f"first query after warmup (4096 users): {first_query_s:.1f}s")

    t = time.time()
    model.recommend(users[4096:8192], ds, k=10, filter_viewed=True)
    steady_query_s = time.time() - t
    log(f"steady query (4096 users): {steady_query_s:.1f}s")

    assert reco[Columns.User].nunique() == 4096
    out = {
        "config": {"n_users": N_USERS, "n_items": N_ITEMS, "k": 10, "query_users": 4096},
        "warmup_s": round(warmup_s, 2),
        "first_query_after_warmup_s": round(first_query_s, 2),
        "steady_query_s": round(steady_query_s, 2),
    }
    Path(REPO / "benchmarks/results_serving_warmup.json").write_text(json.dumps(out, indent=1))
    log(json.dumps(out))


if __name__ == "__main__":
    main()
