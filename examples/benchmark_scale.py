"""Full-pipeline scale benchmark: SASRec training at KION scale.

Generates a synthetic dataset with KION's published shape (~1M users, ~16k
items, avg session length ~5.7 — datasets/KION/README.md in the reference
repo) and measures the END-TO-END fit pipeline: pandas ingestion, session
grouping, per-epoch host collation (native C++ ops) and the jit train step.

Run: python examples/benchmark_scale.py [--users 200000]
"""

import argparse
import os
import time

import jax

if os.environ.get("RECTOOLS_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["RECTOOLS_PLATFORM"])
else:
    try:
        jax.default_backend()
    except RuntimeError:  # configured platform unavailable (e.g. no TPU)
        jax.config.update("jax_platforms", "cpu")

import numpy as np
import pandas as pd

from rectools_tpu import Columns
from rectools_tpu.dataset import Dataset
from rectools_tpu.models import SASRecModel


def make_kion_scale(n_users: int, n_items: int = 15706, seed: int = 0) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    lengths = np.clip(rng.geometric(1 / 5.7, size=n_users), 2, 50)
    total = int(lengths.sum())
    users = np.repeat(np.arange(n_users), lengths)
    # zipfian item popularity
    ranks = rng.zipf(1.3, size=total)
    items = np.clip(ranks, 1, n_items) - 1
    within = np.arange(total) - np.repeat(np.cumsum(lengths) - lengths, lengths)
    datetimes = pd.Timestamp("2024-01-01").value + (within * 3600 + rng.integers(0, 3600, size=total)) * 10**9
    return pd.DataFrame(
        {
            Columns.User: users,
            Columns.Item: items,
            Columns.Weight: np.ones(total, dtype=np.float32),
            Columns.Datetime: pd.to_datetime(datetimes),
        }
    )


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--users", type=int, default=200_000)
    parser.add_argument("--epochs", type=int, default=1)
    parser.add_argument("--batch-size", type=int, default=128)
    args = parser.parse_args()

    t0 = time.perf_counter()
    df = make_kion_scale(args.users)
    print(f"synthetic data: {len(df):,} interactions, {args.users:,} users  ({time.perf_counter()-t0:.1f}s)")

    t0 = time.perf_counter()
    dataset = Dataset.construct(df)
    print(f"Dataset.construct: {time.perf_counter()-t0:.1f}s")

    model = SASRecModel(
        n_blocks=2, n_heads=2, n_factors=64, session_max_len=32,
        epochs=args.epochs, batch_size=args.batch_size, loss="sampled_softmax", n_negatives=64, seed=0,
    )
    t0 = time.perf_counter()
    model.fit(dataset)
    fit_s = time.perf_counter() - t0
    n_sessions = df[Columns.User].nunique()
    print(
        f"fit ({args.epochs} epoch): {fit_s:.1f}s  "
        f"{n_sessions * args.epochs / fit_s:,.0f} sessions/s end-to-end"
    )

    t0 = time.perf_counter()
    reco = model.recommend(
        users=np.arange(10_000), dataset=dataset, k=10, filter_viewed=True, on_unsupported_targets="ignore"
    )
    rec_s = time.perf_counter() - t0
    print(f"recommend 10k users @ k=10: {rec_s:.1f}s  ({10_000 / rec_s:,.0f} users/s)  rows={len(reco):,}")


if __name__ == "__main__":
    main()
