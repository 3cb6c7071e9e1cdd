"""Long-session training: session_max_len as a config knob.

The reference library truncates sessions to ``session_max_len`` (default
100) and materializes dense (B, H, L, L) attention, so long histories are
out of reach there. Here both attention families are blockwise Pallas
kernels whose VMEM footprint is O(block_q * L) in forward AND backward, so
long sessions are just a constructor argument:

- SASRec/BERT4Rec/eSASRec: `ops/attention.py` (softmax), measured at 48% of
  the f32 MXU peak at L=1024 on a v5e chip (PERF_r02.md `long_ctx`).
- HSTU: `ops/stu_attention.py` (SiLU-normalized STU with relative time/pos
  biases precomputed scatter-free), trains at B=256 x L=1024 on one 16 GB
  chip under `remat=True` — a shape whose score tensor (4.3 GB) cannot even
  be materialized.

This example runs a SCALED-DOWN version of both (L=512, small catalog) so
it finishes quickly anywhere; on TPU the same code holds at L=1024+ and
production batch sizes.

Run: python examples/long_sessions.py
(set RECTOOLS_PLATFORM=cpu|tpu to pin the jax platform)
"""

import os

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
from rectools_tpu.models import HSTUModel, SASRecModel

L = 512  # session cap — the knob; raise to 1024+ on real hardware
# catalog much larger than a session so filter_viewed leaves items to rank
N_USERS, N_ITEMS, EVENTS_PER_USER = 40, 2000, 600


def make_long_sessions(seed: int = 0) -> pd.DataFrame:
    """Users with ~600-event histories (longer than the session cap)."""
    rng = np.random.default_rng(seed)
    rows = []
    for u in range(N_USERS):
        items = rng.integers(0, N_ITEMS, size=EVENTS_PER_USER)
        for t, i in enumerate(items):
            rows.append((u, int(i), 1.0, pd.Timestamp("2025-01-01") + pd.Timedelta(minutes=t)))
    return pd.DataFrame(rows, columns=Columns.Interactions)


def main() -> None:
    dataset = Dataset.construct(make_long_sessions())
    users = np.arange(5)

    # --- SASRec with a long session window (blockwise softmax attention).
    # remat=True keeps the per-block activations out of HBM in the backward —
    # the knob that fits long-context configs at production batch sizes.
    sasrec = SASRecModel(
        n_blocks=1,
        n_heads=2,
        n_factors=32,
        session_max_len=L,
        batch_size=8,
        epochs=1,
        training_module_kwargs={"remat": True},
        seed=0,
    )
    sasrec.fit(dataset)
    print("SASRec @ L=%d:" % L)
    print(sasrec.recommend(users, dataset, k=5, filter_viewed=True).head())

    # --- HSTU with relative time attention over the same long window.
    # Requires a recommendation-time context (the time the recs are "for").
    hstu = HSTUModel(
        n_blocks=1,
        n_heads=2,
        n_factors=32,
        session_max_len=L,
        batch_size=8,
        epochs=1,
        training_module_kwargs={"remat": True},
        seed=0,
    )
    hstu.fit(dataset)
    context = pd.DataFrame({Columns.User: users, Columns.Datetime: pd.Timestamp("2025-02-01")})
    print("HSTU @ L=%d:" % L)
    print(hstu.recommend(users, dataset, k=5, filter_viewed=True, context=context).head())


if __name__ == "__main__":
    main()
