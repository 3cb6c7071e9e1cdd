"""Pinned quality-drift evidence for the bf16 default.

``compute_dtype='auto'`` ships bf16 on TPU hardware (the documented
recommended config that bench.py measures) and exact f32 elsewhere. These
tests pin (a) the resolution rule and (b) that bf16 mixed-precision training
reaches the same quality as f32 on a task with a strong learnable signal —
the CI-sized counterpart of the gate-scale evidence (bf16 loss tracks f32 to
4 decimals over 5 epochs on the KION-shaped gate data, PERF_r03.md).
"""

import numpy as np
import pandas as pd
import pytest

from rectools_tpu import Columns
from rectools_tpu.dataset import Dataset
from rectools_tpu.metrics import HitRate
from rectools_tpu.models import SASRecModel


def _cyclic_dataset(n_users: int = 120, n_items: int = 12, session_len: int = 9):
    rng = np.random.default_rng(5)
    rows = []
    test_rows = []
    for u in range(n_users):
        start = int(rng.integers(0, n_items))
        items = [(start + t) % n_items for t in range(session_len + 1)]
        for t, i in enumerate(items[:-1]):
            rows.append((u, i, 1.0, pd.Timestamp("2021-01-01") + pd.Timedelta(days=t)))
        test_rows.append((u, items[-1]))
    df = pd.DataFrame(rows, columns=Columns.Interactions)
    test = pd.DataFrame(test_rows, columns=[Columns.User, Columns.Item])
    return Dataset.construct(df), test


def _model(compute_dtype: str) -> SASRecModel:
    return SASRecModel(
        n_blocks=1,
        n_heads=1,
        n_factors=32,
        session_max_len=10,
        epochs=25,
        batch_size=64,
        lr=0.01,
        dropout_rate=0.0,
        seed=0,
        training_module_kwargs={"compute_dtype": compute_dtype},
    )


def test_auto_resolves_per_backend() -> None:
    import jax

    model = _model("auto")
    # on the CPU test backend auto must resolve to exact f32
    assert jax.default_backend() != "tpu"
    dataset, _ = _cyclic_dataset(n_users=10, session_len=4)
    model.epochs = 1
    model.fit(dataset)
    assert model.training_module.compute_dtype == "auto"  # config keeps "auto"
    assert model.training_module.resolved_compute_dtype == "float32"
    explicit = _model("bfloat16")
    explicit.epochs = 1
    explicit.fit(dataset)
    assert explicit.training_module.resolved_compute_dtype == "bfloat16"


def test_rejects_unknown_dtype() -> None:
    dataset, _ = _cyclic_dataset(n_users=10, session_len=4)
    model = _model("float16")
    with pytest.raises(ValueError, match="compute_dtype"):
        model.fit(dataset)


@pytest.mark.slow
def test_bf16_quality_tracks_f32() -> None:
    """Mixed-precision training must land inside the f32 run's quality band
    on a task where the model has to actually learn (deterministic next-item
    structure, hit@1 > 0.9 required of both)."""
    dataset, test = _cyclic_dataset()
    users = test[Columns.User].unique()

    hits = {}
    for dtype in ("float32", "bfloat16"):
        model = _model(dtype)
        model.fit(dataset)
        reco = model.recommend(users, dataset, k=1, filter_viewed=False)
        hits[dtype] = HitRate(k=1).calc(reco, test)

    assert hits["float32"] > 0.9, hits
    assert hits["bfloat16"] > 0.9, hits
    assert abs(hits["bfloat16"] - hits["float32"]) <= 0.05, hits


def test_steps_per_dispatch_preserves_trajectory() -> None:
    """Fusing k optimizer steps into one dispatch must not change training:
    the per-step RNG stream is fold_in(key, global_step) either way, so the
    loss histories are bit-identical."""
    dataset, _ = _cyclic_dataset(n_users=40, session_len=6)

    def fit(k: int) -> list:
        model = _model("float32")
        model.epochs = 3
        model.training_module_kwargs = {"compute_dtype": "float32", "steps_per_dispatch": k}
        model.fit(dataset)
        return model.training_module.train_loss_history

    assert fit(1) == fit(3)


def test_grouped_dispatch_remainder_preserves_trajectory() -> None:
    """An epoch whose batch count is NOT divisible by steps_per_dispatch
    mixes full k-step dispatches with remainder batches; the remainder goes
    through the compiled single-step path (round-4 advisor: no per-remainder
    recompile) and the trajectory must stay bit-identical."""
    dataset, _ = _cyclic_dataset(n_users=40, session_len=6)

    def fit(k: int) -> list:
        model = _model("float32")
        model.epochs = 2
        model.batch_size = 8  # 40 users -> 5 batches/epoch: 2 groups of 2 + 1 remainder
        model.training_module_kwargs = {"compute_dtype": "float32", "steps_per_dispatch": k}
        model.fit(dataset)
        return model.training_module.train_loss_history

    assert fit(1) == fit(2)
