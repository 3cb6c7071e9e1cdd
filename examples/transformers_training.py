"""Transformer training walkthrough: validation split, checkpointing,
incremental training, multi-device sharding.

Run: python examples/transformers_training.py
(set RECTOOLS_PLATFORM=cpu|tpu to pin the jax platform; unreachable
configured platforms fall back to CPU so the example runs anywhere)
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
from rectools_tpu.models import BERT4RecModel, HSTUModel, SASRecModel
from rectools_tpu.models.nn.transformers import leave_one_out_mask


def make_sessions(n_users: int = 300, n_items: int = 80, seed: int = 0) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    rows = []
    for user in range(n_users):
        n = int(rng.integers(4, 20))
        for t, item in enumerate(rng.integers(0, n_items, size=n)):
            rows.append((user, int(item), 1.0, pd.Timestamp("2024-01-01") + pd.Timedelta(hours=6 * t)))
    return pd.DataFrame(rows, columns=Columns.Interactions)


def main() -> None:
    dataset = Dataset.construct(make_sessions())

    # --- SASRec with a leave-one-out validation split and sampled softmax
    sasrec = SASRecModel(
        n_blocks=2,
        n_heads=2,
        n_factors=64,
        session_max_len=20,
        epochs=2,
        batch_size=64,
        loss="sampled_softmax",
        n_negatives=16,
        get_val_mask_func=leave_one_out_mask,
        seed=0,
        verbose=1,
    )
    sasrec.fit(dataset)
    print("train losses:", [round(x, 4) for x in sasrec.training_module.train_loss_history])
    print("val losses:", [round(x, 4) for x in sasrec.training_module.val_loss_history])

    # --- incremental training
    sasrec.fit_partial(dataset, max_epochs=1)
    print("epochs completed:", sasrec.training_module.epochs_completed)

    # --- checkpoint round-trip
    sasrec.save("/tmp/sasrec_ckpt.pkl")
    restored = SASRecModel.load("/tmp/sasrec_ckpt.pkl")
    reco = restored.recommend(users=[0, 1, 2], dataset=dataset, k=5, filter_viewed=True)
    print(reco.head())

    # --- BERT4Rec (MLM) and HSTU (relative time attention, needs context)
    bert = BERT4RecModel(n_blocks=1, n_heads=2, n_factors=32, session_max_len=20, epochs=1, seed=0)
    bert.fit(dataset)

    hstu = HSTUModel(n_blocks=1, n_heads=2, n_factors=32, session_max_len=20, epochs=1, seed=0)
    hstu.fit(dataset)
    context = pd.DataFrame({Columns.User: [0, 1], Columns.Datetime: pd.Timestamp("2024-03-01")})
    print(hstu.recommend(users=[0, 1], dataset=dataset, k=5, filter_viewed=True, context=context).head())

    # --- early stopping + best-epoch weights + val recall monitoring:
    # callbacks come from a factory (fresh instances per fit) and monitor the
    # per-epoch logs; val_recall@10 is computed on the held-out targets
    from rectools_tpu.models.nn.transformers import BestStateKeeper, EarlyStopping

    def make_callbacks():
        return [
            EarlyStopping(monitor="val_recall@10", patience=2, mode="max"),
            BestStateKeeper(monitor="val_recall@10", mode="max"),
        ]

    tuned = SASRecModel(
        n_blocks=1, n_heads=2, n_factors=32, session_max_len=20, epochs=20, seed=0,
        get_val_mask_func=leave_one_out_mask,
        get_callbacks_func=make_callbacks,
        training_module_kwargs={"val_recall_k": 10},
    )
    tuned.fit(dataset)
    print("epochs actually run:", tuned.training_module.epochs_completed)
    print("val recall history:", tuned.training_module.val_metric_history)

    # --- multi-device data/model-parallel training: shard the batch over 4
    # devices and the embedding feature dim over 2 (requires 8 devices; on a
    # CPU host export XLA_FLAGS=--xla_force_host_platform_device_count=8)
    import jax

    if len(jax.devices()) >= 8:
        sharded = SASRecModel(
            n_blocks=2, n_heads=2, n_factors=64, session_max_len=20, epochs=1, batch_size=64,
            seed=0, training_module_kwargs={"mesh_shape": (4, 2)},
        )
        sharded.fit(dataset)
        print("sharded fit OK")


if __name__ == "__main__":
    main()
