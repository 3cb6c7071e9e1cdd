"""Quality-gate push runs: longer SASRec budget + selective-bf16 validation.

Two focused TPU runs on the gate's synthetic ML-1M-scale dataset:

1. ``sasrec_120ep`` — the gate's SASRec (sampled_softmax, 128 negatives) with
   a 120-epoch budget + BestStateKeeper: QUALITY_r02.md notes the 40-epoch row
   (recall@10 0.197) was still improving; this measures the converged number.
2. ``sasrec_bf16`` — the same 40-epoch config with
   ``compute_dtype="bfloat16"`` (selective cast: matmuls bf16, loss/lse f32).
   PERF_r02.json shows +15% step throughput; this checks end-to-end QUALITY is
   preserved, which a 30-step loss comparison cannot.

Results are appended to QUALITY_r02.json under "push_runs" and summarized in
QUALITY_r02.md.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/quality_gate_push.py
"""

import json
import sys
import time
from pathlib import Path

import pandas as pd

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import benchmarks.quality_gate as qg  # noqa: E402

log = qg.log
K = qg.K


def main() -> None:
    import jax

    log(f"backend: {jax.default_backend()}")
    df, _ = qg.generate_dataset()
    train, test = qg.split_leave_one_out(df)

    from rectools_tpu.dataset import Dataset
    from rectools_tpu.models.nn.transformers import (
        BestStateKeeper,
        SASRecModel,
        leave_one_out_mask,
    )

    ds = Dataset.construct(train)
    users = test["user_id"].unique()

    def keeper():
        return [BestStateKeeper(monitor=f"val_recall@{K}", mode="max")]

    common = dict(
        n_blocks=2,
        n_heads=4,
        n_factors=64,
        session_max_len=100,
        batch_size=128,
        lr=1e-3,
        loss="sampled_softmax",
        n_negatives=128,
        get_val_mask_func=leave_one_out_mask,
        get_callbacks_func=keeper,
        seed=32,
        verbose=1,
    )

    specs = {
        "sasrec_120ep": lambda: SASRecModel(
            epochs=120, training_module_kwargs={"val_recall_k": K}, **common
        ),
        "sasrec_bf16_40ep": lambda: SASRecModel(
            epochs=40,
            training_module_kwargs={"val_recall_k": K, "compute_dtype": "bfloat16"},
            **common,
        ),
    }

    results = {}
    for name, build in specs.items():
        t = time.time()
        try:
            model = build()
            model.fit(ds)
            reco = model.recommend(users, ds, k=K, filter_viewed=True)
            row = {**qg.evaluate(reco, test), "fit+reco_s": round(time.time() - t, 1)}
            history = getattr(model.training_module, "val_metric_history", {})
            curve = history.get(f"val_recall@{K}")
            if curve:
                row["val_recall_curve"] = [round(float(v), 4) for v in curve]
            results[name] = row
            log(f"push/{name}: {row}")
        except Exception as exc:
            import traceback

            traceback.print_exc()
            results[name] = {"error": repr(exc)}
            log(f"push/{name}: FAILED {exc!r}")

    out = json.loads((REPO / "QUALITY_r02.json").read_text())
    out.setdefault("push_runs", {}).update(results)
    (REPO / "QUALITY_r02.json").write_text(json.dumps(out, indent=1))
    log("QUALITY_r02.json updated")


if __name__ == "__main__":
    main()
