"""Converged-budget anchors for eSASRec and BERT4Rec (VERDICT r3 item 6).

QUALITY_r02 attributed three regressed transformer rows to early-stopping
variance but only SASRec had the fixed-budget run that proves the claim.
This adds the same 120-epoch BestStateKeeper anchors for the other two
families on the gate's synthetic ML-1M-scale dataset:

  esasrec_120ep   SASRec + LiGR layers + sampled softmax (the gate's
                  eSASRec config, quality_gate.py:225-230)
  bert4rec_120ep  BERT4Rec, MLM mask_prob 0.15, softmax loss (gate config)

Results land in QUALITY_r03.json under "push_runs".

Run:  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/quality_push_r03.py
"""

import json
import sys
import time
from pathlib import Path

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
        BERT4RecModel,
        BestStateKeeper,
        SASRecModel,
        leave_one_out_mask,
    )
    from rectools_tpu.models.nn.transformers.ligr import LiGRLayers

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
        get_val_mask_func=leave_one_out_mask,
        get_callbacks_func=keeper,
        seed=32,
        verbose=1,
        epochs=120,
        training_module_kwargs={"val_recall_k": K},
    )

    specs = {
        "esasrec_120ep": lambda: SASRecModel(
            transformer_layers_type=LiGRLayers, loss="sampled_softmax", n_negatives=128, **common
        ),
        "bert4rec_120ep": lambda: BERT4RecModel(loss="softmax", **common),
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
            log(f"push/{name}: { {k: v for k, v in row.items() if k != 'val_recall_curve'} }")
        except Exception as exc:
            import traceback

            traceback.print_exc()
            results[name] = {"error": repr(exc)}
            log(f"push/{name}: FAILED {exc!r}")

    path = REPO / "QUALITY_r03.json"
    out = json.loads(path.read_text()) if path.exists() else {}
    out.setdefault("push_runs", {}).update(results)
    path.write_text(json.dumps(out, indent=1))
    log("QUALITY_r03.json updated")


if __name__ == "__main__":
    main()
