"""Two-stage pipeline end-to-end quality: reranker lift over its generators.

VERDICT r3 item 5: CandidateRankingModel was contract-tested but had no
quality row showing the second stage actually helps. This benchmark builds a
dataset whose next-item distribution mixes two orthogonal signals —
popularity and latent user-item affinity — so that each first-stage
generator (PopularModel, ItemKNNModel) captures one signal and a reranker
over their rank/score features can combine them.

Reported per seed: recall@10 of each generator served alone, and of the
two-stage model (same catalog, same filtering). The headline number is
``lift`` = two_stage - best single generator. Mirrors the reference's
two-stage tutorial evidence (examples/8_two_stage_models.ipynb) on the
synthetic board.

Run (CPU):
  env -u PALLAS_AXON_POOL_IPS PYTHONPATH=/root/repo python \
      benchmarks/two_stage_lift.py [--seeds 32,33,34]
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

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from benchmarks import quality_gate as qg  # noqa: E402

T0 = time.time()
N_USERS, N_ITEMS, LATENT = 1200, 500, 12
POP_WEIGHT = 2.2
AFFINITY_WEIGHT = 3.0


def log(msg: str) -> None:
    print(f"[two-stage +{time.time() - T0:7.1f}s] {msg}", flush=True)


def generate(seed: int):
    """Segmented users: a per-user mixing weight (observable as a user
    feature) decides whether popularity or latent affinity drives the next
    item. Neither single-signal generator can adapt per user; the reranker
    with the segment feature can."""
    rng = np.random.default_rng(seed)
    u_lat = rng.normal(size=(N_USERS, LATENT)).astype(np.float32) / np.sqrt(LATENT)
    i_lat = rng.normal(size=(N_ITEMS, LATENT)).astype(np.float32)
    pop_bias = -np.log1p(np.argsort(np.argsort(-rng.normal(size=N_ITEMS)))).astype(np.float32)
    segment = (rng.random(N_USERS) < 0.5).astype(np.float32)  # 1 = popularity-driven
    mix = segment[:, None]
    logits = mix * (POP_WEIGHT * pop_bias[None, :]) + (1.0 - mix) * (AFFINITY_WEIGHT * (u_lat @ i_lat.T))

    rows = []
    for u in range(N_USERS):
        p = np.exp(logits[u] - logits[u].max())
        p /= p.sum()
        items = rng.choice(N_ITEMS, size=int(rng.integers(12, 22)), replace=False, p=p)
        for t, i in enumerate(items):
            rows.append((u, int(i), 1.0, pd.Timestamp("2023-06-01") + pd.Timedelta(hours=t)))
    df = pd.DataFrame(rows, columns=["user_id", "item_id", "weight", "datetime"])
    return df, segment


def main() -> None:
    from sklearn.ensemble import HistGradientBoostingClassifier

    from rectools_tpu.dataset import Dataset
    from rectools_tpu.model_selection import LastNSplitter
    from rectools_tpu.models import ItemKNNModel, PopularModel
    from rectools_tpu.models.ranking import (
        CandidateFeatureCollector,
        CandidateGenerator,
        CandidateRankingModel,
        PerUserNegativeSampler,
        Reranker,
    )

    parser = argparse.ArgumentParser()
    parser.add_argument("--seeds", default="32,33,34")
    parser.add_argument("--num-candidates", type=int, default=100)
    parser.add_argument("--out", default=None)
    args = parser.parse_args()
    seeds = [int(s) for s in args.seeds.split(",")]

    results: dict = {
        "n_users": N_USERS, "n_items": N_ITEMS, "latent": LATENT,
        "pop_weight": POP_WEIGHT, "affinity_weight": AFFINITY_WEIGHT,
        "num_candidates": args.num_candidates, "seeds": seeds,
    }
    lifts = []
    for seed in seeds:
        df, segment = generate(seed)
        train, test = qg.split_leave_one_out(df)

        class SegmentCollector(CandidateFeatureCollector):
            """Passes the per-user segment through to the reranker features
            (the CandidateFeatureCollector extension hook)."""

            def _get_user_features(self, users, dataset, fold_info):
                users = np.asarray(users)
                return pd.DataFrame({"user_id": users, "segment": segment[users]})

        ds = Dataset.construct(train)
        users = test["user_id"].unique()
        row = {}
        for name, model in (
            ("popular", PopularModel()),
            ("itemknn", ItemKNNModel(K=30, variant="cosine")),
        ):
            model.fit(ds)
            reco = model.recommend(users, ds, k=qg.K, filter_viewed=True)
            row[name] = qg.evaluate(reco, test)

        two_stage = CandidateRankingModel(
            candidate_generators=[
                CandidateGenerator(PopularModel(), args.num_candidates, keep_ranks=True, keep_scores=True,
                                   scores_fillna_value=0.0, ranks_fillna_value=float(args.num_candidates + 1)),
                CandidateGenerator(ItemKNNModel(K=30, variant="cosine"), args.num_candidates,
                                   keep_ranks=True, keep_scores=True,
                                   scores_fillna_value=0.0, ranks_fillna_value=float(args.num_candidates + 1)),
            ],
            splitter=LastNSplitter(3, 1, False, False, True),  # 3 reranker targets per user
            sampler=PerUserNegativeSampler(n_negatives=10, random_state=seed),
            # GBDT-class reranker: the sklearn stand-in for the reference's
            # CatBoost default (scale-free, non-linear in rank/score features)
            reranker=Reranker(HistGradientBoostingClassifier(random_state=seed)),
            feature_collector=SegmentCollector(),
        )
        two_stage.fit(ds)
        reco = two_stage.recommend(users, ds, k=qg.K, filter_viewed=True, on_unsupported_targets="ignore")
        row["two_stage"] = qg.evaluate(reco, test)
        best_single = max(row["popular"]["recall@10"], row["itemknn"]["recall@10"])
        row["lift_recall@10"] = round(row["two_stage"]["recall@10"] - best_single, 4)
        lifts.append(row["lift_recall@10"])
        results[f"seed{seed}"] = row
        log(f"seed {seed}: popular {row['popular']['recall@10']} itemknn {row['itemknn']['recall@10']} "
            f"two-stage {row['two_stage']['recall@10']} lift {row['lift_recall@10']}")
        out_path = args.out or "/tmp/two_stage_lift.json"
        results["mean_lift_recall@10"] = round(float(np.mean(lifts)), 4)
        Path(out_path).write_text(json.dumps(results, indent=1))
    log(f"mean lift over best single generator: {results['mean_lift_recall@10']}")


if __name__ == "__main__":
    main()
