"""DSSM head-to-head: our jax two-tower vs the reference's torch DSSM.

VERDICT r3 item 5: DSSM was the only model family with no quality evidence.
This benchmark generates a dataset where a feature-driven two-tower model has
real signal — observable dense user/item features are noisy views of the
latent factors that generated the interactions — and trains both
implementations at the same architecture/hyperparameters on the same split.

The reference side (rectools/models/nn/dssm.py:54-411) trains through
pytorch-lightning; lightning is absent in this image, so the fit loop is
replicated manually exactly as the transformer h2h does
(hstu_head_to_head.train_reference): same module, same Adam
(lr + weight_decay through torch.optim.Adam), same shuffled DataLoader,
same epochs. Inference and ranking go through the reference's own
recommend path (VectorModel -> implicit-stub exact topk).

Anchors: a popularity baseline (feature-blind floor) and the Bayes oracle
ranking under the true latent factors (ceiling).

Run (CPU on both sides):
  env -u PALLAS_AXON_POOL_IPS PYTHONPATH=/root/repo python \
      benchmarks/dssm_head_to_head.py [--epochs N] [--seeds 32,33,34]
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

T0 = time.time()
N_USERS, N_ITEMS, LATENT = 1500, 600, 16
FEATURE_NOISE = 0.35
LOGIT_SCALE = 3.0


def log(msg: str) -> None:
    print(f"[dssm-h2h +{time.time() - T0:7.1f}s] {msg}", flush=True)


def generate(seed: int):
    """Latent-factor interactions with noisy dense feature views."""
    rng = np.random.default_rng(seed)
    u_lat = rng.normal(size=(N_USERS, LATENT)).astype(np.float32) / np.sqrt(LATENT)
    i_lat = rng.normal(size=(N_ITEMS, LATENT)).astype(np.float32)

    logits = LOGIT_SCALE * (u_lat @ i_lat.T)
    rows = []
    for u in range(N_USERS):
        p = np.exp(logits[u] - logits[u].max())
        p /= p.sum()
        n_events = int(rng.integers(12, 25))
        items = rng.choice(N_ITEMS, size=n_events, replace=False, p=p)
        for t, i in enumerate(items):
            rows.append((u, int(i), 1.0, pd.Timestamp("2023-01-01") + pd.Timedelta(hours=t)))
    df = pd.DataFrame(rows, columns=["user_id", "item_id", "weight", "datetime"])

    def feature_frame(latent: np.ndarray, ids: np.ndarray) -> pd.DataFrame:
        observed = latent + FEATURE_NOISE * rng.normal(size=latent.shape).astype(np.float32)
        frame = pd.DataFrame(observed, columns=[f"f{j}" for j in range(latent.shape[1])])
        frame.insert(0, "id", ids)
        return frame

    user_f = feature_frame(u_lat, np.arange(N_USERS))
    item_f = feature_frame(i_lat, np.arange(N_ITEMS))
    return df, user_f, item_f, (u_lat, i_lat, logits)


def oracle(train: pd.DataFrame, truth, k: int = 10) -> pd.DataFrame:
    _, _, logits = truth
    scores = logits.copy()
    scores[train["user_id"].to_numpy(), train["item_id"].to_numpy()] = -1e9
    top = np.argsort(-scores, axis=1)[:, :k]
    return pd.DataFrame(
        {
            "user_id": np.repeat(np.arange(N_USERS), k),
            "item_id": top.reshape(-1),
            "rank": np.tile(np.arange(1, k + 1), N_USERS),
        }
    )


def run_ours(train, user_f, item_f, test, epochs: int, hyper: dict, seed: int) -> dict:
    from rectools_tpu.dataset import Dataset
    from rectools_tpu.models import DSSMModel

    ds = Dataset.construct(
        train, user_features_df=user_f, make_dense_user_features=True,
        item_features_df=item_f, make_dense_item_features=True,
    )
    t = time.time()
    model = DSSMModel(max_epochs=epochs, random_state=seed, **hyper)
    model.fit(ds)
    reco = model.recommend(test["user_id"].unique(), ds, k=qg.K, filter_viewed=True)
    out = {**qg.evaluate(reco, test), "fit+reco_s": round(time.time() - t, 1)}
    out["loss_curve"] = [round(x, 4) for x in model.train_loss_history]
    log(f"tpu/dssm: {out}")
    return out


def run_reference(train, user_f, item_f, test, epochs: int, hyper: dict, seed: int) -> dict:
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import torch
    from torch.utils.data import DataLoader

    from rectools.dataset import Dataset as RefDataset
    import rectools.models.nn.dssm as ref_dssm_mod
    from rectools.models.nn.dssm import DSSM as RefDSSMNet, DSSMModel as RefDSSMModel

    # the lightning stub's Trainer raises by design; the fit loop below
    # replaces it, so the model ctor just needs a placeholder
    ref_dssm_mod.Trainer = lambda *a, **k: None

    ds = RefDataset.construct(
        train, user_features_df=user_f, make_dense_user_features=True,
        item_features_df=item_f, make_dense_item_features=True,
    )
    t = time.time()
    torch.manual_seed(seed)
    np.random.seed(seed)
    model = RefDSSMModel(max_epochs=epochs, batch_size=hyper["batch_size"], n_factors=hyper["n_factors"])
    # manual replication of the lightning fit (lightning absent in this image)
    net = RefDSSMNet(
        n_factors_user=hyper["n_factors"],
        n_factors_item=hyper["n_factors"],
        dim_input_user=ds.user_features.get_sparse().shape[1],
        dim_input_item=ds.item_features.get_sparse().shape[1],
        dim_interactions=ds.get_user_item_matrix().shape[1],
        lr=hyper["lr"],
        triplet_loss_margin=hyper["triplet_loss_margin"],
        weight_decay=hyper["weight_decay"],
    )
    net.train()
    opt = net.configure_optimizers()
    loader = DataLoader(model.train_dataset_type.from_dataset(ds), batch_size=hyper["batch_size"], shuffle=True)
    loss_curve = []
    for epoch in range(epochs):
        total, n_batches = 0.0, 0
        for i, batch in enumerate(loader):
            opt.zero_grad()
            loss = net.training_step(batch, i)
            loss.backward()
            opt.step()
            total += float(loss.detach())
            n_batches += 1
        loss_curve.append(round(total / max(n_batches, 1), 4))
        if epoch % 5 == 0 or epoch == epochs - 1:
            log(f"  ref epoch {epoch}: loss {loss_curve[-1]:.4f}")
    net.eval()
    model.model = net
    model.is_fitted = True
    reco = model.recommend(test["user_id"].unique(), ds, k=qg.K, filter_viewed=True)
    out = {**qg.evaluate(reco, test), "fit+reco_s": round(time.time() - t, 1)}
    out["loss_curve"] = loss_curve
    log(f"reference/dssm: {out}")
    return out


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--epochs", type=int, default=15)
    parser.add_argument("--seeds", default="32,33,34,35,36,37,38,39,40,41")
    parser.add_argument("--out", default=None)
    args = parser.parse_args()
    seeds = [int(s) for s in args.seeds.split(",")]

    df, user_f, item_f, truth = generate(0)
    train, test = qg.split_leave_one_out(df)
    hyper = dict(n_factors=64, batch_size=128, lr=0.01, triplet_loss_margin=0.4, weight_decay=1e-6)

    from rectools_tpu.dataset import Dataset
    from rectools_tpu.models import PopularModel

    pop_ds = Dataset.construct(train)
    pop = PopularModel().fit(pop_ds)
    pop_reco = pop.recommend(test["user_id"].unique(), pop_ds, k=qg.K, filter_viewed=True)

    results = {
        "n_users": N_USERS, "n_items": N_ITEMS, "latent": LATENT,
        "feature_noise": FEATURE_NOISE, "epochs": args.epochs, "hyper": hyper, "seeds": seeds,
        "oracle_latent": qg.evaluate(oracle(train, truth), test),
        "popular_baseline": qg.evaluate(pop_reco, test),
    }
    log(f"{len(df)} interactions; oracle {results['oracle_latent']} popular {results['popular_baseline']}")

    for seed in seeds:
        results[f"tpu_seed{seed}"] = run_ours(train, user_f, item_f, test, args.epochs, hyper, seed)
        results[f"reference_seed{seed}"] = run_reference(train, user_f, item_f, test, args.epochs, hyper, seed)
        tpu = np.array([results[f"tpu_seed{s}"]["recall@10"] for s in seeds if f"tpu_seed{s}" in results])
        ref = np.array(
            [results[f"reference_seed{s}"]["recall@10"] for s in seeds if f"reference_seed{s}" in results]
        )
        diffs = tpu - ref
        results["summary"] = {
            "tpu_mean": round(float(tpu.mean()), 5),
            "tpu_median": round(float(np.median(tpu)), 5),
            "ref_mean": round(float(ref.mean()), 5),
            "ref_median": round(float(np.median(ref)), 5),
            "paired_diff_mean": round(float(diffs.mean()), 5),
            "paired_diff_median": round(float(np.median(diffs)), 5),
            "paired_t": round(
                float(diffs.mean() / (diffs.std(ddof=1) / np.sqrt(len(diffs)))) if len(diffs) > 1 else float("nan"),
                3,
            ),
            "tpu_below_cells": int((diffs < 0).sum()),
            "n_cells": len(diffs),
            # convergence check: a reference cell whose final-epoch loss sits
            # far above the cohort is an underconverged arm, not evidence
            "ref_final_losses": [results[f"reference_seed{s}"]["loss_curve"][-1] for s in seeds
                                 if f"reference_seed{s}" in results],
        }
        out_path = args.out or "/tmp/dssm_h2h.json"
        Path(out_path).write_text(json.dumps(results, indent=1))
        log(f"wrote {out_path} (through seed {seed})")


if __name__ == "__main__":
    main()
