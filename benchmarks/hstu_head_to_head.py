"""Head-to-head HSTU/SASRec training-dynamics parity vs the reference.

QUALITY_r02.md flags one open question: our HSTU plateaus at val
recall ~0.08 on the synthetic gate data while SASRec reaches 0.41 — is the
plateau implementation drift or an objective/architecture property of the
data? The math-parity tests pin the forward (STU kernel == reference torch
to 3e-4) but not the *training dynamics*.

This harness answers it by training the REFERENCE's own torch modules
(imported with the lightning stub from tests/parity, driven by a manual
epoch loop that replicates `TransformerLightningModule`: `on_train_start`
Xavier re-init, `configure_optimizers` Adam(0.9, 0.98), `training_step`
per batch — reference rectools/models/nn/transformers/lightning.py:214-369,
base.py:466-489) on the SAME synthetic data our models see, then evaluating
both through the identical leave-one-out protocol.

If reference HSTU matches our HSTU (and both trail SASRec), the plateau is
objective mismatch and the quality gate stands closed. If reference HSTU
beats ours, there is a real training-dynamics bug to find.

Run (CPU; reference is torch-CPU anyway):
  env -u PALLAS_AXON_POOL_IPS PYTHONPATH=/root/repo python \
      benchmarks/hstu_head_to_head.py [--scale small|full] [--epochs N]
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

# the tunnel's site hook pins JAX_PLATFORMS=axon; this harness is CPU-only
# (the reference side is torch-CPU, and small-scale jax runs fine on host)
jax.config.update("jax_platforms", "cpu")

from benchmarks import quality_gate as qg  # noqa: E402

T0 = time.time()


def log(msg: str) -> None:
    print(f"[h2h +{time.time() - T0:7.1f}s] {msg}", flush=True)


def _import_reference():
    """Reference import with the same compat shims as tests/parity."""
    import typeguard as loaded_typeguard

    if not hasattr(loaded_typeguard, "TypeCheckError"):
        import importlib.util

        shim_path = REPO / "tests" / "parity" / "implicit_stub" / "typeguard.py"
        spec = importlib.util.spec_from_file_location("_typeguard_shim", shim_path)
        shim = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(shim)
        loaded_typeguard.TypeCheckError = shim.TypeCheckError
        loaded_typeguard.check_type = shim.check_type
    if "/root/reference" not in sys.path:
        sys.path.append("/root/reference")
    if not getattr(pd.unique, "_parity_coercion", False):
        original_unique = pd.unique

        def unique_compat(values):
            if isinstance(values, (tuple, list)):
                as_array = np.asarray(values)
                if as_array.dtype.kind not in "iufb":
                    as_array = np.array(values, dtype=object)
                values = as_array
            return original_unique(values)

        unique_compat._parity_coercion = True
        pd.unique = unique_compat


def subsample(df: pd.DataFrame, n_users: int, tail: int) -> pd.DataFrame:
    sub = df[df["user_id"] < n_users]
    sub = (
        sub.sort_values(["user_id", "datetime"], kind="stable")
        .groupby("user_id")
        .tail(tail)
        .reset_index(drop=True)
    )
    return sub


def _context(train: pd.DataFrame) -> pd.DataFrame:
    last_dt = train.groupby("user_id")["datetime"].max() + pd.Timedelta(hours=1)
    return pd.DataFrame({"user_id": last_dt.index, "datetime": last_dt.to_numpy()})


# ------------------------------------------------------------ reference side


def train_reference(model, ref_dataset, epochs: int, seed: int = 32) -> list:
    """Manual replication of the reference lightning fit loop."""
    import torch

    torch.manual_seed(seed)
    np.random.seed(seed)
    model._build_model_from_dataset(ref_dataset)  # pylint: disable=protected-access
    lm = model.lightning_model
    lm.train()
    lm.on_train_start()  # Xavier re-init (reference lightning.py:296-299)
    opt = lm.configure_optimizers()
    loader = model.data_preparator.get_dataloader_train()
    losses = []
    for epoch in range(epochs):
        total, n_batches = 0.0, 0
        for i, batch in enumerate(loader):
            opt.zero_grad()
            loss = lm.training_step(batch, i)
            loss.backward()
            opt.step()
            total += float(loss.detach())
            n_batches += 1
        losses.append(round(total / max(n_batches, 1), 4))
        if epoch % 5 == 0 or epoch == epochs - 1:
            log(f"  ref epoch {epoch}: loss {losses[-1]}")
    lm.eval()
    model.is_fitted = True
    return losses


def run_reference(
    train: pd.DataFrame,
    test: pd.DataFrame,
    epochs: int,
    hyper: dict,
    models: tuple = ("hstu", "sasrec"),
    seed: int = 32,
    context_df: "pd.DataFrame" = None,
    per_model_hyper: dict = None,
) -> dict:
    _import_reference()
    from rectools.dataset import Dataset as RefDataset
    from rectools.models.nn.transformers.bert4rec import BERT4RecModel as RefBERT4Rec
    from rectools.models.nn.transformers.hstu import HSTUModel as RefHSTU
    from rectools.models.nn.transformers.ligr import LiGRLayers as RefLiGRLayers
    from rectools.models.nn.transformers.sasrec import SASRecModel as RefSASRec

    factories = {
        "hstu": lambda **kw: RefHSTU(**kw),
        "sasrec": lambda **kw: RefSASRec(**kw),
        "bert4rec": lambda **kw: RefBERT4Rec(**kw),
        "esasrec": lambda **kw: RefSASRec(transformer_layers_type=RefLiGRLayers, **kw),
    }
    ds = RefDataset.construct(train)
    users = test["user_id"].unique()
    out = {}
    for name in models:
        t = time.time()
        kw = {**hyper, **(per_model_hyper or {}).get(name, {})}
        kw = {k: v for k, v in kw.items() if v is not None}  # None override = drop the key
        # logits temperature rides the side-specific kwargs channel (the HSTU
        # tutorial's logits_t=0.05 — reference lightning.py:111)
        logits_t = kw.pop("logits_t", None)
        if logits_t is not None:
            kw["lightning_module_kwargs"] = {"logits_t": logits_t}
        model = factories[name](get_trainer_func=lambda: None, epochs=epochs, **kw)
        losses = train_reference(model, ds, epochs, seed=seed)
        kwargs = {}
        if getattr(model, "require_recommend_context", False):
            kwargs["context"] = context_df if context_df is not None else _context(train)
        reco = model.recommend(users, ds, k=qg.K, filter_viewed=True, **kwargs)
        out[name] = {
            **qg.evaluate(reco, test),
            "train_loss": losses,
            "fit+reco_s": round(time.time() - t, 1),
        }
        log(f"reference/{name}: {out[name]['recall@10'] if 'recall@10' in out[name] else out[name]}")
    return out


# ------------------------------------------------------------------ our side


def run_ours(
    train: pd.DataFrame,
    test: pd.DataFrame,
    epochs: int,
    hyper: dict,
    models: tuple = ("hstu", "sasrec"),
    seed: int = 32,
    context_df: "pd.DataFrame" = None,
    per_model_hyper: dict = None,
) -> dict:
    from rectools_tpu.dataset import Dataset
    from rectools_tpu.models.nn.transformers import BERT4RecModel, HSTUModel, SASRecModel
    from rectools_tpu.models.nn.transformers.ligr import LiGRLayers

    factories = {
        "hstu": lambda **kw: HSTUModel(**kw),
        "sasrec": lambda **kw: SASRecModel(**kw),
        "bert4rec": lambda **kw: BERT4RecModel(**kw),
        "esasrec": lambda **kw: SASRecModel(transformer_layers_type=LiGRLayers, **kw),
    }
    ds = Dataset.construct(train)
    users = test["user_id"].unique()
    out = {}
    for name in models:
        t = time.time()
        kw = {**hyper, **(per_model_hyper or {}).get(name, {})}
        kw = {k: v for k, v in kw.items() if v is not None}  # None override = drop the key
        logits_t = kw.pop("logits_t", None)
        if logits_t is not None:
            kw["training_module_kwargs"] = {"logits_t": logits_t}
        model = factories[name](epochs=epochs, seed=seed, **kw)
        model.fit(ds)
        kwargs = {}
        if getattr(model, "require_recommend_context", False):
            kwargs["context"] = context_df if context_df is not None else _context(train)
        reco = model.recommend(users, ds, k=qg.K, filter_viewed=True, **kwargs)
        losses = [round(float(x), 4) for x in model.training_module.train_loss_history]
        out[name] = {
            **qg.evaluate(reco, test),
            "train_loss": losses,
            "fit+reco_s": round(time.time() - t, 1),
        }
        log(f"tpu/{name}: {out[name]}")
    return out


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--scale", choices=["small", "full"], default="small")
    parser.add_argument("--epochs", type=int, default=30)
    parser.add_argument("--models", default="hstu,sasrec",
                        help="comma list of hstu,sasrec,bert4rec,esasrec")
    parser.add_argument("--seeds", default="32", help="comma list of seeds")
    parser.add_argument("--out", default=None)
    args = parser.parse_args()
    models = tuple(args.models.split(","))
    seeds = [int(s) for s in args.seeds.split(",")]

    df, _ = qg.generate_dataset(0)
    if args.scale == "small":
        data = subsample(df, n_users=1500, tail=48)
        hyper = dict(
            n_blocks=2, n_heads=4, n_factors=64, session_max_len=40,
            batch_size=128, lr=1e-3, loss="sampled_softmax", n_negatives=128,
        )
    else:
        data = df
        hyper = dict(
            n_blocks=2, n_heads=4, n_factors=64, session_max_len=100,
            batch_size=128, lr=1e-3, loss="sampled_softmax", n_negatives=128,
        )
    train, test = qg.split_leave_one_out(data)
    log(f"scale={args.scale}: {len(data)} interactions, {data['user_id'].nunique()} users")

    # BERT4Rec trains on the gate's config (full softmax over the catalog,
    # MLM masking) — sampled_softmax + n_negatives is the shifted-sequence
    # families' objective and not what quality_gate.py:231 measures.
    per_model_hyper = {"bert4rec": {"loss": "softmax", "n_negatives": None}}

    results = {
        "scale": args.scale, "epochs": args.epochs, "hyper": hyper, "seeds": seeds,
        "per_model_hyper": per_model_hyper,
    }
    for seed in seeds:
        results[f"reference_seed{seed}"] = run_reference(
            train, test, args.epochs, hyper, models, seed, per_model_hyper=per_model_hyper)
        results[f"tpu_seed{seed}"] = run_ours(
            train, test, args.epochs, hyper, models, seed, per_model_hyper=per_model_hyper)
    results["reference"] = results[f"reference_seed{seeds[0]}"]
    results["tpu"] = results[f"tpu_seed{seeds[0]}"]

    out_path = args.out or f"/tmp/hstu_h2h_{args.scale}.json"
    Path(out_path).write_text(json.dumps(results, indent=1))
    log(f"wrote {out_path}")
    for side in ("reference", "tpu"):
        for name, r in results[side].items():
            log(f"{side}/{name}: recall@10={r.get('recall@10')} ndcg@10={r.get('ndcg@10')}")


if __name__ == "__main__":
    main()
