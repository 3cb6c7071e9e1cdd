"""Case registry for the frozen parity fixtures.

Each case is a function computing a JSON-able payload from ONE library
(either the reference RecTools or rectools_tpu) behind a small env adapter.
`record.py` runs every case against the live reference at /root/reference and
freezes the payloads into fixtures.json; `test_frozen.py` recomputes them
with rectools_tpu and compares against the frozen values — NO reference
import at test time, so the coverage survives reference/pandas/stub drift
(the reference's own literal-fixture style, tests/models/data.py:20-41 there).

Inputs are regenerated deterministically from seeds pinned here; they mirror
tests/parity/*'s fixtures so the live head-to-head suite (the opt-in job)
and the frozen suite exercise identical data.
"""

import typing as tp
from datetime import timedelta

import numpy as np
import pandas as pd
from scipy import sparse

# --------------------------------------------------------------------- inputs


def metrics_tables():
    rng = np.random.default_rng(11)
    n_users, n_items, k = 120, 60, 10
    users = np.repeat(np.arange(n_users), k)
    reco = pd.DataFrame(
        {
            "user_id": users,
            "item_id": np.concatenate([rng.choice(n_items, k, replace=False) for _ in range(n_users)]),
            "rank": np.tile(np.arange(1, k + 1), n_users),
        }
    )
    n_inter = 3000
    interactions = pd.DataFrame(
        {
            "user_id": rng.integers(0, n_users, n_inter),
            "item_id": (rng.zipf(1.4, n_inter) - 1) % n_items,
        }
    ).drop_duplicates()
    prev = pd.DataFrame(
        {
            "user_id": rng.integers(0, n_users, n_inter),
            "item_id": (rng.zipf(1.4, n_inter) - 1) % n_items,
        }
    ).drop_duplicates()
    catalog = np.arange(n_items)
    return reco, interactions, prev, catalog


def model_interactions() -> pd.DataFrame:
    rng = np.random.default_rng(7)
    n = 6000
    items = (rng.zipf(1.5, size=n) - 1) % 90
    users = rng.integers(0, 200, n)
    return pd.DataFrame(
        {
            "user_id": users,
            "item_id": (items + users % 7) % 90,
            "weight": rng.integers(1, 5, n).astype(float),
            "datetime": pd.to_datetime("2024-01-01") + pd.to_timedelta(rng.integers(0, 120, n), unit="h"),
        }
    )


def model_item_features(interactions: pd.DataFrame) -> pd.DataFrame:
    item_ids = np.sort(interactions["item_id"].unique())
    rng = np.random.default_rng(3)
    return pd.DataFrame(
        {"id": item_ids, "feature": "genre", "value": rng.choice(["a", "b", "c", "d"], size=len(item_ids))}
    )


def rank_factors():
    rng = np.random.default_rng(17)
    subjects = rng.normal(size=(40, 16)).astype(np.float32)
    objects = rng.normal(size=(70, 16)).astype(np.float32)
    seen = sparse.random(40, 70, density=0.1, random_state=3, format="csr")
    seen.data[:] = 1.0
    return subjects, objects, seen.astype(np.float32)


def selection_interactions() -> pd.DataFrame:
    rng = np.random.default_rng(21)
    n = 5000
    return pd.DataFrame(
        {
            "user_id": rng.integers(0, 150, n),
            "item_id": (rng.zipf(1.5, n) - 1) % 70,
            "weight": 1.0,
            "datetime": pd.to_datetime("2024-03-01") + pd.to_timedelta(rng.integers(0, 14 * 24, n), unit="h"),
        }
    )


def preparator_interactions() -> pd.DataFrame:
    rng = np.random.default_rng(4)
    n = 3000
    return pd.DataFrame(
        {
            "user_id": rng.integers(0, 80, n),
            "item_id": (rng.zipf(1.4, n) - 1) % 60,
            "weight": 1.0,
            "datetime": pd.to_datetime("2024-05-01") + pd.to_timedelta(rng.integers(0, 10_000, n), unit="m"),
        }
    ).drop_duplicates(subset=["user_id", "datetime"])


PREP_SESSION_LEN = 8

# --------------------------------------------------------------- env adapters


class TpuEnv:
    """rectools_tpu behind the adapter interface the cases consume."""

    name = "tpu"

    def __init__(self) -> None:
        import rectools_tpu.metrics as metrics
        import rectools_tpu.model_selection as model_selection
        import rectools_tpu.models as models
        from rectools_tpu.dataset import Dataset

        self.metrics = metrics
        self.models = models
        self.model_selection = model_selection
        self.Dataset = Dataset

    def rank(self, distance_name, subjects, objects, subject_ids, k, filter_csr=None, whitelist=None):
        from rectools_tpu.models.rank import Distance, TPURanker

        ranker = TPURanker(distance=getattr(Distance, distance_name), subjects_factors=subjects, objects_factors=objects)
        return ranker.rank(
            subject_ids=np.asarray(subject_ids), k=k, filter_pairs_csr=filter_csr, sorted_object_whitelist=whitelist
        )

    def sasrec_preparator(self, **kwargs):
        from rectools_tpu.models.nn.transformers.sasrec import SASRecDataPreparator

        return SASRecDataPreparator(
            session_max_len=PREP_SESSION_LEN, batch_size=16, dataloader_num_workers=0, shuffle_train=False, **kwargs
        )

    def train_batches(self, prep):
        rng = np.random.default_rng(0)
        return [{k: np.asarray(v) for k, v in dict(b).items()} for b in prep.get_dataloader_train(rng)]

    def recommend_x(self, prep, dataset, users):
        rec_ds = prep.transform_dataset_u2i(dataset, users, None)
        return np.concatenate([np.asarray(b["x"]) for b in prep.get_dataloader_recommend(rec_ds, 16)], axis=0)


class RefEnv:
    """The reference RecTools (requires tests/parity's import machinery)."""

    name = "ref"

    def __init__(self) -> None:
        from tests.parity.conftest import _import_reference

        _import_reference()
        import rectools.metrics as metrics
        import rectools.model_selection as model_selection
        import rectools.models as models
        from rectools.dataset import Dataset

        self.metrics = metrics
        self.models = models
        self.model_selection = model_selection
        self.Dataset = Dataset

    def rank(self, distance_name, subjects, objects, subject_ids, k, filter_csr=None, whitelist=None):
        from rectools.models.rank import Distance, ImplicitRanker

        ranker = ImplicitRanker(
            distance=getattr(Distance, distance_name), subjects_factors=subjects, objects_factors=objects
        )
        return ranker.rank(
            subject_ids=list(subject_ids), k=k, filter_pairs_csr=filter_csr, sorted_object_whitelist=whitelist
        )

    def sasrec_preparator(self, **kwargs):
        from rectools.models.nn.transformers.sasrec import SASRecDataPreparator

        return SASRecDataPreparator(
            session_max_len=PREP_SESSION_LEN, batch_size=16, dataloader_num_workers=0, shuffle_train=False, **kwargs
        )

    def train_batches(self, prep):
        out = []
        for batch in prep.get_dataloader_train():
            if isinstance(batch, dict):
                out.append({k: np.asarray(v) for k, v in batch.items()})
            else:
                out.append({k: np.asarray(v) for k, v in zip(("x", "y", "yw"), batch)})
        return out

    def recommend_x(self, prep, dataset, users):
        rec_ds = prep.transform_dataset_u2i(dataset, users)
        xs = []
        for batch in prep.get_dataloader_recommend(rec_ds, 16):
            xs.append(np.asarray(batch["x"] if isinstance(batch, dict) else batch[0]))
        return np.concatenate(xs, axis=0)


# ------------------------------------------------------------- serialization


def _jsonable(value):
    if isinstance(value, dict):
        return {k: _jsonable(v) for k, v in value.items()}
    if isinstance(value, (list, tuple)):
        return [_jsonable(v) for v in value]
    if isinstance(value, np.ndarray):
        return _jsonable(value.tolist())
    if isinstance(value, (np.integer,)):
        return int(value)
    if isinstance(value, (np.floating,)):
        return float(value)
    if isinstance(value, (np.bool_,)):
        return bool(value)
    return value


def _reco_payload(reco: pd.DataFrame, id_col="user_id", with_rank=True):
    cols = [id_col, "item_id", "score"] + (["rank"] if with_rank else [])
    canon = reco.sort_values([id_col, "item_id"]).reset_index(drop=True)
    return {c: _jsonable(canon[c].to_numpy()) for c in cols}


def _triplet_payload(triplet):
    subj, items, scores = (np.asarray(a) for a in triplet)
    order = np.lexsort((items, subj))
    return {
        "subjects": _jsonable(subj[order]),
        "items": _jsonable(items[order]),
        "scores": _jsonable(scores[order].astype(np.float64)),
    }


# --------------------------------------------------------------------- cases

METRIC_CASES = [
    ("Precision", {"k": 10}),
    ("Recall", {"k": 10}),
    ("F1Beta", {"k": 10}),
    ("HitRate", {"k": 10}),
    ("MAP", {"k": 10}),
    ("MAP", {"k": 10, "divide_by_k": True}),
    ("NDCG", {"k": 10}),
    ("NDCG", {"k": 10, "divide_by_achievable": True}),
    ("MRR", {"k": 10}),
]


def _metric_case(name, kwargs):
    def compute(env):
        reco, interactions, _, _ = metrics_tables()
        metric = getattr(env.metrics, name)(**kwargs)
        per_user = metric.calc_per_user(reco, interactions).sort_index()
        return {
            "mean": float(metric.calc(reco, interactions)),
            "pu_index": _jsonable(per_user.index.to_numpy()),
            "pu_values": _jsonable(per_user.to_numpy().astype(np.float64)),
        }

    return compute


def _catalog_metric_case(name):
    def compute(env):
        reco, interactions, _, catalog = metrics_tables()
        return {"mean": float(getattr(env.metrics, name)(k=10).calc(reco, interactions, catalog))}

    return compute


def _beyond_accuracy_case(kind):
    def compute(env):
        reco, interactions, prev, catalog = metrics_tables()
        m = env.metrics
        if kind == "miuf":
            return {"mean": float(m.MeanInvUserFreq(k=10).calc(reco, prev))}
        if kind == "arp":
            return {
                "mean": float(m.AvgRecPopularity(k=10).calc(reco, prev)),
                "mean_normalized": float(m.AvgRecPopularity(k=10, normalize=True).calc(reco, prev)),
            }
        if kind == "serendipity":
            return {"mean": float(m.Serendipity(k=10).calc(reco, interactions, prev, catalog))}
        if kind == "coverage":
            return {"mean": float(m.CatalogCoverage(k=10).calc(reco, catalog))}
        if kind == "intersection":
            rng = np.random.default_rng(5)
            other = reco.copy()
            other["item_id"] = rng.permutation(other["item_id"].to_numpy())
            return {"mean": float(m.Intersection(k=10).calc(reco, other))}
        raise ValueError(kind)

    return compute


def _dq_case(name):
    def compute(env):
        reco, interactions, _, _ = metrics_tables()
        metric = getattr(env.metrics, name)(k=10)
        value = metric.calc(reco) if name != "CoveredUsers" else metric.calc(reco, interactions)
        return {"mean": float(value)}

    return compute


def _calc_metrics_bundle(env):
    reco, interactions, prev, catalog = metrics_tables()
    m = env.metrics
    bundle = {
        "prec@10": m.Precision(k=10),
        "recall@5": m.Recall(k=5),
        "ndcg@10": m.NDCG(k=10),
        "map@10": m.MAP(k=10),
        "novelty@10": m.MeanInvUserFreq(k=10),
        "serendipity@10": m.Serendipity(k=10),
        "coverage@10": m.CatalogCoverage(k=10),
    }
    values = m.calc_metrics(bundle, reco, interactions, prev_interactions=prev, catalog=catalog)
    return {k: float(v) for k, v in sorted(values.items())}


def _debias_case(env):
    reco, interactions, _, _ = metrics_tables()
    m = env.metrics
    metric = m.Precision(k=10, debias_config=m.DebiasConfig(iqr_coef=1.5, random_state=32))
    return {"mean": float(metric.calc(reco, interactions))}


def _ease_u2i(env):
    interactions = model_interactions()
    ds = env.Dataset.construct(interactions)
    users = interactions["user_id"].unique()[:60]
    reco = env.models.EASEModel(regularization=50.0).fit(ds).recommend(users, ds, k=10, filter_viewed=True)
    return _reco_payload(reco)


def _ease_whitelist(env):
    interactions = model_interactions()
    ds = env.Dataset.construct(interactions)
    users = interactions["user_id"].unique()[:40]
    whitelist = np.sort(interactions["item_id"].unique())[::2]
    reco = env.models.EASEModel(regularization=50.0).fit(ds).recommend(
        users, ds, k=8, filter_viewed=False, items_to_recommend=whitelist
    )
    return _reco_payload(reco)


def _ease_i2i(env):
    interactions = model_interactions()
    ds = env.Dataset.construct(interactions)
    targets = interactions["item_id"].unique()[:30]
    reco = env.models.EASEModel(regularization=50.0).fit(ds).recommend_to_items(targets, ds, k=5)
    return _reco_payload(reco, id_col="target_item_id", with_rank=False)


def _svd_u2i(env):
    interactions = model_interactions()
    ds = env.Dataset.construct(interactions)
    users = interactions["user_id"].unique()[:60]
    reco = env.models.PureSVDModel(factors=24).fit(ds).recommend(users, ds, k=10, filter_viewed=True)
    return _reco_payload(reco, with_rank=False)


def _popular_case(popularity):
    def compute(env):
        interactions = model_interactions()
        ds = env.Dataset.construct(interactions)
        users = interactions["user_id"].unique()[:50]
        reco = env.models.PopularModel(popularity=popularity).fit(ds).recommend(users, ds, k=10, filter_viewed=True)
        return _reco_payload(reco, with_rank=False)

    return compute


def _popular_cold(env):
    interactions = model_interactions()
    ds = env.Dataset.construct(interactions)
    model = env.models.PopularModel(period=timedelta(days=2)).fit(ds)
    reco = model.recommend([999_999], ds, k=10, filter_viewed=False, on_unsupported_targets="ignore")
    return {"items": _jsonable(np.sort(reco["item_id"].to_numpy()))}


def _pic_case(mixing, ratio):
    def compute(env):
        interactions = model_interactions()
        features = model_item_features(interactions)
        ds = env.Dataset.construct(interactions, item_features_df=features, cat_item_features=["genre"])
        users = interactions["user_id"].unique()[:40]
        reco = (
            env.models.PopularInCategoryModel(category_feature="genre", mixing_strategy=mixing, ratio_strategy=ratio)
            .fit(ds)
            .recommend(users, ds, k=9, filter_viewed=True)
        )
        sets = reco.groupby("user_id")["item_id"].agg(lambda s: sorted(s))
        return {"per_user_items": {str(u): _jsonable(v) for u, v in sets.items()}}

    return compute


def _rank_case(kind, distance):
    def compute(env):
        subjects, objects, seen = rank_factors()
        if kind == "plain":
            return _triplet_payload(env.rank(distance, subjects, objects, list(range(25)), k=8))
        if kind == "seen":
            return _triplet_payload(env.rank(distance, subjects, objects, list(range(40)), k=8, filter_csr=seen))
        if kind == "whitelist":
            ids = list(range(0, 40, 2))
            whitelist = np.arange(0, 70, 3)
            return _triplet_payload(
                env.rank(distance, subjects, objects, ids, k=6, filter_csr=seen[ids], whitelist=whitelist)
            )
        if kind == "sparse_subjects":
            rng = np.random.default_rng(5)
            history = sparse.random(30, 70, density=0.15, random_state=8, format="csr").astype(np.float32)
            item_item = rng.normal(size=(70, 70)).astype(np.float32)
            return _triplet_payload(env.rank("DOT", history, item_item, list(range(30)), k=10))
        if kind == "k_large":
            return _triplet_payload(env.rank("DOT", subjects, objects, [0, 1, 2], k=500))
        raise ValueError(kind)

    return compute


def _splitter_case(kind):
    def compute(env):
        interactions = env.Dataset.construct(selection_interactions()).interactions
        ms = env.model_selection
        if kind == "time_range":
            splitter = ms.TimeRangeSplitter("2D", n_splits=3)
        elif kind == "time_range_unfiltered":
            splitter = ms.TimeRangeSplitter(
                "2D", n_splits=3, filter_cold_users=False, filter_cold_items=False, filter_already_seen=False
            )
        elif kind == "last_n":
            splitter = ms.LastNSplitter(n=2, n_splits=2)
        elif kind == "random":
            splitter = ms.RandomSplitter(test_fold_frac=0.2, n_splits=2, random_state=32)
        else:
            raise ValueError(kind)
        folds = [
            {"train": _jsonable(np.sort(tr)), "test": _jsonable(np.sort(te))}
            for tr, te, _ in splitter.split(interactions)
        ]
        return {"folds": folds}

    return compute


def _cross_validate_case(env):
    ds = env.Dataset.construct(selection_interactions())
    m, ms = env.metrics, env.model_selection
    out = ms.cross_validate(
        dataset=ds,
        splitter=ms.TimeRangeSplitter("2D", n_splits=2),
        models={"popular": env.models.PopularModel(), "ease": env.models.EASEModel(regularization=50.0)},
        metrics={"recall@10": m.Recall(k=10), "ndcg@10": m.NDCG(k=10), "map@10": m.MAP(k=10)},
        k=10,
        filter_viewed=True,
    )
    rows = pd.DataFrame(out["metrics"]).sort_values(["model", "i_split"]).reset_index(drop=True)
    splits = pd.DataFrame(out["splits"])
    return {
        "models": list(rows["model"]),
        "metrics": {c: _jsonable(rows[c].to_numpy().astype(np.float64)) for c in ("recall@10", "ndcg@10", "map@10")},
        "splits": {c: _jsonable(splits[c].to_numpy()) for c in ("train", "test", "train_users", "test_users")},
    }


def _prep_id_map(env):
    prep = env.sasrec_preparator()
    prep.process_dataset_train(env.Dataset.construct(preparator_interactions()))
    externals = [str(x) for x in prep.train_dataset.item_id_map.external_ids]
    return {"item_externals": externals, "n_extra_tokens": len(prep.item_extra_tokens)}


def _prep_kept_interactions(env):
    prep = env.sasrec_preparator()
    prep.process_dataset_train(env.Dataset.construct(preparator_interactions()))
    df = prep.train_dataset.interactions.df.sort_values(["user_id", "item_id", "datetime"]).reset_index(drop=True)
    return {"user_id": _jsonable(df["user_id"].to_numpy()), "item_id": _jsonable(df["item_id"].to_numpy())}


def _prep_train_batches(env):
    prep = env.sasrec_preparator()
    prep.process_dataset_train(env.Dataset.construct(preparator_interactions()))
    batches = env.train_batches(prep)
    return {
        "n_batches": len(batches),
        "x": _jsonable(np.concatenate([b["x"] for b in batches], axis=0)),
        "y": _jsonable(np.concatenate([b["y"] for b in batches], axis=0)),
        "yw": _jsonable(np.concatenate([b["yw"] for b in batches], axis=0).astype(np.float64)),
    }


def _prep_recommend_x(env):
    interactions = preparator_interactions()
    prep = env.sasrec_preparator()
    ds = env.Dataset.construct(interactions)
    prep.process_dataset_train(ds)
    return {"x": _jsonable(env.recommend_x(prep, ds, interactions["user_id"].unique()))}


def build_cases() -> tp.Dict[str, tp.Callable]:
    cases: tp.Dict[str, tp.Callable] = {}
    for name, kwargs in METRIC_CASES:
        key = f"metric/{name}" + ("" if len(kwargs) == 1 else "/" + next(k for k in kwargs if k != "k"))
        cases[key] = _metric_case(name, kwargs)
    for name in ("Accuracy", "MCC"):
        cases[f"metric/{name}"] = _catalog_metric_case(name)
    for kind in ("miuf", "arp", "serendipity", "coverage", "intersection"):
        cases[f"metric/{kind}"] = _beyond_accuracy_case(kind)
    for name in ("SufficientReco", "UnrepeatedReco", "CoveredUsers"):
        cases[f"metric/{name}"] = _dq_case(name)
    cases["metric/calc_metrics_bundle"] = _calc_metrics_bundle
    cases["metric/debias_precision"] = _debias_case

    cases["model/ease_u2i"] = _ease_u2i
    cases["model/ease_whitelist"] = _ease_whitelist
    cases["model/ease_i2i"] = _ease_i2i
    cases["model/svd_u2i"] = _svd_u2i
    for popularity in ("n_users", "n_interactions", "mean_weight", "sum_weight"):
        cases[f"model/popular_{popularity}"] = _popular_case(popularity)
    cases["model/popular_cold_period"] = _popular_cold
    for mixing in ("rotate", "group"):
        for ratio in ("proportional", "equal"):
            cases[f"model/pic_{mixing}_{ratio}"] = _pic_case(mixing, ratio)

    for distance in ("DOT", "COSINE", "EUCLIDEAN"):
        cases[f"rank/plain_{distance}"] = _rank_case("plain", distance)
        cases[f"rank/seen_{distance}"] = _rank_case("seen", distance)
    for distance in ("DOT", "COSINE"):
        cases[f"rank/whitelist_{distance}"] = _rank_case("whitelist", distance)
    cases["rank/sparse_subjects"] = _rank_case("sparse_subjects", "DOT")
    cases["rank/k_larger_than_catalog"] = _rank_case("k_large", "DOT")

    for kind in ("time_range", "time_range_unfiltered", "last_n", "random"):
        cases[f"selection/{kind}"] = _splitter_case(kind)
    cases["selection/cross_validate"] = _cross_validate_case

    cases["preparator/item_id_map"] = _prep_id_map
    cases["preparator/kept_interactions"] = _prep_kept_interactions
    cases["preparator/train_batches"] = _prep_train_batches
    cases["preparator/recommend_x"] = _prep_recommend_x
    return cases
