"""Head-to-head model parity: the ACTUAL reference RecTools (running on a
numpy implicit-stub) and rectools_tpu fit and recommend on identical data;
recommendation tables must agree row-for-row.

This is the strongest quality gate available offline (BASELINE.md's ML-1M /
KION runs are unreachable in this image — zero egress, empty dataset dir):
the models below share no code with the reference, so identical outputs pin
the whole fit+rank+orchestration path."""

import numpy as np
import pandas as pd
import pytest

pd.set_option("mode.chained_assignment", None)


@pytest.fixture(scope="module")
def interactions() -> pd.DataFrame:
    rng = np.random.default_rng(7)
    n = 6000
    # popularity-skewed items, light user taste structure via user-dependent
    # item offsets, so rankings are non-degenerate
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


@pytest.fixture(scope="module")
def item_features(interactions) -> pd.DataFrame:
    item_ids = np.sort(interactions["item_id"].unique())
    rng = np.random.default_rng(3)
    return pd.DataFrame(
        {
            "id": item_ids,
            "feature": "genre",
            "value": rng.choice(["a", "b", "c", "d"], size=len(item_ids)),
        }
    )


def _datasets(interactions, item_features=None, cat=None):
    from rectools.dataset import Dataset as RefDataset

    from rectools_tpu.dataset import Dataset

    kwargs = {}
    if item_features is not None:
        kwargs = {"item_features_df": item_features, "cat_item_features": cat or ["genre"]}
    return RefDataset.construct(interactions, **kwargs), Dataset.construct(interactions, **kwargs)


def _assert_reco_equal(ref_reco: pd.DataFrame, tpu_reco: pd.DataFrame, score_atol=1e-4, check_order=True):
    assert len(ref_reco) == len(tpu_reco), (len(ref_reco), len(tpu_reco))
    merged = ref_reco.merge(
        tpu_reco, on=["user_id", "item_id"], suffixes=["_ref", "_tpu"], how="outer", indicator=True
    )
    unmatched = merged[merged["_merge"] != "both"]
    assert len(unmatched) == 0, f"{len(unmatched)} unmatched rows:\n{unmatched.head(10)}"
    np.testing.assert_allclose(merged["score_ref"], merged["score_tpu"], atol=score_atol, rtol=1e-4)
    if check_order:
        assert (merged["rank_ref"] == merged["rank_tpu"]).all()


def _assert_i2i_equal(ref_reco: pd.DataFrame, tpu_reco: pd.DataFrame, score_atol=1e-4):
    assert len(ref_reco) == len(tpu_reco)
    merged = ref_reco.merge(
        tpu_reco, on=["target_item_id", "item_id"], suffixes=["_ref", "_tpu"], how="outer", indicator=True
    )
    assert (merged["_merge"] == "both").all()
    np.testing.assert_allclose(merged["score_ref"], merged["score_tpu"], atol=score_atol, rtol=1e-4)


class TestEASEParity:
    def test_u2i(self, interactions) -> None:
        from rectools.models import EASEModel as RefEASE

        from rectools_tpu.models import EASEModel

        ref_ds, tpu_ds = _datasets(interactions)
        users = interactions["user_id"].unique()[:60]
        ref = RefEASE(regularization=50.0).fit(ref_ds).recommend(users, ref_ds, k=10, filter_viewed=True)
        tpu = EASEModel(regularization=50.0).fit(tpu_ds).recommend(users, tpu_ds, k=10, filter_viewed=True)
        _assert_reco_equal(ref, tpu)

    def test_u2i_whitelist_no_filter(self, interactions) -> None:
        from rectools.models import EASEModel as RefEASE

        from rectools_tpu.models import EASEModel

        ref_ds, tpu_ds = _datasets(interactions)
        users = interactions["user_id"].unique()[:40]
        whitelist = np.sort(interactions["item_id"].unique())[::2]
        ref = RefEASE(regularization=50.0).fit(ref_ds).recommend(
            users, ref_ds, k=8, filter_viewed=False, items_to_recommend=whitelist
        )
        tpu = EASEModel(regularization=50.0).fit(tpu_ds).recommend(
            users, tpu_ds, k=8, filter_viewed=False, items_to_recommend=whitelist
        )
        _assert_reco_equal(ref, tpu)

    def test_i2i(self, interactions) -> None:
        from rectools.models import EASEModel as RefEASE

        from rectools_tpu.models import EASEModel

        ref_ds, tpu_ds = _datasets(interactions)
        targets = interactions["item_id"].unique()[:30]
        ref = RefEASE(regularization=50.0).fit(ref_ds).recommend_to_items(targets, ref_ds, k=5)
        tpu = EASEModel(regularization=50.0).fit(tpu_ds).recommend_to_items(targets, tpu_ds, k=5)
        _assert_i2i_equal(ref, tpu)


class TestPureSVDParity:
    def test_u2i(self, interactions) -> None:
        from rectools.models import PureSVDModel as RefSVD

        from rectools_tpu.models import PureSVDModel

        ref_ds, tpu_ds = _datasets(interactions)
        users = interactions["user_id"].unique()[:60]
        ref = RefSVD(factors=24).fit(ref_ds).recommend(users, ref_ds, k=10, filter_viewed=True)
        tpu = PureSVDModel(factors=24).fit(tpu_ds).recommend(users, tpu_ds, k=10, filter_viewed=True)
        # SVD factors are sign/rotation ambiguous but scores are not; top-k
        # composition can swap near-ties -> compare as sets with score match
        _assert_reco_equal(ref, tpu, score_atol=1e-3, check_order=False)

    def test_i2i_cosine(self, interactions) -> None:
        from rectools.models import PureSVDModel as RefSVD

        from rectools_tpu.models import PureSVDModel

        ref_ds, tpu_ds = _datasets(interactions)
        targets = interactions["item_id"].unique()[:30]
        ref = RefSVD(factors=24).fit(ref_ds).recommend_to_items(targets, ref_ds, k=5)
        tpu = PureSVDModel(factors=24).fit(tpu_ds).recommend_to_items(targets, tpu_ds, k=5)
        merged = ref.merge(tpu, on=["target_item_id", "item_id"], suffixes=["_ref", "_tpu"], how="inner")
        # near-ties may differ at the tail; demand ≥95% overlap with matching scores
        assert len(merged) >= 0.95 * len(ref)
        np.testing.assert_allclose(merged["score_ref"], merged["score_tpu"], atol=1e-3, rtol=1e-3)


class TestPopularParity:
    @pytest.mark.parametrize("popularity", ["n_users", "n_interactions", "mean_weight", "sum_weight"])
    def test_u2i_all_popularity_modes(self, interactions, popularity) -> None:
        from rectools.models import PopularModel as RefPopular

        from rectools_tpu.models import PopularModel

        ref_ds, tpu_ds = _datasets(interactions)
        users = interactions["user_id"].unique()[:50]
        ref = RefPopular(popularity=popularity).fit(ref_ds).recommend(users, ref_ds, k=10, filter_viewed=True)
        tpu = PopularModel(popularity=popularity).fit(tpu_ds).recommend(users, tpu_ds, k=10, filter_viewed=True)
        # ties in popularity counts make the ORDER implementation-defined;
        # the (user, item, score) multisets must still agree exactly
        _assert_reco_equal(ref, tpu, check_order=False)

    def test_period_window_and_cold(self, interactions) -> None:
        from datetime import timedelta

        from rectools.models import PopularModel as RefPopular

        from rectools_tpu.models import PopularModel

        ref_ds, tpu_ds = _datasets(interactions)
        ref = RefPopular(period=timedelta(days=2)).fit(ref_ds)
        tpu = PopularModel(period=timedelta(days=2)).fit(tpu_ds)
        ref_reco = ref.recommend([999_999], ref_ds, k=10, filter_viewed=False, on_unsupported_targets="ignore")
        tpu_reco = tpu.recommend([999_999], tpu_ds, k=10, filter_viewed=False, on_unsupported_targets="ignore")
        assert set(ref_reco["item_id"]) == set(tpu_reco["item_id"])


class TestPopularInCategoryParity:
    @pytest.mark.parametrize("mixing", ["rotate", "group"])
    @pytest.mark.parametrize("ratio", ["proportional", "equal"])
    def test_u2i(self, interactions, item_features, mixing, ratio) -> None:
        from rectools.models import PopularInCategoryModel as RefPIC

        from rectools_tpu.models import PopularInCategoryModel

        ref_ds, tpu_ds = _datasets(interactions, item_features)
        users = interactions["user_id"].unique()[:40]
        ref = (
            RefPIC(category_feature="genre", mixing_strategy=mixing, ratio_strategy=ratio)
            .fit(ref_ds)
            .recommend(users, ref_ds, k=9, filter_viewed=True)
        )
        tpu = (
            PopularInCategoryModel(category_feature="genre", mixing_strategy=mixing, ratio_strategy=ratio)
            .fit(tpu_ds)
            .recommend(users, tpu_ds, k=9, filter_viewed=True)
        )
        # popularity ties within a category make per-category list order
        # implementation-defined; compare the (user, item) sets and sizes
        ref_sets = ref.groupby("user_id")["item_id"].agg(set)
        tpu_sets = tpu.groupby("user_id")["item_id"].agg(set)
        assert set(ref_sets.index) == set(tpu_sets.index)
        sizes_match = sum(len(ref_sets[u]) == len(tpu_sets[u]) for u in ref_sets.index)
        assert sizes_match == len(ref_sets)
        overlap = np.mean([len(ref_sets[u] & tpu_sets[u]) / len(ref_sets[u]) for u in ref_sets.index])
        assert overlap > 0.85, overlap

    def test_cold(self, interactions, item_features) -> None:
        from rectools.models import PopularInCategoryModel as RefPIC

        from rectools_tpu.models import PopularInCategoryModel

        ref_ds, tpu_ds = _datasets(interactions, item_features)
        ref = RefPIC(category_feature="genre").fit(ref_ds).recommend(
            [999_999], ref_ds, k=9, filter_viewed=False, on_unsupported_targets="ignore"
        )
        tpu = PopularInCategoryModel(category_feature="genre").fit(tpu_ds).recommend(
            [999_999], tpu_ds, k=9, filter_viewed=False, on_unsupported_targets="ignore"
        )
        assert len(ref) == len(tpu)
        assert set(ref["item_id"]) == set(tpu["item_id"])
