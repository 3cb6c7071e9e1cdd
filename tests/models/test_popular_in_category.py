"""PopularInCategoryModel tests (pattern of reference
tests/models/test_popular_in_category.py)."""

import numpy as np
import pandas as pd
import pytest

from rectools_tpu import Columns
from rectools_tpu.dataset import Dataset
from rectools_tpu.models import PopularInCategoryModel

from .data import INTERACTIONS
from .utils import (
    assert_default_config_and_default_model_params_are_the_same,
    assert_dumps_loads_do_not_change_model,
    assert_second_fit_refits_model,
)

ITEM_FEATURES = pd.DataFrame(
    {
        "id": [11, 12, 13, 14, 15, 17],
        "feature": ["genre"] * 6,
        "value": ["a", "a", "b", "b", "c", "c"],
    }
)


def _dataset() -> Dataset:
    return Dataset.construct(INTERACTIONS, item_features_df=ITEM_FEATURES, cat_item_features=["genre"])


class TestPopularInCategoryModel:
    def test_basic_u2i(self) -> None:
        dataset = _dataset()
        model = PopularInCategoryModel(category_feature="genre").fit(dataset)
        reco = model.recommend([10, 20], dataset, k=4, filter_viewed=False)
        assert set(reco.columns) == set(Columns.Recommendations)
        for _, grp in reco.groupby(Columns.User):
            assert grp[Columns.Item].is_unique
            assert list(grp[Columns.Rank]) == list(range(1, len(grp) + 1))

    def test_rotate_interleaves_categories(self) -> None:
        dataset = _dataset()
        model = PopularInCategoryModel(
            category_feature="genre", mixing_strategy="rotate", ratio_strategy="equal"
        ).fit(dataset)
        reco = model.recommend([10], dataset, k=3, filter_viewed=False)
        # with equal quotas and rotate mixing, top-3 should span 3 categories
        cat_of_item = {11: "a", 12: "a", 13: "b", 14: "b", 15: "c", 17: "c"}
        cats = [cat_of_item[i] for i in reco[Columns.Item]]
        assert len(set(cats)) == 3

    def test_cold_users(self) -> None:
        dataset = _dataset()
        model = PopularInCategoryModel(category_feature="genre").fit(dataset)
        reco = model.recommend([99, 98], dataset, k=3, filter_viewed=False, on_unsupported_targets="ignore")
        assert set(reco[Columns.User]) == {99, 98}
        # same fixed list for all cold users
        lists = reco.groupby(Columns.User)[Columns.Item].agg(list)
        assert lists[99] == lists[98]

    def test_i2i(self) -> None:
        dataset = _dataset()
        model = PopularInCategoryModel(category_feature="genre").fit(dataset)
        reco = model.recommend_to_items([11, 12], dataset, k=3)
        assert not (reco[Columns.TargetItem] == reco[Columns.Item]).any()

    def test_n_categories_warns_when_exceeding(self) -> None:
        dataset = _dataset()
        model = PopularInCategoryModel(category_feature="genre", n_categories=10)
        with pytest.warns(UserWarning):
            model.fit(dataset)
        assert model.n_effective_categories == 3

    def test_missing_feature_raises(self) -> None:
        dataset = Dataset.construct(INTERACTIONS)
        model = PopularInCategoryModel(category_feature="genre")
        with pytest.raises(ValueError):
            model.fit(dataset)

    def test_second_fit_refits(self) -> None:
        model = PopularInCategoryModel(category_feature="genre")
        assert_second_fit_refits_model(model, _dataset())

    def test_dumps_loads(self) -> None:
        dataset = _dataset()
        model = PopularInCategoryModel(category_feature="genre").fit(dataset)
        assert_dumps_loads_do_not_change_model(model, dataset)

    def test_default_config(self) -> None:
        model = PopularInCategoryModel(category_feature="genre")
        assert_default_config_and_default_model_params_are_the_same(
            model, {"category_feature": "genre"}
        )

    def test_invalid_params(self) -> None:
        with pytest.raises(ValueError):
            PopularInCategoryModel(category_feature="genre", mixing_strategy="bad")
        with pytest.raises(ValueError):
            PopularInCategoryModel(category_feature="genre", ratio_strategy="bad")
        with pytest.raises(ValueError):
            PopularInCategoryModel(category_feature="genre", n_categories=0)
