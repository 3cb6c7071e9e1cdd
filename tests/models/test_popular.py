from datetime import datetime, timedelta

import numpy as np
import pandas as pd
import pytest

from rectools_tpu import Columns
from rectools_tpu.models import PopularModel

from .data import DATASET
from .utils import (
    assert_default_config_and_default_model_params_are_the_same,
    assert_dumps_loads_do_not_change_model,
    assert_get_config_and_from_config_compatibility,
    assert_second_fit_refits_model,
)


class TestPopularModel:
    def test_popularity_list_n_users(self):
        model = PopularModel().fit(DATASET)
        items, scores = model.popularity_list
        # item 11 (internal 0) seen by 4 users, 12 by 3, 14 by 2, 15 by 2, 13 by 1, 17 by 1
        ext = DATASET.item_id_map.convert_to_external(items)
        assert ext[0] == 11
        assert ext[1] == 12
        np.testing.assert_array_equal(scores[:2], [4, 3])

    def test_basic_recommend(self):
        model = PopularModel().fit(DATASET)
        reco = model.recommend([10, 20], DATASET, k=2, filter_viewed=False)
        assert list(reco[Columns.Item]) == [11, 12, 11, 12]
        assert list(reco[Columns.Rank]) == [1, 2, 1, 2]
        np.testing.assert_array_equal(reco[Columns.Score].to_numpy(), [4, 3, 4, 3])

    def test_filter_viewed(self):
        model = PopularModel().fit(DATASET)
        reco = model.recommend([10], DATASET, k=2, filter_viewed=True)
        # user 10 has seen 11, 12, 14 -> next most popular are 15, 13 or 17
        items = list(reco[Columns.Item])
        assert 11 not in items and 12 not in items and 14 not in items
        assert len(items) == 2

    def test_items_to_recommend(self):
        model = PopularModel().fit(DATASET)
        reco = model.recommend([10], DATASET, k=3, filter_viewed=False, items_to_recommend=[12, 13])
        assert set(reco[Columns.Item]) == {12, 13}

    def test_cold_users(self):
        model = PopularModel().fit(DATASET)
        reco = model.recommend([10, 999], DATASET, k=2, filter_viewed=False, on_unsupported_targets="ignore")
        assert set(reco[Columns.User]) == {10, 999}
        cold = reco[reco[Columns.User] == 999]
        assert list(cold[Columns.Item]) == [11, 12]

    def test_popularity_options(self):
        model = PopularModel(popularity="n_interactions").fit(DATASET)
        items, scores = model.popularity_list
        assert scores[0] == 4

    def test_mean_weight(self):
        df = DATASET.interactions.df.copy()
        model = PopularModel(popularity="mean_weight").fit(DATASET)
        assert model.popularity_list[1].max() == 1.0

    @pytest.mark.parametrize("popularity", ["mean_weight", "sum_weight"])
    def test_nan_weights_are_skipped_like_pandas(self, popularity):
        from rectools_tpu.dataset import Dataset

        from .data import INTERACTIONS

        df = INTERACTIONS.copy()
        df[Columns.Weight] = df[Columns.Weight].astype(float)
        # poison one of item 11's four interactions with a NaN weight
        poison_row = df.index[df[Columns.Item] == 11][0]
        df.loc[poison_row, Columns.Weight] = np.nan
        dataset = Dataset.construct(df)
        model = PopularModel(popularity=popularity).fit(dataset)
        items, scores = model.popularity_list
        ext = dataset.item_id_map.convert_to_external(items)
        score_11 = scores[list(ext).index(11)]
        assert np.isfinite(score_11)
        # pandas-groupby semantics: NaN rows drop out of both sum and mean
        assert score_11 == (3.0 if popularity == "sum_weight" else 1.0)

    def test_period(self):
        model = PopularModel(period=timedelta(days=2)).fit(DATASET)
        items = DATASET.item_id_map.convert_to_external(model.popularity_list[0])
        # only interactions from 2021-11-28 on: items 11(x2), 12(x2), 14(x1)
        assert set(items) == {11, 12, 14}

    def test_begin_from(self):
        model = PopularModel(begin_from=datetime(2021, 11, 29)).fit(DATASET)
        items = DATASET.item_id_map.convert_to_external(model.popularity_list[0])
        assert set(items) == {11, 12, 14}

    def test_period_and_begin_raise(self):
        with pytest.raises(ValueError):
            PopularModel(period=timedelta(days=1), begin_from=datetime(2021, 11, 28))

    def test_invalid_popularity(self):
        with pytest.raises(ValueError):
            PopularModel(popularity="strange")

    def test_inverse(self):
        model = PopularModel(inverse=True).fit(DATASET)
        reco = model.recommend([10], DATASET, k=1, filter_viewed=False)
        ext = reco[Columns.Item].iloc[0]
        assert ext in (13, 17)  # least popular

    def test_i2i(self):
        model = PopularModel().fit(DATASET)
        reco = model.recommend_to_items([11, 13], DATASET, k=2)
        assert set(reco[Columns.TargetItem]) == {11, 13}
        # 11 filters itself
        assert 11 not in set(reco[reco[Columns.TargetItem] == 11][Columns.Item])

    def test_second_fit(self):
        assert_second_fit_refits_model(PopularModel(), DATASET)

    def test_dumps_loads(self):
        model = PopularModel().fit(DATASET)
        assert_dumps_loads_do_not_change_model(model, DATASET)

    def test_default_config(self):
        assert_default_config_and_default_model_params_are_the_same(PopularModel(), {})

    def test_config_roundtrip(self):
        assert_get_config_and_from_config_compatibility(
            PopularModel, DATASET, {"popularity": "n_interactions", "add_cold": True}
        )


class TestRandomModel:
    def test_basic(self):
        from rectools_tpu.models import RandomModel

        model = RandomModel(random_state=42).fit(DATASET)
        reco = model.recommend([10, 20], DATASET, k=3, filter_viewed=False)
        assert set(reco[Columns.User]) == {10, 20}
        assert (reco.groupby(Columns.User).size() == 3).all()
        assert list(reco[Columns.Rank]) == [1, 2, 3, 1, 2, 3]

    def test_filter_viewed(self):
        from rectools_tpu.models import RandomModel

        model = RandomModel(random_state=42).fit(DATASET)
        reco = model.recommend([10], DATASET, k=10, filter_viewed=True)
        items = set(reco[Columns.Item])
        assert not items & {11, 12, 14}
        assert len(items) == 3  # 6 items - 3 viewed

    def test_determinism(self):
        from rectools_tpu.models import RandomModel

        r1 = RandomModel(random_state=7).fit(DATASET).recommend([10], DATASET, 3, False)
        r2 = RandomModel(random_state=7).fit(DATASET).recommend([10], DATASET, 3, False)
        pd.testing.assert_frame_equal(r1, r2)

    def test_cold(self):
        from rectools_tpu.models import RandomModel

        model = RandomModel(random_state=42).fit(DATASET)
        reco = model.recommend([999], DATASET, k=2, filter_viewed=False, on_unsupported_targets="ignore")
        assert len(reco) == 2

    def test_config(self):
        from rectools_tpu.models import RandomModel

        assert_default_config_and_default_model_params_are_the_same(RandomModel(), {})
