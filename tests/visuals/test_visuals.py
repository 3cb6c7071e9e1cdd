"""Visual apps tests (pattern of reference tests/visuals/*): storage
round-trips and validation; widget rendering paths excluded."""

import numpy as np
import pandas as pd
import pytest

from rectools_tpu import Columns
from rectools_tpu.visuals import AppDataStorage, MetricsApp

RECO_U2I = pd.DataFrame(
    {
        Columns.User: [1, 1, 2, 2, 1, 2],
        Columns.Item: [11, 12, 11, 13, 12, 11],
        Columns.Score: [0.9, 0.8, 0.7, 0.6, 0.95, 0.85],
        Columns.Model: ["m1", "m1", "m1", "m1", "m2", "m2"],
    }
)
INTERACTIONS = pd.DataFrame({Columns.User: [1, 1, 2], Columns.Item: [13, 11, 12]})
ITEM_DATA = pd.DataFrame({Columns.Item: [11, 12, 13], "title": ["a", "b", "c"]})


class TestAppDataStorage:
    def test_from_raw_u2i(self) -> None:
        storage = AppDataStorage.from_raw(
            reco=RECO_U2I,
            item_data=ITEM_DATA,
            interactions=INTERACTIONS,
            selected_requests={"first": 1, "second": 2},
        )
        assert storage.is_u2i
        assert storage.request_names == ["first", "second"]
        assert set(storage.model_names) == {"m1", "m2"}
        assert "title" in storage.grouped_reco["m1"]["first"].columns
        assert set(storage.grouped_interactions["first"][Columns.Item]) == {13, 11}

    def test_save_load_round_trip(self, tmp_path) -> None:
        storage = AppDataStorage.from_raw(
            reco=RECO_U2I,
            item_data=ITEM_DATA,
            interactions=INTERACTIONS,
            selected_requests={"first": 1},
        )
        folder = str(tmp_path / "app_data")
        storage.save(folder)
        restored = AppDataStorage.load(folder)
        assert restored.is_u2i
        assert restored.selected_requests == {"first": 1}
        pd.testing.assert_frame_equal(
            storage.grouped_reco["m1"]["first"].reset_index(drop=True),
            restored.grouped_reco["m1"]["first"][storage.grouped_reco["m1"]["first"].columns].reset_index(drop=True),
            check_dtype=False,
        )

    def test_i2i(self) -> None:
        reco = RECO_U2I.rename(columns={Columns.User: Columns.TargetItem})
        storage = AppDataStorage.from_raw(
            reco=reco, item_data=ITEM_DATA, is_u2i=False, selected_requests={"t1": 1}
        )
        assert not storage.is_u2i
        assert storage.id_col == Columns.TargetItem

    def test_random_requests(self) -> None:
        storage = AppDataStorage.from_raw(
            reco=RECO_U2I, item_data=ITEM_DATA, interactions=INTERACTIONS, n_random_requests=2
        )
        assert len(storage.request_names) == 2
        assert all(name.startswith("random_") for name in storage.request_names)

    def test_errors(self) -> None:
        with pytest.raises(ValueError):
            AppDataStorage.from_raw(reco=RECO_U2I, item_data=ITEM_DATA, interactions=INTERACTIONS)
        with pytest.raises(ValueError):  # u2i without interactions
            AppDataStorage.from_raw(reco=RECO_U2I, item_data=ITEM_DATA, selected_requests={"a": 1})
        with pytest.raises(KeyError):  # no model column
            AppDataStorage.from_raw(
                reco=RECO_U2I.drop(columns=[Columns.Model]),
                item_data=ITEM_DATA,
                interactions=INTERACTIONS,
                selected_requests={"a": 1},
            )


class TestMetricsApp:
    METRICS = pd.DataFrame(
        {
            Columns.Model: ["m1", "m2", "m1", "m2"],
            Columns.Split: [0, 0, 1, 1],
            "prec@10": [0.1, 0.2, 0.3, 0.4],
            "recall@10": [0.5, 0.6, 0.7, 0.8],
        }
    )

    def test_construct_and_aggregations(self) -> None:
        app = MetricsApp.construct(self.METRICS, auto_display=False)
        assert app.model_names == ["m1", "m2"]
        assert app.fold_ids == [0, 1]
        avg = app._make_chart_data_avg()
        assert avg.loc[avg[Columns.Model] == "m1", "prec@10"].iloc[0] == pytest.approx(0.2)
        fold0 = app._make_chart_data_fold(0)
        assert len(fold0) == 2

    def test_chart_data_public_accessor(self) -> None:
        # headless access to what the scatter renders: averaged and per-fold
        app = MetricsApp.construct(self.METRICS, auto_display=False)
        pd.testing.assert_frame_equal(app.chart_data(), app._make_chart_data_avg())
        pd.testing.assert_frame_equal(app.chart_data(fold=1), app._make_chart_data_fold(1))
        assert app.chart_data(fold=1)["prec@10"].tolist() == [0.3, 0.4]

    def test_metadata_merge(self) -> None:
        meta = pd.DataFrame({Columns.Model: ["m1", "m2"], "factors": [64, 32]})
        app = MetricsApp.construct(self.METRICS, models_metadata=meta, auto_display=False)
        assert app.meta_names == ["factors"]
        assert "factors" in app.data.columns

    def test_validation_errors(self) -> None:
        with pytest.raises(KeyError):
            MetricsApp.construct(self.METRICS.drop(columns=[Columns.Model]), auto_display=False)
        with pytest.raises(ValueError):  # mismatched splits across models
            bad = self.METRICS.drop(index=[3])
            MetricsApp.construct(bad, auto_display=False)
        with pytest.raises(ValueError):  # non-numeric metric
            bad = self.METRICS.assign(text_metric="x")
            MetricsApp.construct(bad, auto_display=False)


class TestAppDataStorageMore:
    def test_reco_dict_input(self) -> None:
        tables = {
            "m1": RECO_U2I[RECO_U2I[Columns.Model] == "m1"].drop(columns=[Columns.Model]),
            "m2": RECO_U2I[RECO_U2I[Columns.Model] == "m2"].drop(columns=[Columns.Model]),
        }
        storage = AppDataStorage.from_raw(
            reco=tables, item_data=ITEM_DATA, interactions=INTERACTIONS, selected_requests={"a": 1}
        )
        assert set(storage.model_names) == {"m1", "m2"}

    def test_missing_reco_columns_raise(self) -> None:
        with pytest.raises(KeyError):
            AppDataStorage.from_raw(
                reco=RECO_U2I.drop(columns=[Columns.Item]),
                item_data=ITEM_DATA,
                interactions=INTERACTIONS,
                selected_requests={"a": 1},
            )
        with pytest.raises(KeyError):  # item_data must carry the item column
            AppDataStorage.from_raw(
                reco=RECO_U2I,
                item_data=ITEM_DATA.drop(columns=[Columns.Item]),
                interactions=INTERACTIONS,
                selected_requests={"a": 1},
            )

    def test_i2i_rejects_interactions(self) -> None:
        reco = RECO_U2I.rename(columns={Columns.User: Columns.TargetItem})
        with pytest.raises(ValueError):
            AppDataStorage.from_raw(
                reco=reco, item_data=ITEM_DATA, is_u2i=False,
                interactions=INTERACTIONS, selected_requests={"a": 1},
            )

    def test_random_requests_skip_explicit_selection(self) -> None:
        storage = AppDataStorage.from_raw(
            reco=RECO_U2I, item_data=ITEM_DATA, interactions=INTERACTIONS,
            selected_requests={"picked": 1}, n_random_requests=1,
        )
        assert storage.request_names[0] == "picked"
        (random_name,) = [n for n in storage.request_names if n != "picked"]
        assert storage.selected_requests[random_name] != 1  # only user 2 remains

    def test_save_refuses_overwrite_by_default(self, tmp_path) -> None:
        storage = AppDataStorage.from_raw(
            reco=RECO_U2I, item_data=ITEM_DATA, interactions=INTERACTIONS, selected_requests={"a": 1}
        )
        folder = str(tmp_path / "store")
        storage.save(folder)
        with pytest.raises(FileExistsError):
            storage.save(folder)
        storage.save(folder, overwrite=True)  # explicit overwrite allowed

    def test_i2i_save_load_round_trip(self, tmp_path) -> None:
        reco = RECO_U2I.rename(columns={Columns.User: Columns.TargetItem})
        storage = AppDataStorage.from_raw(
            reco=reco, item_data=ITEM_DATA, is_u2i=False, selected_requests={"t": 1}
        )
        folder = str(tmp_path / "i2i_store")
        storage.save(folder)
        restored = AppDataStorage.load(folder)
        assert not restored.is_u2i
        assert restored.id_col == Columns.TargetItem
        assert restored.selected_requests == {"t": 1}
