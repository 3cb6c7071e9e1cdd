"""Jupyter visual apps for recommendation inspection.

Behavioral parity with reference rectools/visuals/visual_app.py:36-825:
`AppDataStorage` groups interactions/reco per request and per model with
save/load round-trips; `VisualApp` / `ItemToItemVisualApp` render ipywidgets
toggles over the prepared tables.
"""

import typing as tp
from pathlib import Path

import attr
import numpy as np
import pandas as pd

from ..columns import Columns
from ..types import ExternalId
from ..utils.array_ops import fast_isin

TablesDict = tp.Dict[tp.Hashable, pd.DataFrame]

MIN_WIDTH_LIMIT = 10
REQUEST_NAMES_COL = "request_name"
REQUEST_IDS_COL = "request_id"

VisualAppT = tp.TypeVar("VisualAppT", bound="VisualAppBase")


class StorageFiles:
    """Fixed file names for `AppDataStorage` saving and loading."""

    Interactions = "interactions.csv"
    Recommendations = "recommendations.csv"
    Requests = "requests.csv"


@attr.s(slots=True)
class AppDataStorage:
    """Prepared per-request interaction and recommendation tables."""

    is_u2i: bool = attr.ib()
    id_col: str = attr.ib()
    selected_requests: tp.Dict[tp.Hashable, ExternalId] = attr.ib()
    grouped_interactions: TablesDict = attr.ib()
    grouped_reco: tp.Dict[tp.Hashable, TablesDict] = attr.ib()

    @classmethod
    def from_raw(
        cls,
        reco: tp.Union[pd.DataFrame, TablesDict],
        item_data: pd.DataFrame,
        selected_requests: tp.Optional[tp.Dict[tp.Hashable, ExternalId]] = None,
        is_u2i: bool = True,
        n_random_requests: int = 0,
        interactions: tp.Optional[pd.DataFrame] = None,
    ) -> "AppDataStorage":
        """Build storage from raw reco (DataFrame with model column, or dict of
        tables), item data and interactions (u2i only)."""
        id_col = Columns.User if is_u2i else Columns.TargetItem

        selected_requests = cls._validate_selected_requests(selected_requests, is_u2i, n_random_requests)

        if isinstance(reco, pd.DataFrame):
            if Columns.Model not in reco.columns:
                raise KeyError(f"Missing `{Columns.Model}` column in `reco` DataFrame")
            reco = cls._df_to_tables_dict(reco, Columns.Model)
        cls._check_columns_present_in_reco(reco=reco, id_col=id_col)

        if n_random_requests > 0:
            selected_requests = cls._fill_requests_with_random(selected_requests, n_random_requests, id_col, reco)

        if Columns.Item not in item_data:
            raise KeyError(f"Missed {Columns.Item} column in item_data")

        if interactions is not None and not is_u2i:
            raise ValueError("For i2i reco you must not specify interactions")
        if interactions is None:
            if is_u2i:
                raise ValueError("For u2i reco you must specify interactions")
            interactions = cls._prepare_interactions_for_i2i(reco=reco)

        grouped_interactions = cls._group_interactions(
            interactions=interactions, selected_requests=selected_requests, id_col=id_col, item_data=item_data
        )
        grouped_reco = cls._group_reco(
            reco=reco, selected_requests=selected_requests, id_col=id_col, item_data=item_data
        )
        return cls(
            id_col=id_col,
            is_u2i=is_u2i,
            selected_requests=selected_requests,
            grouped_interactions=grouped_interactions,
            grouped_reco=grouped_reco,
        )

    @classmethod
    def _validate_selected_requests(
        cls, selected_requests: tp.Optional[tp.Dict[tp.Hashable, ExternalId]], is_u2i: bool, n_random_requests: int
    ) -> tp.Dict[tp.Hashable, ExternalId]:
        if not selected_requests:
            if n_random_requests == 0:
                requests = "users" if is_u2i else "items"
                raise ValueError(f"Please specify `n_random_{requests}` > 0 or provide `selected_{requests}`")
            return {}
        return selected_requests

    @property
    def request_names(self) -> tp.List[tp.Hashable]:
        """Names of selected requests for comparison."""
        return list(self.selected_requests.keys())

    @property
    def model_names(self) -> tp.List[tp.Hashable]:
        """Names of recommendation models for comparison."""
        return list(self.grouped_reco.keys())

    @classmethod
    def _fill_requests_with_random(
        cls,
        selected_requests: tp.Dict[tp.Hashable, ExternalId],
        n_random_requests: int,
        id_col: str,
        reco: TablesDict,
    ) -> tp.Dict[tp.Hashable, ExternalId]:
        all_ids = [model_reco[id_col].unique() for model_reco in reco.values()]
        unique_ids = pd.unique(np.hstack(all_ids))
        selected_ids = np.array(list(selected_requests.values()))
        selected_mask = fast_isin(unique_ids, selected_ids) if len(selected_ids) else np.zeros(len(unique_ids), bool)
        selecting_from = unique_ids[~selected_mask]
        num_selecting = min(len(selecting_from), n_random_requests)
        new_ids = np.random.choice(selecting_from, num_selecting, replace=False)
        res = dict(selected_requests)
        res.update({f"random_{i + 1}": new_id for i, new_id in enumerate(new_ids)})
        return res

    @classmethod
    def _group_interactions(
        cls,
        interactions: pd.DataFrame,
        selected_requests: tp.Dict[tp.Hashable, ExternalId],
        id_col: str,
        item_data: tp.Optional[pd.DataFrame] = None,
    ) -> TablesDict:
        selected = interactions[interactions[id_col].isin(selected_requests.values())]
        if item_data is not None:
            selected = selected.merge(item_data, how="left", on=Columns.Item)
        return {
            request_name: selected[selected[id_col] == request_id].drop(columns=[id_col])
            for request_name, request_id in selected_requests.items()
        }

    @classmethod
    def _group_reco(
        cls,
        reco: TablesDict,
        selected_requests: tp.Dict[tp.Hashable, ExternalId],
        id_col: str,
        item_data: tp.Optional[pd.DataFrame] = None,
        drop_na_reco_cols: bool = False,
    ) -> tp.Dict[tp.Hashable, TablesDict]:
        prepared_reco = {}
        for model_name, model_reco in reco.items():
            selected = model_reco[model_reco[id_col].isin(selected_requests.values())]
            prepared_model_reco = {}
            for request_name, request_id in selected_requests.items():
                request_reco = selected[selected[id_col] == request_id].drop(columns=[id_col]).reset_index(drop=True)
                if drop_na_reco_cols:
                    request_reco = request_reco.dropna(axis=1, how="all")
                if item_data is not None:
                    request_reco = item_data.merge(
                        request_reco, how="right", on=Columns.Item, suffixes=["_item", "_reco"]
                    )
                prepared_model_reco[request_name] = request_reco
            prepared_reco[model_name] = prepared_model_reco
        return prepared_reco

    @classmethod
    def _ungroup_reco(
        cls,
        grouped_reco: tp.Dict[tp.Hashable, TablesDict],
        selected_requests: tp.Dict[tp.Hashable, ExternalId],
        id_col: str,
    ) -> pd.DataFrame:
        res = []
        for model_name, prepared_model_reco in grouped_reco.items():
            for request_name, request_reco in prepared_model_reco.items():
                df = request_reco.copy()
                df[id_col] = selected_requests[request_name]
                df[Columns.Model] = model_name
                res.append(df)
        return pd.concat(res, axis=0, sort=False).reset_index(drop=True)

    @classmethod
    def _ungroup_interactions(
        cls,
        grouped_interactions: TablesDict,
        selected_requests: tp.Dict[tp.Hashable, ExternalId],
        id_col: str,
    ) -> pd.DataFrame:
        res = []
        for request_name, request_interactions in grouped_interactions.items():
            df = request_interactions.copy()
            df[id_col] = selected_requests[request_name]
            res.append(df)
        return pd.concat(res, axis=0, sort=False).reset_index(drop=True)

    @classmethod
    def _check_columns_present_in_reco(cls, reco: TablesDict, id_col: str) -> None:
        required = {id_col, Columns.Item}
        for model_name, model_reco in reco.items():
            actual = set(model_reco.columns)
            if not actual >= required:
                raise KeyError(f"Missed columns {required - actual} in {model_name} recommendations df")

    @classmethod
    def _prepare_interactions_for_i2i(cls, reco: TablesDict) -> pd.DataFrame:
        request_ids: tp.Set[tp.Any] = set()
        for reco_df in reco.values():
            request_ids.update(set(reco_df[Columns.TargetItem].unique()))
        return pd.DataFrame({Columns.TargetItem: list(request_ids), Columns.Item: list(request_ids)})

    @classmethod
    def _df_to_tables_dict(cls, df: pd.DataFrame, key_col: str) -> TablesDict:
        return {
            key: grouped_df.drop(columns=[key_col]).reset_index(drop=True)
            for key, grouped_df in df.groupby(key_col)
        }

    def save(self, folder_name: str, overwrite: bool = False) -> None:
        """Persist prepared tables as three CSV files."""
        interactions_df = self._ungroup_interactions(
            grouped_interactions=self.grouped_interactions,
            selected_requests=self.selected_requests,
            id_col=self.id_col,
        )
        reco_df = self._ungroup_reco(
            grouped_reco=self.grouped_reco, selected_requests=self.selected_requests, id_col=self.id_col
        )
        requests_df = pd.Series(self.selected_requests, name=REQUEST_IDS_COL)

        Path(folder_name).mkdir(parents=True, exist_ok=True)
        mode = "w" if overwrite else "x"
        interactions_df.to_csv(Path(folder_name, StorageFiles.Interactions), index=False, mode=mode)
        reco_df.to_csv(Path(folder_name, StorageFiles.Recommendations), index=False, mode=mode)
        requests_df.to_csv(Path(folder_name, StorageFiles.Requests), index_label=REQUEST_NAMES_COL, mode=mode)

    @classmethod
    def load(cls, folder_name: str) -> "AppDataStorage":
        """Rebuild storage from a folder written by `save`."""
        interactions = pd.read_csv(Path(folder_name, StorageFiles.Interactions))
        reco = pd.read_csv(Path(folder_name, StorageFiles.Recommendations))
        selected_requests_df = pd.read_csv(Path(folder_name, StorageFiles.Requests), index_col=REQUEST_NAMES_COL)
        selected_requests = selected_requests_df[REQUEST_IDS_COL].to_dict()

        if Columns.TargetItem in interactions.columns and Columns.User in interactions.columns:
            raise ValueError(
                f"Unable to create VisualApp. Saved interactions have both columns: "
                f"{Columns.TargetItem} and {Columns.User}"
            )
        if Columns.User in interactions.columns:
            is_u2i, id_col = True, Columns.User
        elif Columns.TargetItem in interactions.columns:
            is_u2i, id_col = False, Columns.TargetItem
        else:
            raise ValueError(
                f"Unable to create VisualApp. Saved interactions don't have any of the columns: "
                f"{Columns.TargetItem} or {Columns.User}"
            )

        grouped_interactions = cls._group_interactions(
            interactions=interactions, selected_requests=selected_requests, id_col=id_col
        )
        reco_dict = cls._df_to_tables_dict(reco, Columns.Model)
        grouped_reco = cls._group_reco(
            reco=reco_dict, selected_requests=selected_requests, id_col=id_col, drop_na_reco_cols=True
        )
        return cls(
            selected_requests=selected_requests,
            is_u2i=is_u2i,
            id_col=id_col,
            grouped_interactions=grouped_interactions,
            grouped_reco=grouped_reco,
        )


class VisualAppBase:
    """ipywidgets app over an `AppDataStorage`
    (reference visual_app.py:364-533)."""

    def __init__(
        self,
        data_storage: AppDataStorage,
        auto_display: bool = True,
        formatters: tp.Optional[tp.Dict[str, tp.Callable]] = None,
        rows_limit: int = 20,
        min_width: int = 50,
    ) -> None:
        self.data_storage = data_storage
        self.rows_limit = rows_limit
        self.formatters = formatters if formatters is not None else {}
        if min_width <= MIN_WIDTH_LIMIT:
            raise ValueError(f"`min_width` must be greater then {MIN_WIDTH_LIMIT}. {min_width} specified")
        self.min_width = min_width
        if auto_display:
            self.display()

    def _convert_to_html(self, df: pd.DataFrame) -> str:
        return (
            df.to_html(escape=False, index=False, formatters=self.formatters, max_rows=self.rows_limit, border=0)
            .replace("<td>", '<td align="center">')
            .replace("<th>", f'<th style="text-align: center; min-width: {self.min_width}px;">')
        )

    def _display_interactions(self, request_name: str) -> None:
        import ipywidgets as widgets
        from IPython.display import display

        items_tab = widgets.Tab()
        df = self.data_storage.grouped_interactions[request_name]
        items_tab.children = [widgets.HTML(value=self._convert_to_html(df))]
        items_tab.set_title(index=0, title="Interactions")
        display(items_tab)

    def _display_recommendations(self, request_name: str, model_name: str) -> None:
        import ipywidgets as widgets
        from IPython.display import display

        items_tab = widgets.Tab()
        df = self.data_storage.grouped_reco[model_name][request_name]
        items_tab.children = [widgets.HTML(value=self._convert_to_html(df))]
        items_tab.set_title(index=0, title="Recommended")
        display(items_tab)

    def _display_request_id(self, request_name: str) -> None:
        import ipywidgets as widgets
        from IPython.display import display

        request_id = self.data_storage.selected_requests[request_name]
        display(widgets.HTML(value=f"{self.data_storage.id_col}: {request_id}"))

    def _display_model_name(self, model_name: str) -> None:
        import ipywidgets as widgets
        from IPython.display import display

        display(widgets.HTML(value=f"Model name: {model_name}"))

    def display(self) -> None:
        """Render the toggle-buttons + tables widget tree."""
        import ipywidgets as widgets
        from IPython.display import display

        request_name_selection = widgets.ToggleButtons(
            options=self.data_storage.request_names, description="Target:", disabled=False, button_style="warning"
        )
        request_id_output = widgets.interactive_output(
            self._display_request_id, {"request_name": request_name_selection}
        )
        interactions_output = widgets.interactive_output(
            self._display_interactions, {"request_name": request_name_selection}
        )
        model_selection = widgets.ToggleButtons(
            options=self.data_storage.model_names, description="Model:", disabled=False, button_style="success"
        )
        model_name_output = widgets.interactive_output(self._display_model_name, {"model_name": model_selection})
        reco_output = widgets.interactive_output(
            self._display_recommendations,
            {"request_name": request_name_selection, "model_name": model_selection},
        )
        display(
            widgets.VBox(
                [
                    request_name_selection,
                    request_id_output,
                    interactions_output,
                    model_selection,
                    model_name_output,
                    reco_output,
                ]
            )
        )

    def save(self, folder_name: str, overwrite: bool = False) -> None:
        """Persist the underlying data storage."""
        self.data_storage.save(folder_name, overwrite)

    @classmethod
    def load(
        cls: tp.Type[VisualAppT],
        folder_name: str,
        auto_display: bool = True,
        formatters: tp.Optional[tp.Dict[str, tp.Callable]] = None,
        rows_limit: int = 20,
        min_width: int = 100,
    ) -> VisualAppT:
        """Re-create the app from a saved data folder."""
        data_storage = AppDataStorage.load(folder_name=folder_name)
        return cls(
            data_storage=data_storage,
            auto_display=auto_display,
            formatters=formatters,
            rows_limit=rows_limit,
            min_width=min_width,
        )


class VisualApp(VisualAppBase):
    """U2I visual app (reference visual_app.py:534-687)."""

    @classmethod
    def construct(
        cls,
        reco: tp.Union[pd.DataFrame, TablesDict],
        interactions: pd.DataFrame,
        item_data: pd.DataFrame,
        selected_users: tp.Optional[tp.Dict[tp.Hashable, ExternalId]] = None,
        n_random_users: int = 0,
        auto_display: bool = True,
        formatters: tp.Optional[tp.Dict[str, tp.Callable]] = None,
        rows_limit: int = 20,
        min_width: int = 100,
    ) -> "VisualApp":
        """Build the app from raw u2i reco + interactions + item data."""
        data_storage = AppDataStorage.from_raw(
            reco=reco,
            item_data=item_data,
            interactions=interactions,
            selected_requests=selected_users,
            is_u2i=True,
            n_random_requests=n_random_users,
        )
        return cls(
            data_storage=data_storage,
            auto_display=auto_display,
            formatters=formatters,
            rows_limit=rows_limit,
            min_width=min_width,
        )


class ItemToItemVisualApp(VisualAppBase):
    """I2I visual app (reference visual_app.py:688-825)."""

    @classmethod
    def construct(
        cls,
        reco: tp.Union[pd.DataFrame, TablesDict],
        item_data: pd.DataFrame,
        selected_items: tp.Optional[tp.Dict[tp.Hashable, ExternalId]] = None,
        n_random_items: int = 0,
        auto_display: bool = True,
        formatters: tp.Optional[tp.Dict[str, tp.Callable]] = None,
        rows_limit: int = 20,
        min_width: int = 100,
    ) -> "ItemToItemVisualApp":
        """Build the app from raw i2i reco + item data."""
        data_storage = AppDataStorage.from_raw(
            reco=reco,
            item_data=item_data,
            selected_requests=selected_items,
            is_u2i=False,
            n_random_requests=n_random_items,
        )
        return cls(
            data_storage=data_storage,
            auto_display=auto_display,
            formatters=formatters,
            rows_limit=rows_limit,
            min_width=min_width,
        )
