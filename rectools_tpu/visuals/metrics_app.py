"""MetricsApp: plotly scatter of cross_validate metric trade-offs.

Behavioral parity with reference rectools/visuals/metrics_app.py:35-378.
plotly is an optional dependency: all data preparation and validation work
without it; only `display()` / chart creation require it and raise an
informative ImportError when missing.
"""

import typing as tp
from functools import lru_cache

import pandas as pd

from ..columns import Columns

WIDGET_WIDTH = 800
WIDGET_HEIGHT = 600
TOP_CHART_MARGIN = 20
DEFAULT_LEGEND_TITLE = "model"
META_MODEL_SEP = ", "
META_MODEL_SEP_REPLACEMENT = " "
NAN_COLOR = "grey"


def _require_plotly() -> tp.Any:
    try:
        import plotly.express as px
        import plotly.graph_objects as go

        return px, go
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "Requirement `plotly` is not satisfied. Install plotly to display MetricsApp charts."
        ) from e


class MetricsApp:
    """Interactive metric-to-metric trade-off explorer over cross_validate
    results. Use `MetricsApp.construct`."""

    def __init__(
        self,
        data: pd.DataFrame,
        metric_names: tp.List[str],
        meta_names: tp.List[str],
        show_legend: bool = True,
        auto_display: bool = True,
        scatter_kwargs: tp.Optional[tp.Dict[str, tp.Any]] = None,
    ):
        self.data = data
        self.metric_names = metric_names
        self.meta_names = meta_names
        self.show_legend = show_legend
        self.auto_display = auto_display
        self.scatter_kwargs = scatter_kwargs if scatter_kwargs is not None else {}
        self.fig: tp.Any = None
        if self.auto_display:
            self.display()

    @classmethod
    def construct(
        cls,
        models_metrics: pd.DataFrame,
        models_metadata: tp.Optional[pd.DataFrame] = None,
        show_legend: bool = True,
        auto_display: bool = True,
        scatter_kwargs: tp.Optional[tp.Dict[str, tp.Any]] = None,
    ) -> "MetricsApp":
        """Build the app from cross_validate-style metric rows (+ optional
        model metadata for alternative coloring)."""
        cls._validate_models_metrics_base(models_metrics)
        cls._validate_models_metrics_split(models_metrics)
        if models_metadata is None:
            models_metadata = models_metrics[Columns.Model].drop_duplicates().to_frame()
        cls._validate_models_metadata(models_metadata)

        merged_data = models_metrics.merge(models_metadata, on=Columns.Model, how="left")
        merged_data = merged_data.replace(META_MODEL_SEP, META_MODEL_SEP_REPLACEMENT, regex=True)

        metric_names = [col for col in models_metrics.columns if col not in {Columns.Split, Columns.Model}]
        meta_names = [col for col in models_metadata.columns if col != Columns.Model]
        return cls(merged_data, metric_names, meta_names, show_legend, auto_display, scatter_kwargs)

    @property
    def model_names(self) -> tp.List[str]:
        """Sorted model names."""
        return sorted(self.data[Columns.Model].unique())

    @property
    def fold_ids(self) -> tp.Optional[tp.List[int]]:
        """Sorted fold identifiers (None if no split column)."""
        if Columns.Split in self.data.columns:
            return sorted(self.data[Columns.Split].unique())
        return None

    # ---------------------------------------------------------------- validate

    @staticmethod
    def _validate_models_metrics_base(models_metrics: pd.DataFrame) -> None:
        metric_columns = list(set(models_metrics.columns) - {Columns.Model, Columns.Split})
        if Columns.Model not in models_metrics.columns:
            raise KeyError("Missing `Model` column in `metrics_data` DataFrame")
        if not metric_columns:
            raise KeyError("`metrics_data` DataFrame assumed to have at least one metric column")
        if models_metrics[Columns.Model].isnull().any():
            raise ValueError("Found NaN values in `Model` column of `metrics_data`")
        if Columns.Split in models_metrics.columns and models_metrics[Columns.Split].isnull().any():
            raise ValueError("Found NaN values in `Split` column of `metrics_data`")
        if Columns.Split not in models_metrics.columns and models_metrics[Columns.Model].nunique() != len(
            models_metrics
        ):
            raise ValueError("Each `Model` value in the `metrics_data` DataFrame must be unique")
        if len(models_metrics[metric_columns].select_dtypes(include="number").columns) != len(metric_columns):
            raise ValueError("All metrics columns should be numeric")

    @staticmethod
    def _validate_models_metrics_split(models_metrics: pd.DataFrame) -> None:
        if Columns.Split not in models_metrics.columns:
            return
        splits = models_metrics.groupby(Columns.Model)[Columns.Split].apply(frozenset)
        if len(set(splits)) > 1:
            raise ValueError(f"All models must have the same splits. But now they are different: {set(splits)}")
        if models_metrics.duplicated(subset=[Columns.Model, Columns.Split], keep=False).any():
            raise ValueError("Each pair of `Model` and `Split` values in the `metrics_data` DataFrame must be unique")

    @staticmethod
    def _validate_models_metadata(models_metadata: pd.DataFrame) -> None:
        if Columns.Model not in models_metadata.columns:
            raise KeyError("Missing `Model` column in `models_metadata` DataFrame")
        if models_metadata[Columns.Model].isnull().any():
            raise ValueError("Found NaN values in `Model` column")
        if models_metadata[Columns.Model].nunique() != len(models_metadata):
            raise ValueError("`Model` values of `models_metadata` should be unique`")

    # -------------------------------------------------------------- chart data

    @lru_cache
    def _make_chart_data_fold(self, fold_number: int) -> pd.DataFrame:
        return self.data[self.data[Columns.Split] == fold_number].reset_index(drop=True)

    @lru_cache
    def _make_chart_data_avg(self) -> pd.DataFrame:
        avg_data = self.data.groupby(Columns.Model).agg(
            {
                **{metric: "mean" for metric in self.metric_names},
                **{meta: "first" for meta in self.meta_names},
            }
        )
        return avg_data.reset_index()

    @staticmethod
    def _split_to_meta_and_model(raw_string: str, sep: str = META_MODEL_SEP) -> tp.Tuple[str, str]:
        splitted = raw_string.split(sep, 1)
        if len(splitted) > 1:
            return splitted[0], splitted[1]
        return "", raw_string

    def _create_chart_figure(
        self, data: pd.DataFrame, x_col: str, y_col: str, color_col: str, legend_title: str
    ) -> tp.Any:  # pragma: no cover - needs plotly
        px, _ = _require_plotly()
        scatter_kwargs = {"width": WIDGET_WIDTH, "height": WIDGET_HEIGHT}
        scatter_kwargs.update(self.scatter_kwargs)
        data = data.sort_values(by=color_col, ascending=True)
        data[color_col] = data[color_col].astype(str)
        fig = px.scatter(data, x=x_col, y=y_col, color=color_col, symbol=Columns.Model, **scatter_kwargs)
        if color_col != Columns.Model:
            for trace, meta_value, model_name in zip(fig.data, data[color_col], data[Columns.Model]):
                trace.name = f"{meta_value}{META_MODEL_SEP}{model_name}"
        fig.update_layout(margin={"t": TOP_CHART_MARGIN}, legend_title=legend_title, showlegend=self.show_legend)
        fig.update_coloraxes(showscale=False)
        return fig

    def display(self) -> None:  # pragma: no cover - interactive widget
        """Render the plotly FigureWidget + selection widgets."""
        import ipywidgets as widgets
        from IPython.display import display

        _, go = _require_plotly()

        metric_x = widgets.Dropdown(description="Metric X:", value=self.metric_names[0], options=self.metric_names)
        metric_y = widgets.Dropdown(
            description="Metric Y:",
            value=self.metric_names[min(1, len(self.metric_names) - 1)],
            options=self.metric_names,
        )
        use_avg = widgets.Checkbox(description="Average folds", value=True)
        fold_i = widgets.Dropdown(
            description="Fold number:",
            value=self.fold_ids[0] if self.fold_ids is not None else None,
            options=self.fold_ids if self.fold_ids is not None else [],
        )
        use_meta = widgets.Checkbox(description="Use metadata", value=False)
        meta_feature = widgets.Dropdown(
            description="Color by:",
            value=self.meta_names[0] if self.meta_names else None,
            options=self.meta_names,
        )

        def chart_data_now() -> pd.DataFrame:
            if use_avg.value or fold_i.value is None:
                return self._make_chart_data_avg()
            return self._make_chart_data_fold(fold_i.value)

        legend_title = DEFAULT_LEGEND_TITLE
        self.fig = self._create_chart_figure(chart_data_now(), metric_x.value, metric_y.value, Columns.Model, legend_title)
        fig_widget = go.FigureWidget(data=self.fig.data, layout=self.fig.layout)

        def update(event: tp.Any) -> None:
            color_col = meta_feature.value if use_meta.value else Columns.Model
            title = (
                f"{meta_feature.value}{META_MODEL_SEP}{DEFAULT_LEGEND_TITLE}"
                if use_meta.value
                else DEFAULT_LEGEND_TITLE
            )
            self.fig = self._create_chart_figure(chart_data_now(), metric_x.value, metric_y.value, color_col, title)
            with fig_widget.batch_update():
                for idx, trace in enumerate(self.fig.data):
                    if idx < len(fig_widget.data):
                        fig_widget.data[idx].x = trace.x
                        fig_widget.data[idx].y = trace.y
                        fig_widget.data[idx].name = trace.name
                fig_widget.layout = self.fig.layout
            fold_i.layout.visibility = "hidden" if use_avg.value else "visible"
            meta_feature.layout.visibility = "hidden" if not use_meta.value else "visible"

        for widget in (metric_x, metric_y, use_avg, fold_i, use_meta, meta_feature):
            widget.observe(update, "value")

        tab = widgets.Tab()
        metrics_vbox = widgets.VBox([widgets.HBox([metric_x, metric_y])])
        if self.fold_ids:
            metrics_vbox = widgets.VBox([widgets.HBox([use_avg, fold_i]), widgets.HBox([metric_x, metric_y])])
        if self.meta_names:
            metadata_vbox = widgets.VBox([widgets.HBox([use_meta, meta_feature])])
            tab.children = [metrics_vbox, metadata_vbox]
            tab.set_title(0, "Metrics")
            tab.set_title(1, "Metadata")
        else:
            tab.children = [metrics_vbox]
            tab.set_title(0, "Metrics")

        display(widgets.VBox([tab, fig_widget]))
        update(None)
