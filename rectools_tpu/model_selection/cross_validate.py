"""Cross-validation driver over models and metrics.

Behavioral parity with reference rectools/model_selection/cross_validate.py:28-185.
"""

import typing as tp

from ..columns import Columns
from ..dataset import Dataset
from ..dataset.context import get_context
from ..metrics import MetricAtK
from ..metrics.scoring import calc_metrics
from ..models.base import ErrorBehaviour, ModelBase
from ..types import ExternalIds
from .splitter import Splitter


def cross_validate(  # noqa: C901
    dataset: Dataset,
    splitter: Splitter,
    metrics: tp.Dict[str, MetricAtK],
    models: tp.Dict[str, ModelBase],
    k: int,
    filter_viewed: bool,
    items_to_recommend: tp.Optional[ExternalIds] = None,
    prefer_warm_inference_over_cold: bool = True,
    ref_models: tp.Optional[tp.List[str]] = None,
    validate_ref_models: bool = False,
    on_unsupported_targets: ErrorBehaviour = "warn",
) -> tp.Dict[str, tp.Any]:
    """Per fold: build a 2nd-level train dataset, fit every model, recommend
    for test users, score metrics. Returns {"splits": [...], "metrics": [...]}.
    """
    split_iterator = splitter.split(dataset.interactions, collect_fold_stats=True)

    split_infos = []
    metrics_all = []

    for train_ids, test_ids, split_info in split_iterator:
        split_infos.append(split_info)

        fold_dataset = dataset.filter_interactions(
            row_indexes_to_keep=train_ids,
            keep_external_ids=True,
            keep_features_for_removed_entities=prefer_warm_inference_over_cold,
        )
        interactions_df_test = dataset.interactions.df.loc[test_ids].copy()
        interactions_df_test[Columns.User] = dataset.user_id_map.convert_to_external(
            interactions_df_test[Columns.User]
        )
        interactions_df_test[Columns.Item] = dataset.item_id_map.convert_to_external(
            interactions_df_test[Columns.Item]
        )

        test_users = interactions_df_test[Columns.User].unique()
        prev_interactions = fold_dataset.get_raw_interactions()
        catalog = prev_interactions[Columns.Item].unique()
        test_fold_context = None
        if any(model.require_recommend_context for model in models.values()):
            test_fold_context = get_context(interactions_df_test)

        ref_reco = {}
        for model_name in ref_models or []:
            model = models[model_name]
            model.fit(fold_dataset)
            context = test_fold_context if model.require_recommend_context else None
            ref_reco[model_name] = model.recommend(
                users=test_users,
                dataset=fold_dataset,
                k=k,
                filter_viewed=filter_viewed,
                items_to_recommend=items_to_recommend,
                on_unsupported_targets=on_unsupported_targets,
                context=context,
            )

        for model_name, model in models.items():
            if model_name in ref_reco and not validate_ref_models:
                continue

            if model_name in ref_reco:
                reco = ref_reco[model_name]
            else:
                model.fit(fold_dataset)
                context = test_fold_context if model.require_recommend_context else None
                reco = model.recommend(
                    users=test_users,
                    dataset=fold_dataset,
                    k=k,
                    filter_viewed=filter_viewed,
                    items_to_recommend=items_to_recommend,
                    on_unsupported_targets=on_unsupported_targets,
                    context=context,
                )

            metric_values = calc_metrics(
                metrics,
                reco=reco,
                interactions=interactions_df_test,
                prev_interactions=prev_interactions,
                catalog=catalog,
                ref_reco=ref_reco,
            )
            res: tp.Dict[str, tp.Any] = {"model": model_name, "i_split": split_info["i_split"]}
            res.update(metric_values)
            metrics_all.append(res)

    return {"splits": split_infos, "metrics": metrics_all}
