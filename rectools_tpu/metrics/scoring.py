"""calc_metrics dispatcher: groups metrics by family to share merges and fits.

Behavioral parity with reference rectools/metrics/scoring.py:37-223.
"""

import typing as tp
import warnings

import pandas as pd

from ..utils.misc import select_by_type
from .auc import AucMetric, calc_auc_metrics
from .base import Catalog, MetricAtK, merge_reco
from .catalog import CatalogMetric, calc_catalog_metrics
from .classification import ClassificationMetric, SimpleClassificationMetric, calc_classification_metrics
from .diversity import DiversityMetric, calc_diversity_metrics
from .dq import CrossDQMetric, RecoDQMetric, calc_cross_dq_metrics, calc_reco_dq_metrics
from .intersection import IntersectionMetric, calc_intersection_metrics
from .novelty import NoveltyMetric, calc_novelty_metrics
from .popularity import PopularityMetric, calc_popularity_metrics
from .ranking import RankingMetric, calc_ranking_metrics
from .serendipity import SerendipityMetric, calc_serendipity_metrics


def calc_metrics(  # noqa: C901
    metrics: tp.Mapping[str, MetricAtK],
    reco: pd.DataFrame,
    interactions: tp.Optional[pd.DataFrame] = None,
    prev_interactions: tp.Optional[pd.DataFrame] = None,
    catalog: tp.Optional[Catalog] = None,
    ref_reco: tp.Optional[tp.Union[pd.DataFrame, tp.Dict[tp.Hashable, pd.DataFrame]]] = None,
) -> tp.Dict[str, float]:
    """Calculate a batch of metrics, validating required inputs per family.

    >>> import pandas as pd
    >>> from rectools_tpu import Columns
    >>> from rectools_tpu.metrics import Accuracy, NDCG
    >>> reco = pd.DataFrame({
    ...     Columns.User: [1, 1, 2, 2, 3, 3, 3, 3, 4, 4, 4],
    ...     Columns.Item: [7, 8, 1, 2, 1, 2, 3, 4, 1, 2, 3],
    ...     Columns.Rank: [1, 2, 1, 2, 1, 2, 3, 4, 1, 2, 3]})
    >>> interactions = pd.DataFrame({
    ...     Columns.User: [1, 1, 2, 3, 3, 3, 4, 4, 4],
    ...     Columns.Item: [1, 2, 1, 1, 3, 4, 1, 2, 3],
    ...     Columns.Datetime: [1, 1, 1, 1, 1, 2, 2, 2, 2]})
    >>> df_train = interactions.loc[interactions[Columns.Datetime] < 2]
    >>> df_test = interactions.loc[interactions[Columns.Datetime] >= 2]
    >>> calc_metrics(
    ...     {'ndcg@1': NDCG(k=1), 'accuracy@1': Accuracy(k=1)},
    ...     reco=reco, interactions=df_test, prev_interactions=df_train,
    ...     catalog=df_train[Columns.Item].unique())
    {'accuracy@1': 0.3333333333333333, 'ndcg@1': 0.5}
    """
    merged = None
    results: tp.Dict[str, float] = {}
    expected_results_len = len(metrics)

    classification_metrics = select_by_type(metrics, (ClassificationMetric, SimpleClassificationMetric))
    if classification_metrics:
        if interactions is None:
            raise ValueError("For calculating classification metrics it's necessary to set 'interactions'")
        merged = merge_reco(reco, interactions)
        results.update(calc_classification_metrics(classification_metrics, merged, catalog))

    ranking_metrics = select_by_type(metrics, RankingMetric)
    if ranking_metrics:
        if interactions is None:
            raise ValueError("For calculating ranking metrics it's necessary to set 'interactions'")
        merged = merged if merged is not None else merge_reco(reco, interactions)
        results.update(calc_ranking_metrics(ranking_metrics, merged))

    auc_metrics = select_by_type(metrics, AucMetric)
    if auc_metrics:
        if interactions is None:
            raise ValueError("For calculating AUC-like metrics it's necessary to set 'interactions'")
        results.update(calc_auc_metrics(auc_metrics, reco, interactions))

    novelty_metrics = select_by_type(metrics, NoveltyMetric)
    if novelty_metrics:
        if prev_interactions is None:
            raise ValueError("For calculating novelty metrics it's necessary to set 'prev_interactions'")
        results.update(calc_novelty_metrics(novelty_metrics, reco, prev_interactions))

    catalog_metrics = select_by_type(metrics, CatalogMetric)
    if catalog_metrics:
        if catalog is None:
            raise ValueError("For calculating catalog metrics it's necessary to set 'catalog'")
        results.update(calc_catalog_metrics(catalog_metrics, reco, catalog))

    popularity_metrics = select_by_type(metrics, PopularityMetric)
    if popularity_metrics:
        if prev_interactions is None:
            raise ValueError("For calculating popularity metrics it's necessary to set 'prev_interactions'")
        results.update(calc_popularity_metrics(popularity_metrics, reco, prev_interactions))

    diversity_metrics = select_by_type(metrics, DiversityMetric)
    if diversity_metrics:
        results.update(calc_diversity_metrics(diversity_metrics, reco))

    serendipity_metrics = select_by_type(metrics, SerendipityMetric)
    if serendipity_metrics:
        if interactions is None:
            raise ValueError("For calculating serendipity metrics it's necessary to set 'interactions'")
        if prev_interactions is None:
            raise ValueError("For calculating serendipity metrics it's necessary to set 'prev_interactions'")
        if catalog is None:
            raise ValueError("For calculating serendipity metrics it's necessary to set 'catalog'")
        results.update(
            calc_serendipity_metrics(serendipity_metrics, reco, interactions, prev_interactions, catalog)
        )

    intersection_metrics = select_by_type(metrics, IntersectionMetric)
    if intersection_metrics:
        if ref_reco is None or (isinstance(ref_reco, dict) and not ref_reco):
            raise ValueError("For calculating intersection metrics it's necessary to set 'ref_reco'")
        intersection_values = calc_intersection_metrics(intersection_metrics, reco, ref_reco)
        results.update(intersection_values)
        expected_results_len += len(intersection_values) - len(intersection_metrics)

    cross_dq_metrics = select_by_type(metrics, CrossDQMetric)
    if cross_dq_metrics:
        if interactions is None:
            raise ValueError("For calculating some of the required DQ metrics it's necessary to set 'interactions'")
        results.update(calc_cross_dq_metrics(cross_dq_metrics, reco, interactions))

    reco_dq_metrics = select_by_type(metrics, RecoDQMetric)
    if reco_dq_metrics:
        results.update(calc_reco_dq_metrics(reco_dq_metrics, reco))

    if len(results) < expected_results_len:
        warnings.warn("Custom metrics are not supported.")

    return {k: v.item() if hasattr(v, "item") else v for k, v in results.items()}
