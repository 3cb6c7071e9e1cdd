"""Run executable docstring examples across the package, mirroring the
reference's `--doctest-modules` CI strategy (SURVEY.md §4)."""

import doctest

import pytest

import rectools_tpu.metrics.auc
import rectools_tpu.metrics.dq
import rectools_tpu.metrics.novelty
import rectools_tpu.metrics.popularity
import rectools_tpu.metrics.ranking
import rectools_tpu.metrics.scoring
import rectools_tpu.metrics.serendipity
import rectools_tpu.metrics.distances
import rectools_tpu.model_selection.last_n_split
import rectools_tpu.model_selection.time_split
import rectools_tpu.utils.array_ops
import rectools_tpu.utils.misc

MODULES = [
    rectools_tpu.metrics.auc,
    rectools_tpu.metrics.dq,
    rectools_tpu.metrics.novelty,
    rectools_tpu.metrics.popularity,
    rectools_tpu.metrics.ranking,
    rectools_tpu.metrics.scoring,
    rectools_tpu.metrics.serendipity,
    rectools_tpu.metrics.distances,
    rectools_tpu.model_selection.last_n_split,
    rectools_tpu.model_selection.time_split,
    rectools_tpu.utils.array_ops,
    rectools_tpu.utils.misc,
]


@pytest.mark.parametrize("module", MODULES, ids=lambda m: m.__name__)
def test_doctests(module) -> None:
    results = doctest.testmod(module, verbose=False)
    assert results.attempted > 0, f"no doctests found in {module.__name__}"
    assert results.failed == 0
