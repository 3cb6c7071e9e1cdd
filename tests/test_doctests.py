"""Run executable docstring examples across the package, mirroring the
reference's `--doctest-modules` CI strategy (reference Makefile:63-64,
SURVEY.md §4).

Modules are auto-discovered: every importable module under ``rectools_tpu``
is scanned, and any module carrying at least one doctest example gets its
own test case — a new doctest can never silently go unexercised. A core
list is pinned so that coverage regressions (a doctest deleted wholesale)
also fail loudly.
"""

import doctest
import importlib
import pkgutil

import pytest

import rectools_tpu

# Modules that MUST carry doctests (the user-facing examples the docs lean on).
CORE_DOCTEST_MODULES = {
    "rectools_tpu.metrics.auc",
    "rectools_tpu.metrics.dq",
    "rectools_tpu.metrics.novelty",
    "rectools_tpu.metrics.popularity",
    "rectools_tpu.metrics.ranking",
    "rectools_tpu.metrics.scoring",
    "rectools_tpu.metrics.serendipity",
    "rectools_tpu.metrics.distances",
    "rectools_tpu.model_selection.last_n_split",
    "rectools_tpu.model_selection.time_split",
    "rectools_tpu.utils.array_ops",
    "rectools_tpu.utils.misc",
}

# Optional-dependency modules that may fail to import in minimal environments.
_SKIP_IMPORT_ERRORS = ("plotly", "ipywidgets", "catboost", "torch")


def _discover_doctest_modules():
    found = []
    for info in pkgutil.walk_packages(rectools_tpu.__path__, prefix="rectools_tpu."):
        try:
            module = importlib.import_module(info.name)
        except ImportError as exc:  # optional extras absent
            if any(dep in str(exc) for dep in _SKIP_IMPORT_ERRORS):
                continue
            raise
        finder = doctest.DocTestFinder(exclude_empty=True)
        if any(t.examples for t in finder.find(module)):
            found.append(info.name)
    return sorted(found)


DOCTEST_MODULES = _discover_doctest_modules()


def test_core_modules_carry_doctests() -> None:
    missing = CORE_DOCTEST_MODULES - set(DOCTEST_MODULES)
    assert not missing, f"doctests disappeared from: {sorted(missing)}"


@pytest.mark.parametrize("module_name", DOCTEST_MODULES)
def test_doctests(module_name: str) -> None:
    module = importlib.import_module(module_name)
    results = doctest.testmod(module, verbose=False)
    assert results.failed == 0, f"{results.failed} doctest failures in {module_name}"
    assert results.attempted > 0
