"""Head-to-head parity tests: run the actual REFERENCE RecTools (pure-python
paths only) against rectools_tpu on identical inputs.

The reference tree at /root/reference is imported read-only with a numpy
stub standing in for the `implicit` package (see implicit_stub/); models
whose training lives in Cython/CUDA (iALS, BPR, kNN, LightFM) cannot run and
are validated elsewhere against analytic oracles. If the reference fails to
import (e.g. incompatible pandas), the whole directory is skipped — parity
then rests on the oracle tests.
"""

import sys
from pathlib import Path

import pytest

_STUB = str(Path(__file__).parent / "implicit_stub")
_REFERENCE = "/root/reference"


def _import_reference():
    if _STUB not in sys.path:
        sys.path.insert(0, _STUB)
    if _REFERENCE not in sys.path:
        sys.path.append(_REFERENCE)
    # pytest may have already imported the site-packages typeguard (v2, whose
    # API the reference can't use); graft the v4-style entry points from our
    # shim onto whatever module object is installed
    import typeguard as loaded_typeguard

    if not hasattr(loaded_typeguard, "TypeCheckError"):
        import importlib.util

        spec = importlib.util.spec_from_file_location("_typeguard_shim", Path(_STUB) / "typeguard.py")
        shim = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(shim)
        loaded_typeguard.TypeCheckError = shim.TypeCheckError
        loaded_typeguard.check_type = shim.check_type

    # pandas>=3 rejects tuples/lists in pd.unique; the reference passes its
    # extra-token tuples there. Coerce sequence inputs the way pandas<3 did —
    # semantics otherwise untouched.
    import numpy as np
    import pandas as pd

    if not getattr(pd.unique, "_parity_coercion", False):
        original_unique = pd.unique

        def unique_compat(values):
            if isinstance(values, (tuple, list)):
                as_array = np.asarray(values)
                if as_array.dtype.kind not in "iufb":
                    # pandas<3 kept non-numeric python sequences as object
                    # arrays — crucial for "PAD"-token id maps that later
                    # append integer ids
                    as_array = np.array(values, dtype=object)
                values = as_array
            return original_unique(values)

        unique_compat._parity_coercion = True
        pd.unique = unique_compat

    import rectools  # noqa: F401
    import rectools.models  # noqa: F401

    return rectools


try:
    _import_reference()
    _REFERENCE_OK = True
    _REFERENCE_ERR = ""
except Exception as exc:  # pragma: no cover - environment-dependent
    _REFERENCE_OK = False
    _REFERENCE_ERR = repr(exc)

collect_ignore_glob = ["implicit_stub/*"]


def pytest_collection_modifyitems(config, items):
    # Live-reference head-to-head is a separable job: deselect with
    # `-m "not live_reference"`. The frozen-fixture suite (tests/frozen/)
    # carries the same coverage without importing the reference.
    live_marker = pytest.mark.live_reference
    skip = pytest.mark.skip(reason=f"reference rectools not importable: {_REFERENCE_ERR}")
    for item in items:
        if "tests/parity" in str(item.fspath).replace("\\", "/"):
            item.add_marker(live_marker)
            if not _REFERENCE_OK:
                item.add_marker(skip)
