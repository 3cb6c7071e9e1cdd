"""Frozen-fixture parity: rectools_tpu vs recorded reference outputs.

No reference import happens here — expected values live in fixtures.json
(recorded by record.py from the live reference). This keeps the parity
coverage alive even if the reference tree, pandas, or the implicit stub
drift; the live head-to-head remains as the opt-in tests/parity job.

Comparison semantics mirror the live suite per case family:
  metric/*       floats to 1e-9 (tests/parity/test_metrics_parity.py:70)
  model/svd_u2i  >=95% row match, scores 1e-3 (test_model_parity.py:132-146)
  model/pic_*    set sizes equal + >=85% overlap (test_model_parity.py:203-207)
  everything else: exact ids, scores to 1e-4.
"""

import json
from pathlib import Path

import numpy as np
import pytest

from tests.frozen.cases import TpuEnv, build_cases

FIXTURES = Path(__file__).parent / "fixtures.json"
CASES = build_cases()

with FIXTURES.open() as f:
    FROZEN = json.load(f)["cases"]


@pytest.fixture(scope="module")
def tpu_env():
    return TpuEnv()


def _assert_close(expected, actual, path, atol, rtol):
    assert type(expected) is type(actual) or (
        isinstance(expected, (int, float)) and isinstance(actual, (int, float))
    ), f"{path}: type {type(expected).__name__} vs {type(actual).__name__}"
    if isinstance(expected, dict):
        assert expected.keys() == actual.keys(), f"{path}: keys {sorted(expected)} vs {sorted(actual)}"
        for key in expected:
            _assert_close(expected[key], actual[key], f"{path}.{key}", atol, rtol)
    elif isinstance(expected, list):
        exp_arr, act_arr = np.asarray(expected), np.asarray(actual)
        assert exp_arr.shape == act_arr.shape, f"{path}: shape {exp_arr.shape} vs {act_arr.shape}"
        if exp_arr.dtype.kind == "f" or act_arr.dtype.kind == "f":
            np.testing.assert_allclose(exp_arr, act_arr, atol=atol, rtol=rtol, err_msg=path)
        else:
            np.testing.assert_array_equal(exp_arr, act_arr, err_msg=path)
    elif isinstance(expected, float):
        np.testing.assert_allclose(expected, actual, atol=atol, rtol=rtol, err_msg=path)
    else:
        assert expected == actual, f"{path}: {expected!r} vs {actual!r}"


def _assert_reco_fuzzy(expected, actual, min_match, score_atol, id_col="user_id"):
    """Row-matching reco comparison (the live suite's svd semantics)."""
    exp_keys = list(zip(expected[id_col], expected["item_id"]))
    act = {k: s for k, s in zip(zip(actual[id_col], actual["item_id"]), actual["score"])}
    matched = [(s, act[k]) for k, s in zip(exp_keys, expected["score"]) if k in act]
    assert len(expected[id_col]) == len(actual[id_col])
    assert len(matched) >= min_match * len(exp_keys), f"only {len(matched)}/{len(exp_keys)} rows matched"
    exp_scores, act_scores = (np.array(c) for c in zip(*matched))
    np.testing.assert_allclose(exp_scores, act_scores, atol=score_atol, rtol=1e-3)


def _assert_item_sets_overlap(expected, actual, min_overlap):
    assert expected.keys() == actual.keys()
    n_common = n_total = 0
    for user, exp_items in expected.items():
        act_items = actual[user]
        assert len(exp_items) == len(act_items), f"user {user}: {len(exp_items)} vs {len(act_items)} items"
        n_common += len(set(exp_items) & set(act_items))
        n_total += len(exp_items)
    assert n_common >= min_overlap * n_total, f"overlap {n_common}/{n_total}"


@pytest.mark.parametrize("name", sorted(CASES))
def test_frozen_case(name, tpu_env):
    assert name in FROZEN, f"{name} missing from fixtures.json — run `python -m tests.frozen.record`"
    expected = FROZEN[name]
    actual = json.loads(json.dumps(CASES[name](tpu_env)))  # normalize like the recorder did
    if name == "model/svd_u2i":
        _assert_reco_fuzzy(expected, actual, min_match=0.95, score_atol=1e-3)
    elif name.startswith("model/pic_"):
        _assert_item_sets_overlap(expected["per_user_items"], actual["per_user_items"], min_overlap=0.85)
    elif name.startswith("metric/"):
        _assert_close(expected, actual, name, atol=1e-9, rtol=1e-9)
    else:
        _assert_close(expected, actual, name, atol=1e-4, rtol=1e-4)


def test_fixture_registry_in_sync():
    """Every frozen case still exists in the registry and vice versa."""
    assert sorted(FROZEN) == sorted(CASES)
