"""Conformance walk over EVERY concrete ModelBase subclass (pattern of
reference tests/models/test_serialization.py, which enforces config coverage
by walking the subclass tree): each public model must round-trip its config
through get_config / from_config, through the module-level factories
(model_from_config / model_from_params), and pickle unfitted."""

import pickle
import typing as tp

import pytest

import rectools_tpu.models.nn.dssm  # noqa: F401 — populate the subclass tree
import rectools_tpu.models.nn.transformers  # noqa: F401
from rectools_tpu.models import model_from_config, model_from_params
from rectools_tpu.models.base import ModelBase

from .utils import get_successors

ABSTRACT = {"VectorModel", "TransformerModelBase"}
# Composite model with live sub-model instances; excluded from the config
# conformance walk exactly like the reference excludes it
# (reference tests/models/test_serialization.py:64).
NO_CONFIG = {"CandidateRankingModel"}

CONCRETE_MODELS = [
    cls
    for cls in get_successors(ModelBase)
    # only the package's own models: other test modules define throwaway
    # ModelBase subclasses that join the tree when the whole suite runs
    if cls.__module__.startswith("rectools_tpu")
    and cls.__name__ not in ABSTRACT
    and cls.__name__ not in NO_CONFIG
]
MODEL_IDS = [cls.__name__ for cls in CONCRETE_MODELS]

# Models whose default ctor needs arguments.
REQUIRED_KWARGS: tp.Dict[str, tp.Dict[str, tp.Any]] = {
    "PopularInCategoryModel": {"category_feature": "genre"},
}


def make_default(cls: tp.Type[ModelBase]) -> ModelBase:
    return cls(**REQUIRED_KWARGS.get(cls.__name__, {}))


def test_walk_covers_the_model_zoo() -> None:
    names = set(MODEL_IDS)
    for expected in (
        "EASEModel", "PureSVDModel", "ALSModel", "BPRModel", "ItemKNNModel",
        "HybridMFModel", "PopularModel", "PopularInCategoryModel", "RandomModel",
        "DSSMModel", "SASRecModel", "BERT4RecModel", "HSTUModel",
    ):
        assert expected in names


@pytest.mark.parametrize("cls", CONCRETE_MODELS, ids=MODEL_IDS)
def test_every_model_has_a_config_class(cls) -> None:
    assert getattr(cls, "config_class", None) is not None


@pytest.mark.parametrize("cls", CONCRETE_MODELS, ids=MODEL_IDS)
def test_config_round_trip(cls) -> None:
    model = make_default(cls)
    config = model.get_config()
    again = cls.from_config(config)
    assert again.get_config() == config


@pytest.mark.parametrize("cls", CONCRETE_MODELS, ids=MODEL_IDS)
def test_simple_types_config_reaches_factory(cls) -> None:
    model = make_default(cls)
    config = model.get_config(simple_types=True)
    assert isinstance(config["cls"], str)
    rebuilt = model_from_config(config)
    assert type(rebuilt) is cls
    assert rebuilt.get_config() == model.get_config()


@pytest.mark.parametrize("cls", CONCRETE_MODELS, ids=MODEL_IDS)
def test_flat_params_reach_factory(cls) -> None:
    model = make_default(cls)
    params = model.get_params(simple_types=True)
    assert all(not isinstance(v, (dict,)) for v in params.values()), "params must be flat"
    rebuilt = model_from_params(params)
    assert type(rebuilt) is cls
    assert rebuilt.get_config() == model.get_config()


@pytest.mark.parametrize("cls", CONCRETE_MODELS, ids=MODEL_IDS)
def test_unfitted_model_pickles(cls) -> None:
    model = make_default(cls)
    recovered = pickle.loads(pickle.dumps(model))
    assert type(recovered) is cls
    assert recovered.get_config() == model.get_config()


def test_factory_requires_cls() -> None:
    with pytest.raises(ValueError):
        model_from_config({"verbose": 0})


def test_factory_rejects_unknown_class_path() -> None:
    with pytest.raises(Exception):
        model_from_config({"cls": "rectools_tpu.models.nope.NopeModel"})
