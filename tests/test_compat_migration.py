"""Migration layer for users coming from the reference library: class-name
aliases and reference-config translation (compat.translate_reference_config)."""

import warnings

import pytest

from rectools_tpu import models
from rectools_tpu.compat import translate_reference_config
from rectools_tpu.models import model_from_config

from tests.models.data import DATASET


class TestReferenceClassAliases:
    def test_wrapper_names_are_aliases(self) -> None:
        assert models.ImplicitALSWrapperModel is models.ALSModel
        assert models.ImplicitBPRWrapperModel is models.BPRModel
        assert models.ImplicitItemKNNWrapperModel is models.ItemKNNModel
        assert models.LightFMWrapperModel is models.HybridMFModel

    @pytest.mark.parametrize(
        "spec,expected",
        [
            ("ImplicitALSWrapperModel", models.ALSModel),
            ("rectools.models.implicit_als.ImplicitALSWrapperModel", models.ALSModel),
            ("rectools.models.ease.EASEModel", models.EASEModel),
            ("rectools.models.PopularModel", models.PopularModel),
            ("rectools.models.nn.transformers.sasrec.SASRecModel", models.SASRecModel),
        ],
    )
    def test_model_from_config_accepts_reference_cls(self, spec: str, expected: type) -> None:
        model = model_from_config({"cls": spec})
        assert type(model) is expected

    def test_alias_config_roundtrip_uses_native_name(self) -> None:
        model = model_from_config({"cls": "ImplicitBPRWrapperModel", "factors": 16})
        assert model.get_config(simple_types=True)["cls"] == "BPRModel"


class TestTranslateReferenceConfig:
    def test_als_nested_model_flattened(self) -> None:
        ref = {
            "cls": "ImplicitALSWrapperModel",
            "model": {
                "factors": 32,
                "regularization": 0.1,
                "alpha": 5.0,
                "iterations": 3,
                "random_state": 7,
                "num_threads": 8,
                "use_gpu": True,
            },
            "fit_features_together": True,
            "recommend_n_threads": 4,
        }
        with pytest.warns(UserWarning, match="num_threads.*recommend_n_threads.*use_gpu"):
            cfg = translate_reference_config(ref)
        assert cfg["cls"] == "ALSModel"
        assert cfg["factors"] == 32
        assert cfg["regularization"] == 0.1
        assert cfg["alpha"] == 5.0
        assert cfg["iterations"] == 3
        assert cfg["random_state"] == 7
        assert cfg["fit_features_together"] is True
        assert "num_threads" not in cfg and "use_gpu" not in cfg

    def test_knn_inner_cls_becomes_variant(self) -> None:
        ref = {
            "cls": "ImplicitItemKNNWrapperModel",
            "model": {"cls": "BM25Recommender", "K": 20, "K1": 1.2, "B": 0.75},
        }
        cfg = translate_reference_config(ref)
        assert cfg == {"cls": "ItemKNNModel", "variant": "bm25", "K": 20, "K1": 1.2, "B": 0.75}

    def test_knn_default_inner_cls_is_plain(self) -> None:
        cfg = translate_reference_config({"cls": "ImplicitItemKNNWrapperModel", "model": {"K": 5}})
        assert cfg == {"cls": "ItemKNNModel", "K": 5}

    def test_lightfm_outer_epochs_and_none_random_state(self) -> None:
        ref = {
            "cls": "LightFMWrapperModel",
            "model": {"no_components": 8, "loss": "warp", "random_state": None},
            "epochs": 2,
            "num_threads": 3,
        }
        with pytest.warns(UserWarning, match="num_threads"):
            cfg = translate_reference_config(ref)
        assert cfg["cls"] == "HybridMFModel"
        assert cfg["no_components"] == 8
        assert cfg["loss"] == "warp"
        assert cfg["epochs"] == 2
        assert "random_state" not in cfg

    def test_missing_cls_raises(self) -> None:
        with pytest.raises(ValueError, match="`cls` must be present"):
            translate_reference_config({"model": {"factors": 4}})

    def test_translated_config_fits_and_recommends(self) -> None:
        ref = {
            "cls": "ImplicitALSWrapperModel",
            "model": {"factors": 4, "iterations": 2, "random_state": 1},
        }
        model = model_from_config(translate_reference_config(ref))
        model.fit(DATASET)
        reco = model.recommend(users=[10, 20], dataset=DATASET, k=2, filter_viewed=True)
        assert len(reco) == 4
        assert set(reco["user_id"]) == {10, 20}
