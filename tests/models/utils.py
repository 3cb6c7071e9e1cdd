"""Shared model contract helpers (pattern of reference tests/models/utils.py:31-138)."""

import io
import typing as tp

import numpy as np
import pandas as pd

from rectools_tpu.dataset import Dataset
from rectools_tpu.models.base import ModelBase


def assert_reco_equal(reco1: pd.DataFrame, reco2: pd.DataFrame) -> None:
    pd.testing.assert_frame_equal(
        reco1.reset_index(drop=True), reco2.reset_index(drop=True), atol=0.001
    )


def assert_second_fit_refits_model(
    model: ModelBase, dataset: Dataset, pre_fit_callback: tp.Optional[tp.Callable[[], None]] = None
) -> None:
    """fit -> fit must equal a fresh single fit."""
    if pre_fit_callback:
        pre_fit_callback()
    model_1 = model.from_config(model.get_config())
    if pre_fit_callback:
        pre_fit_callback()
    model_1.fit(dataset)

    if pre_fit_callback:
        pre_fit_callback()
    model_2 = model.from_config(model.get_config())
    if pre_fit_callback:
        pre_fit_callback()
    model_2.fit(dataset)
    if pre_fit_callback:
        pre_fit_callback()
    model_2.fit(dataset)

    users = dataset.user_id_map.external_ids
    k = dataset.item_id_map.size
    reco_1 = model_1.recommend(users, dataset, k, filter_viewed=False)
    reco_2 = model_2.recommend(users, dataset, k, filter_viewed=False)
    assert_reco_equal(reco_1, reco_2)


def assert_dumps_loads_do_not_change_model(model: ModelBase, dataset: Dataset) -> None:
    dumped = model.dumps()
    recovered = model.__class__.loads(dumped)
    users = dataset.user_id_map.external_ids
    original_reco = model.recommend(users, dataset, 2, filter_viewed=False)
    recovered_reco = recovered.recommend(users, dataset, 2, filter_viewed=False)
    assert_reco_equal(original_reco, recovered_reco)


def assert_save_load_do_not_change_model(model: ModelBase, dataset: Dataset, tmp_path) -> None:
    path = str(tmp_path / "model.pkl")
    model.save(path)
    recovered = model.__class__.load(path)
    users = dataset.user_id_map.external_ids
    assert_reco_equal(
        model.recommend(users, dataset, 2, filter_viewed=False),
        recovered.recommend(users, dataset, 2, filter_viewed=False),
    )


def assert_default_config_and_default_model_params_are_the_same(
    model: ModelBase, default_config: tp.Dict[str, tp.Any]
) -> None:
    model_from_config = model.from_config(default_config)
    assert model_from_config.get_config() == model.get_config()


def assert_get_config_and_from_config_compatibility(
    model_cls: tp.Type[ModelBase], dataset: Dataset, initial_config: tp.Dict[str, tp.Any]
) -> None:
    def get_reco(m: ModelBase) -> pd.DataFrame:
        return m.fit(dataset).recommend(dataset.user_id_map.external_ids, dataset, 2, filter_viewed=False)

    model_1 = model_cls.from_config(initial_config)
    reco_1 = get_reco(model_1)
    config_1 = model_1.get_config(simple_types=True)

    model_2 = model_cls.from_config(config_1)
    reco_2 = get_reco(model_2)
    config_2 = model_2.get_config(simple_types=True)

    assert config_1 == config_2
    assert_reco_equal(reco_1, reco_2)


def get_successors(cls: type) -> tp.List[type]:
    successors = []
    for subclass in cls.__subclasses__():
        successors.append(subclass)
        successors.extend(get_successors(subclass))
    return successors
