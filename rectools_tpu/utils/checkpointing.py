"""Orbax-backed checkpoint directories for sharded training state.

The pickle path (`model.save`) gathers arrays to host — fine up to a few GB.
For very large sharded parameter trees, orbax writes each shard from its
device and restores directly onto a mesh (the SURVEY.md §5 "orbax-style
checkpoint of sharded arrays + dataset schema JSON" plan).
"""

import json
import typing as tp
from pathlib import Path

import numpy as np

try:  # pragma: no cover - import guard
    import orbax.checkpoint as ocp

    HAS_ORBAX = True
except ImportError:  # pragma: no cover
    HAS_ORBAX = False


def save_training_checkpoint(directory: tp.Union[str, Path], model: tp.Any) -> None:
    """Write a fitted transformer model's state as an orbax checkpoint dir:
    sharded arrays under ``state/``, JSON metadata alongside."""
    if not HAS_ORBAX:  # pragma: no cover
        raise ImportError("orbax-checkpoint is required for directory checkpoints")
    if not model.is_fitted:
        raise RuntimeError("Only fitted models can be checkpointed")
    directory = Path(directory).absolute()
    directory.mkdir(parents=True, exist_ok=True)

    module = model.training_module
    state = module.get_state()
    arrays = {"params": module.params, "opt_state": module.opt_state}
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(directory / "state", arrays, force=True)

    meta = {
        "model_config": module.model_config,
        "dataset_schema": module.dataset_schema,
        "item_external_ids": np.asarray(module.item_external_ids).tolist(),
        "item_external_ids_dtype": str(np.asarray(module.item_external_ids).dtype),
        "counters": {
            "epochs_completed": state["epochs_completed"],
            "global_step": state["global_step"],
            "train_loss_history": state["train_loss_history"],
            "val_loss_history": state["val_loss_history"],
        },
        "item_net_buffers": {
            str(i): {k: v.tolist() for k, v in bufs.items()}
            for i, bufs in model._collect_item_net_buffers(module.backbone.item_model).items()
        },
        "model_class": f"{model.__class__.__module__}.{model.__class__.__qualname__}",
    }
    (directory / "meta.json").write_text(json.dumps(meta))


def load_training_checkpoint(directory: tp.Union[str, Path], model_cls: tp.Optional[type] = None) -> tp.Any:
    """Rebuild a fitted model from an orbax checkpoint directory."""
    if not HAS_ORBAX:  # pragma: no cover
        raise ImportError("orbax-checkpoint is required for directory checkpoints")
    directory = Path(directory).absolute()
    meta = json.loads((directory / "meta.json").read_text())

    if model_cls is None:
        from .misc import import_object

        model_cls = import_object(meta["model_class"])

    ids_dtype = meta.get("item_external_ids_dtype", "object")
    if ids_dtype == "object":
        item_external_ids = np.asarray(meta["item_external_ids"], dtype=object)
    else:
        item_external_ids = np.asarray(meta["item_external_ids"]).astype(ids_dtype)
    checkpoint = {
        "model_config": meta["model_config"],
        "dataset_schema": meta["dataset_schema"],
        "item_external_ids": item_external_ids,
        "item_net_buffers": {
            int(i): {k: np.asarray(v, dtype=np.int32) for k, v in bufs.items()}
            for i, bufs in meta.get("item_net_buffers", {}).items()
        },
        "state": None,  # filled below
    }

    # build the model skeleton to learn the state tree structure
    loaded = model_cls.from_config(meta["model_config"])
    loaded.is_fitted = True
    from ..dataset import IdMap
    from ..dataset.dataset import DatasetSchema

    loaded.data_preparator.item_id_map = IdMap(checkpoint["item_external_ids"])
    loaded.data_preparator._init_extra_token_ids()  # pylint: disable=protected-access
    dataset_schema = DatasetSchema.model_validate(meta["dataset_schema"])
    item_model = loaded._construct_item_net_from_dataset_schema(dataset_schema)
    if checkpoint["item_net_buffers"]:
        new_blocks = list(item_model.item_net_blocks)
        for i, bufs in checkpoint["item_net_buffers"].items():
            new_blocks[i] = new_blocks[i].clone(
                feature_rows=bufs["feature_rows"], feature_cols=bufs["feature_cols"]
            )
        item_model = item_model.clone(item_net_blocks=tuple(new_blocks))
    backbone = loaded._init_backbone(item_model)
    loaded._init_training_module(
        backbone=backbone,
        dataset_schema=meta["dataset_schema"],
        item_external_ids=checkpoint["item_external_ids"],
        model_config=meta["model_config"],
    )
    module = loaded.training_module
    module.init_params(loaded._make_dummy_batch())

    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(
            directory / "state", {"params": module.params, "opt_state": module.opt_state}
        )
    module.params = restored["params"]
    module.opt_state = restored["opt_state"]
    counters = meta["counters"]
    module.epochs_completed = counters["epochs_completed"]
    module.global_step = counters["global_step"]
    module.train_loss_history = list(counters["train_loss_history"])
    module.val_loss_history = list(counters["val_loss_history"])
    module.is_fitted = True
    return loaded
