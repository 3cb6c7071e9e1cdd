"""TransformerModelBase: wires preparator, item net, backbone, training module
from swappable component types; owns fit / fit_partial / recommend / checkpoint.

Behavioral parity with reference rectools/models/nn/transformers/base.py:189-725,
with the execution substrate replaced: pytorch-lightning Trainer -> jit-compiled
optax train loop (training.py); torch backbone -> flax backbone (backbone.py).
Torch-specific knobs (``recommend_torch_device``, ``recommend_n_threads``) have
no TPU counterpart and are dropped; a ``seed`` field (absent in the reference,
which relies on external ``seed_everything``) makes fits reproducible.
"""

import typing as tp
from collections.abc import Callable

import numpy as np
import pandas as pd
import typing_extensions as tpe
from pydantic import BeforeValidator, PlainSerializer

from ....dataset.dataset import Dataset, DatasetSchema, DatasetSchemaDict
from ....types import ExternalIds
from ....utils.misc import get_class_or_function_full_path, import_object, make_dict_flat, unflatten_dict
from ....utils.serialization import FileLike, read_bytes
from ...base import ErrorBehaviour, InternalRecoTriplet, ModelBase, ModelConfig
from ..item_net import (
    CatFeaturesItemNet,
    IdEmbeddingsItemNet,
    ItemNetBase,
    ItemNetConstructorBase,
    SumOfEmbeddingsConstructor,
)
from .backbone import TransformerBackbone, TransformerBackboneBase
from .data_preparator import Batch, InitKwargs, TransformerDataPreparatorBase
from .losses import requires_negatives
from .negative_sampler import CatalogUniformSampler, TransformerNegativeSamplerBase
from .net_blocks import (
    LearnableInversePositionalEncoding,
    PositionalEncodingBase,
    PreLNTransformerLayers,
    TransformerLayersBase,
)
from .similarity import DistanceSimilarityModule, SimilarityModuleBase
from .training import TransformerTrainingModule, TransformerTrainingModuleBase

# ---------------------------------------------------------------- config types


def _get_class_obj(spec: tp.Any) -> tp.Any:
    if not isinstance(spec, str):
        return spec
    return import_object(spec)


def _get_class_obj_sequence(spec: tp.Sequence[tp.Any]) -> tp.Tuple[tp.Any, ...]:
    return tuple(map(_get_class_obj, spec))


def _serialize_type_sequence(obj: tp.Sequence[tp.Type]) -> tp.Tuple[str, ...]:
    return tuple(map(get_class_or_function_full_path, obj))


def _class_path_annotated(base: tp.Any) -> tp.Any:
    return tpe.Annotated[
        tp.Type[base],
        BeforeValidator(_get_class_obj),
        PlainSerializer(func=get_class_or_function_full_path, return_type=str, when_used="json"),
    ]


PositionalEncodingType = _class_path_annotated(PositionalEncodingBase)
TransformerLayersType = _class_path_annotated(TransformerLayersBase)
TransformerTrainingModuleType = _class_path_annotated(TransformerTrainingModuleBase)
SimilarityModuleType = _class_path_annotated(SimilarityModuleBase)
TransformerBackboneType = _class_path_annotated(TransformerBackboneBase)
TransformerDataPreparatorType = _class_path_annotated(TransformerDataPreparatorBase)
TransformerNegativeSamplerType = _class_path_annotated(TransformerNegativeSamplerBase)
ItemNetConstructorType = _class_path_annotated(ItemNetConstructorBase)

ItemNetBlockTypes = tpe.Annotated[
    tp.Sequence[tp.Type[ItemNetBase]],
    BeforeValidator(_get_class_obj_sequence),
    PlainSerializer(func=_serialize_type_sequence, return_type=tp.Tuple[str, ...], when_used="json"),
]

ValMaskCallable = Callable[..., np.ndarray]
ValMaskCallableSerialized = tpe.Annotated[
    ValMaskCallable,
    BeforeValidator(_get_class_obj),
    PlainSerializer(func=get_class_or_function_full_path, return_type=str, when_used="json"),
]

# Factory returning fresh training callbacks for each fit — the reference's
# `get_trainer_func` pattern (its transformers/base.py:367-380): a function,
# serialized as an import path, so stateful callback instances never leak
# between fits or into the config.
CallbacksCallable = Callable[[], tp.Sequence[tp.Any]]
CallbacksCallableSerialized = tpe.Annotated[
    CallbacksCallable,
    BeforeValidator(_get_class_obj),
    PlainSerializer(func=get_class_or_function_full_path, return_type=str, when_used="json"),
]


class TransformerModelConfig(ModelConfig):
    """Transformer model base config (reference transformers/base.py:189-232)."""

    data_preparator_type: TransformerDataPreparatorType
    n_blocks: int = 2
    n_heads: int = 4
    n_factors: int = 256
    use_pos_emb: bool = True
    use_causal_attn: bool = False
    use_key_padding_mask: bool = False
    dropout_rate: float = 0.2
    session_max_len: int = 100
    batch_size: int = 128
    loss: str = "softmax"
    n_negatives: int = 1
    gbce_t: float = 0.2
    lr: float = 0.001
    epochs: int = 3
    deterministic: bool = False
    seed: int = 0
    recommend_batch_size: tp.Optional[int] = None
    train_min_user_interactions: int = 2
    item_net_block_types: ItemNetBlockTypes = (IdEmbeddingsItemNet, CatFeaturesItemNet)
    item_net_constructor_type: ItemNetConstructorType = SumOfEmbeddingsConstructor
    pos_encoding_type: PositionalEncodingType = LearnableInversePositionalEncoding
    transformer_layers_type: TransformerLayersType = PreLNTransformerLayers
    training_module_type: TransformerTrainingModuleType = TransformerTrainingModule
    negative_sampler_type: TransformerNegativeSamplerType = CatalogUniformSampler
    similarity_module_type: SimilarityModuleType = DistanceSimilarityModule
    backbone_type: TransformerBackboneType = TransformerBackbone
    get_val_mask_func: tp.Optional[ValMaskCallableSerialized] = None
    get_val_mask_func_kwargs: tp.Optional[InitKwargs] = None
    get_callbacks_func: tp.Optional[CallbacksCallableSerialized] = None
    data_preparator_kwargs: tp.Optional[InitKwargs] = None
    transformer_layers_kwargs: tp.Optional[InitKwargs] = None
    item_net_constructor_kwargs: tp.Optional[InitKwargs] = None
    pos_encoding_kwargs: tp.Optional[InitKwargs] = None
    training_module_kwargs: tp.Optional[InitKwargs] = None
    negative_sampler_kwargs: tp.Optional[InitKwargs] = None
    similarity_module_kwargs: tp.Optional[InitKwargs] = None
    backbone_kwargs: tp.Optional[InitKwargs] = None


TransformerModelConfig_T = tp.TypeVar("TransformerModelConfig_T", bound=TransformerModelConfig)


class TransformerModelBase(ModelBase[TransformerModelConfig_T]):
    """Base class for transformer sequential recommenders."""

    config_class: tp.Type[TransformerModelConfig_T]
    train_loss_name: str = "train_loss"
    val_loss_name: str = "val_loss"

    def __init__(
        self,
        data_preparator_type: tp.Type[TransformerDataPreparatorBase],
        transformer_layers_type: tp.Type[TransformerLayersBase] = PreLNTransformerLayers,
        n_blocks: int = 2,
        n_heads: int = 4,
        n_factors: int = 256,
        use_pos_emb: bool = True,
        use_causal_attn: bool = False,
        use_key_padding_mask: bool = False,
        dropout_rate: float = 0.2,
        session_max_len: int = 100,
        batch_size: int = 128,
        loss: str = "softmax",
        n_negatives: int = 1,
        gbce_t: float = 0.2,
        lr: float = 0.001,
        epochs: int = 3,
        verbose: int = 0,
        deterministic: bool = False,
        seed: int = 0,
        recommend_batch_size: tp.Optional[int] = None,
        train_min_user_interactions: int = 2,
        item_net_block_types: tp.Sequence[tp.Type[ItemNetBase]] = (IdEmbeddingsItemNet, CatFeaturesItemNet),
        item_net_constructor_type: tp.Type[ItemNetConstructorBase] = SumOfEmbeddingsConstructor,
        pos_encoding_type: tp.Type[PositionalEncodingBase] = LearnableInversePositionalEncoding,
        training_module_type: tp.Type[TransformerTrainingModuleBase] = TransformerTrainingModule,
        negative_sampler_type: tp.Type[TransformerNegativeSamplerBase] = CatalogUniformSampler,
        similarity_module_type: tp.Type[SimilarityModuleBase] = DistanceSimilarityModule,
        backbone_type: tp.Type[TransformerBackboneBase] = TransformerBackbone,
        get_val_mask_func: tp.Optional[ValMaskCallable] = None,
        get_val_mask_func_kwargs: tp.Optional[InitKwargs] = None,
        get_callbacks_func: tp.Optional[CallbacksCallable] = None,
        data_preparator_kwargs: tp.Optional[InitKwargs] = None,
        transformer_layers_kwargs: tp.Optional[InitKwargs] = None,
        item_net_constructor_kwargs: tp.Optional[InitKwargs] = None,
        pos_encoding_kwargs: tp.Optional[InitKwargs] = None,
        training_module_kwargs: tp.Optional[InitKwargs] = None,
        negative_sampler_kwargs: tp.Optional[InitKwargs] = None,
        similarity_module_kwargs: tp.Optional[InitKwargs] = None,
        backbone_kwargs: tp.Optional[InitKwargs] = None,
        **kwargs: tp.Any,
    ) -> None:
        super().__init__(verbose=verbose)
        self.data_preparator_type = data_preparator_type
        self.transformer_layers_type = transformer_layers_type
        self.n_blocks = n_blocks
        self.n_heads = n_heads
        self.n_factors = n_factors
        self.use_pos_emb = use_pos_emb
        self.use_causal_attn = use_causal_attn
        self.use_key_padding_mask = use_key_padding_mask
        self.dropout_rate = dropout_rate
        self.session_max_len = session_max_len
        self.batch_size = batch_size
        self.loss = loss
        self.n_negatives = n_negatives
        self.gbce_t = gbce_t
        self.lr = lr
        self.epochs = epochs
        self.deterministic = deterministic
        self.seed = seed
        self.recommend_batch_size = recommend_batch_size
        self.train_min_user_interactions = train_min_user_interactions
        self.item_net_block_types = item_net_block_types
        self.item_net_constructor_type = item_net_constructor_type
        self.pos_encoding_type = pos_encoding_type
        self.training_module_type = training_module_type
        self.negative_sampler_type = negative_sampler_type
        self.similarity_module_type = similarity_module_type
        self.backbone_type = backbone_type
        self.get_val_mask_func = get_val_mask_func
        self.get_val_mask_func_kwargs = get_val_mask_func_kwargs
        self.get_callbacks_func = get_callbacks_func
        self.data_preparator_kwargs = data_preparator_kwargs
        self.transformer_layers_kwargs = transformer_layers_kwargs
        self.item_net_constructor_kwargs = item_net_constructor_kwargs
        self.pos_encoding_kwargs = pos_encoding_kwargs
        self.training_module_kwargs = training_module_kwargs
        self.negative_sampler_kwargs = negative_sampler_kwargs
        self.similarity_module_kwargs = similarity_module_kwargs
        self.backbone_kwargs = backbone_kwargs

        self._init_data_preparator()

        self.training_module: TransformerTrainingModuleBase
        self.data_preparator: TransformerDataPreparatorBase

    # ------------------------------------------------------------ construction

    @staticmethod
    def _get_kwargs(actual_kwargs: tp.Optional[InitKwargs]) -> InitKwargs:
        return actual_kwargs if actual_kwargs is not None else {}

    def _init_data_preparator(self) -> None:
        needs_negatives = requires_negatives(self.loss)
        self.data_preparator = self.data_preparator_type(
            session_max_len=self.session_max_len,
            batch_size=self.batch_size,
            dataloader_num_workers=0,
            train_min_user_interactions=self.train_min_user_interactions,
            negative_sampler=self._init_negative_sampler() if needs_negatives else None,
            n_negatives=self.n_negatives if needs_negatives else None,
            get_val_mask_func=self.get_val_mask_func,
            get_val_mask_func_kwargs=self.get_val_mask_func_kwargs,
            **self._get_kwargs(self.data_preparator_kwargs),
        )

    def _init_negative_sampler(self) -> TransformerNegativeSamplerBase:
        return self.negative_sampler_type(
            n_negatives=self.n_negatives, **self._get_kwargs(self.negative_sampler_kwargs)
        )

    def _construct_item_net(self, dataset: Dataset) -> ItemNetBase:
        return self.item_net_constructor_type.from_dataset(
            dataset,
            self.n_factors,
            self.dropout_rate,
            self.item_net_block_types,
            **self._get_kwargs(self.item_net_constructor_kwargs),
        )

    def _construct_item_net_from_dataset_schema(self, dataset_schema: DatasetSchema) -> ItemNetBase:
        return self.item_net_constructor_type.from_dataset_schema(
            dataset_schema,
            self.n_factors,
            self.dropout_rate,
            self.item_net_block_types,
            **self._get_kwargs(self.item_net_constructor_kwargs),
        )

    def _init_pos_encoding_layer(self) -> PositionalEncodingBase:
        return self.pos_encoding_type(
            self.use_pos_emb,
            self.session_max_len,
            self.n_factors,
            **self._get_kwargs(self.pos_encoding_kwargs),
        )

    def _init_transformer_layers(self) -> TransformerLayersBase:
        return self.transformer_layers_type(
            n_blocks=self.n_blocks,
            n_factors=self.n_factors,
            n_heads=self.n_heads,
            dropout_rate=self.dropout_rate,
            **self._get_kwargs(self.transformer_layers_kwargs),
        )

    def _init_similarity_module(self) -> SimilarityModuleBase:
        return self.similarity_module_type(**self._get_kwargs(self.similarity_module_kwargs))

    def _init_backbone(self, item_model: ItemNetBase) -> TransformerBackboneBase:
        return self.backbone_type(
            item_model=item_model,
            pos_encoding_layer=self._init_pos_encoding_layer(),
            transformer_layers=self._init_transformer_layers(),
            similarity_module=self._init_similarity_module(),
            n_heads=self.n_heads,
            dropout_rate=self.dropout_rate,
            use_causal_attn=self.use_causal_attn,
            use_key_padding_mask=self.use_key_padding_mask,
            **self._get_kwargs(self.backbone_kwargs),
        )

    def _init_training_module(
        self,
        backbone: TransformerBackboneBase,
        dataset_schema: DatasetSchemaDict,
        item_external_ids: ExternalIds,
        model_config: tp.Dict[str, tp.Any],
    ) -> None:
        self.training_module = self.training_module_type(
            backbone=backbone,
            dataset_schema=dataset_schema,
            item_external_ids=item_external_ids,
            item_extra_tokens=self.data_preparator.item_extra_tokens,
            data_preparator=self.data_preparator,
            model_config=model_config,
            lr=self.lr,
            loss=self.loss,
            gbce_t=self.gbce_t,
            verbose=self.verbose,
            train_loss_name=self.train_loss_name,
            val_loss_name=self.val_loss_name,
            adam_betas=(0.9, 0.98),
            seed=self.seed,
            **self._training_module_extra_kwargs(),
        )

    def _training_module_extra_kwargs(self) -> InitKwargs:
        kwargs = dict(self._get_kwargs(self.training_module_kwargs))
        if self.get_callbacks_func is not None and "callbacks" not in kwargs:
            kwargs["callbacks"] = self.get_callbacks_func()  # fresh instances per fit
        return kwargs

    def _build_model_from_dataset(self, dataset: Dataset) -> None:
        self.data_preparator.process_dataset_train(dataset)
        item_model = self._construct_item_net(self.data_preparator.train_dataset)
        backbone = self._init_backbone(item_model)
        dataset_schema = self.data_preparator.train_dataset.get_schema()
        item_external_ids = self.data_preparator.train_dataset.item_id_map.external_ids
        model_config = self.get_config(simple_types=True)
        self._init_training_module(
            backbone=backbone,
            dataset_schema=dataset_schema,
            item_external_ids=item_external_ids,
            model_config=model_config,
        )

    # -------------------------------------------------------------------- fit

    def _fit(self, dataset: Dataset) -> None:
        self._build_model_from_dataset(dataset)
        self.training_module.fit(
            train_loader_factory=self.data_preparator.get_dataloader_train,
            val_loader_factory=self.data_preparator.get_dataloader_val,
            max_epochs=self.epochs,
        )

    def _fit_partial(
        self, dataset: Dataset, min_epochs: tp.Optional[int] = None, max_epochs: tp.Optional[int] = None
    ) -> None:
        """Continue training for `max_epochs` additional epochs
        (reference transformers/base.py:505-533)."""
        if max_epochs is None:
            max_epochs = self.epochs
        if not self.is_fitted:
            self._build_model_from_dataset(dataset)
        else:
            # Same dataset expected (id map/feature continuity), as in reference.
            self.data_preparator.process_dataset_train(dataset)
        self.training_module.fit(
            train_loader_factory=self.data_preparator.get_dataloader_train,
            val_loader_factory=self.data_preparator.get_dataloader_val,
            max_epochs=max_epochs,
        )

    # --------------------------------------------------------------- recommend

    def _custom_transform_dataset_u2i(
        self,
        dataset: Dataset,
        users: ExternalIds,
        on_unsupported_targets: ErrorBehaviour,
        context: tp.Optional[pd.DataFrame] = None,
    ) -> Dataset:
        return self.data_preparator.transform_dataset_u2i(dataset, users, context)

    def _custom_transform_dataset_i2i(
        self, dataset: Dataset, target_items: ExternalIds, on_unsupported_targets: ErrorBehaviour
    ) -> Dataset:
        return self.data_preparator.transform_dataset_i2i(dataset)

    def _effective_recommend_batch_size(self) -> int:
        """Serving batch size: explicit value, or auto-scaled to the device.

        TPU serving throughput keeps climbing well past host-friendly batch
        sizes (measured: 512 -> 5.3k QPS vs 8192 -> 27k QPS on the top-k
        engine), so `None` (the default) targets a fixed session-activation
        budget instead of a small constant: batch * session_max_len *
        n_factors * 4 bytes ~ 256 MB, clamped to [512, 8192] and rounded down
        to a power of two (power-of-two batches keep jit cache reuse across
        calls)."""
        if self.recommend_batch_size is not None:
            return self.recommend_batch_size
        act_budget = 256 << 20
        per_row_act = max(1, self.session_max_len * self.n_factors * 4)
        # the encode pass's attention scores are O(H * L^2) PER ROW on the
        # XLA path (~2 live score tensors); without this term the auto batch
        # explodes memory at long session_max_len (L >= 512)
        score_budget = 2 << 30
        per_row_scores = self.n_heads * self.session_max_len**2 * 4 * 2
        raw = min(act_budget // per_row_act, score_budget // max(1, per_row_scores))
        clamped = max(64, min(8192, int(raw)))
        return 1 << (clamped.bit_length() - 1)

    def _recommend_u2i(
        self,
        user_ids: np.ndarray,
        dataset: Dataset,
        k: int,
        filter_viewed: bool,
        sorted_item_ids_to_recommend: tp.Optional[np.ndarray],
    ) -> InternalRecoTriplet:
        if sorted_item_ids_to_recommend is None:
            sorted_item_ids_to_recommend = self.data_preparator.get_known_items_sorted_internal_ids()
        recommend_loader = self.data_preparator.get_dataloader_recommend(
            dataset, self._effective_recommend_batch_size()
        )
        return self.training_module.recommend_u2i(
            user_ids=user_ids,
            recommend_loader=recommend_loader,
            sorted_item_ids_to_recommend=sorted_item_ids_to_recommend,
            k=k,
            dataset=dataset,
            filter_viewed=filter_viewed,
        )

    def _recommend_i2i(
        self,
        target_ids: np.ndarray,
        dataset: Dataset,
        k: int,
        sorted_item_ids_to_recommend: tp.Optional[np.ndarray],
    ) -> InternalRecoTriplet:
        if sorted_item_ids_to_recommend is None:
            sorted_item_ids_to_recommend = self.data_preparator.get_known_items_sorted_internal_ids()
        return self.training_module.recommend_i2i(
            target_ids=target_ids,
            sorted_item_ids_to_recommend=sorted_item_ids_to_recommend,
            k=k,
        )

    # ------------------------------------------------------------------ config

    @classmethod
    def _from_config(cls, config: TransformerModelConfig_T) -> tpe.Self:
        params = config.model_dump()
        params.pop("cls")
        return cls(**params)

    def _get_config(self) -> TransformerModelConfig_T:
        attrs = self.config_class.model_json_schema(mode="serialization")["properties"].keys()
        params = {attr: getattr(self, attr) for attr in attrs if attr != "cls"}
        params["cls"] = self.__class__
        return self.config_class(**params)

    # ------------------------------------------------------------- checkpoints

    def _make_dummy_batch(self) -> Batch:
        """Minimal fixed-shape batch used to rebuild parameter tree structure
        on checkpoint restore."""
        l = self.session_max_len
        batch: Batch = {
            "x": np.zeros((1, l), dtype=np.int64),
            "y": np.zeros((1, l), dtype=np.int64),
            "yw": np.zeros((1, l), dtype=np.float32),
        }
        if requires_negatives(self.loss):
            batch["negatives"] = np.zeros((1, l, self.n_negatives), dtype=np.int64)
        if getattr(self.data_preparator, "add_unix_ts", False):
            batch["unix_ts"] = np.zeros((1, l + 1), dtype=np.int64)
        return batch

    @staticmethod
    def _collect_item_net_buffers(item_model: ItemNetBase) -> tp.Dict[int, tp.Dict[str, np.ndarray]]:
        """Non-parameter buffers of item-net blocks (e.g. CatFeaturesItemNet's
        CSR coordinates) that must survive checkpointing — the torch reference
        registers these as module buffers (item_net.py:96-98)."""
        buffers: tp.Dict[int, tp.Dict[str, np.ndarray]] = {}
        for i, block in enumerate(getattr(item_model, "item_net_blocks", ())):
            if hasattr(block, "feature_rows"):
                buffers[i] = {
                    "feature_rows": np.asarray(block.feature_rows),
                    "feature_cols": np.asarray(block.feature_cols),
                }
        return buffers

    def _checkpoint_dict(self) -> tp.Dict[str, tp.Any]:
        return {
            "model_config": self.training_module.model_config,
            "dataset_schema": self.training_module.dataset_schema,
            "item_external_ids": np.asarray(self.training_module.item_external_ids),
            "item_net_buffers": self._collect_item_net_buffers(self.training_module.backbone.item_model),
            "state": self.training_module.get_state(),
        }

    @classmethod
    def _model_from_checkpoint(cls, checkpoint: tp.Dict[str, tp.Any]) -> tpe.Self:
        """Rebuild a fitted model from a checkpoint dict
        (reference transformers/base.py:591-654)."""
        model_config = checkpoint["model_config"]
        loaded = cls.from_config(model_config)
        loaded.is_fitted = True
        dataset_schema = DatasetSchema.model_validate(checkpoint["dataset_schema"])

        from ....dataset import IdMap

        item_external_ids = checkpoint["item_external_ids"]
        loaded.data_preparator.item_id_map = IdMap(item_external_ids)
        loaded.data_preparator._init_extra_token_ids()  # pylint: disable=protected-access

        item_model = loaded._construct_item_net_from_dataset_schema(dataset_schema)
        item_net_buffers = checkpoint.get("item_net_buffers") or {}
        if item_net_buffers:
            new_blocks = list(item_model.item_net_blocks)
            for i, bufs in item_net_buffers.items():
                new_blocks[i] = new_blocks[i].clone(
                    feature_rows=bufs["feature_rows"], feature_cols=bufs["feature_cols"]
                )
            item_model = item_model.clone(item_net_blocks=tuple(new_blocks))
        backbone = loaded._init_backbone(item_model)
        loaded._init_training_module(
            backbone=backbone,
            dataset_schema=checkpoint["dataset_schema"],
            item_external_ids=item_external_ids,
            model_config=model_config,
        )
        loaded.training_module.set_state(checkpoint["state"], loaded._make_dummy_batch())
        return loaded

    def __getstate__(self) -> object:
        if self.is_fitted:
            return {"fitted_checkpoint": self._checkpoint_dict()}
        return {"model_config": self.get_config(simple_types=True)}

    def __setstate__(self, state: tp.Dict[str, tp.Any]) -> None:
        if "fitted_checkpoint" in state:
            loaded = self._model_from_checkpoint(state["fitted_checkpoint"])
        else:
            loaded = self.from_config(state["model_config"])
        self.__dict__.update(loaded.__dict__)

    def save_checkpoint(self, f: FileLike) -> int:
        """Write a standalone checkpoint file for a fitted model."""
        if not self.is_fitted:
            raise RuntimeError("Only fitted models can be checkpointed")
        return self.save(f)

    @classmethod
    def load_from_checkpoint(
        cls,
        checkpoint_path: FileLike,
        model_params_update: tp.Optional[tp.Dict[str, tp.Any]] = None,
    ) -> tpe.Self:
        """Load model from a checkpoint path with optional flat config surgery
        (reference transformers/base.py:678-710)."""
        import pickle

        data = read_bytes(checkpoint_path)
        loaded = pickle.loads(data)
        if not isinstance(loaded, cls):
            raise TypeError(f"Loaded object is not an instance of `{cls.__name__}`")
        if model_params_update:
            checkpoint = loaded._checkpoint_dict()
            prev_config_flatten = make_dict_flat(checkpoint["model_config"])
            prev_config_flatten.update(model_params_update)
            checkpoint["model_config"] = unflatten_dict(prev_config_flatten)
            loaded = cls._model_from_checkpoint(checkpoint)
        return loaded

    def load_weights_from_checkpoint(self, checkpoint_path: FileLike) -> None:
        """Load only parameters/optimizer state into this fitted model
        (reference transformers/base.py:712-725)."""
        if not hasattr(self, "training_module") or self.training_module is None:
            raise RuntimeError("Model weights cannot be loaded from checkpoint into unfitted model")
        import pickle

        loaded = pickle.loads(read_bytes(checkpoint_path))
        self.training_module.set_state(loaded.training_module.get_state(), self._make_dummy_batch())

    @property
    def backbone(self) -> TransformerBackboneBase:
        """The flax backbone module."""
        return self.training_module.backbone
