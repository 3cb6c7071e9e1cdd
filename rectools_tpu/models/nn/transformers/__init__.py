from .backbone import TransformerBackbone, TransformerBackboneBase
from .base import TransformerModelBase, TransformerModelConfig
from .callbacks import BestStateKeeper, EarlyStopping, TrainingCallback
from .bert4rec import BERT4RecDataPreparator, BERT4RecModel, BERT4RecModelConfig
from .constants import MASKING_VALUE, PADDING_VALUE
from .data_preparator import BatchLoader, SequenceDataset, TransformerDataPreparatorBase
from .negative_sampler import CatalogUniformSampler, TransformerNegativeSamplerBase
from .net_blocks import (
    LearnableInversePositionalEncoding,
    MultiHeadAttention,
    PointWiseFeedForward,
    PositionalEncodingBase,
    PreLNTransformerLayer,
    PreLNTransformerLayers,
    SwigluFeedForward,
    TransformerLayersBase,
    init_feed_forward,
)
from .hstu import HSTUModel, HSTUModelConfig, RelativeAttentionBias, STULayer, STULayers
from .ligr import LiGRLayer, LiGRLayers
from .sasrec import SASRecDataPreparator, SASRecModel, SASRecModelConfig, SASRecTransformerLayers
from .similarity import DistanceSimilarityModule, SimilarityModuleBase
from .training import TransformerTrainingModule, TransformerTrainingModuleBase
from .utils import leave_one_out_mask

__all__ = [
    "TransformerBackbone",
    "TrainingCallback",
    "EarlyStopping",
    "BestStateKeeper",
    "TransformerBackboneBase",
    "TransformerModelBase",
    "TransformerModelConfig",
    "BERT4RecDataPreparator",
    "BERT4RecModel",
    "BERT4RecModelConfig",
    "MASKING_VALUE",
    "PADDING_VALUE",
    "BatchLoader",
    "SequenceDataset",
    "TransformerDataPreparatorBase",
    "CatalogUniformSampler",
    "TransformerNegativeSamplerBase",
    "LearnableInversePositionalEncoding",
    "MultiHeadAttention",
    "PointWiseFeedForward",
    "PositionalEncodingBase",
    "PreLNTransformerLayer",
    "PreLNTransformerLayers",
    "SwigluFeedForward",
    "TransformerLayersBase",
    "init_feed_forward",
    "HSTUModel",
    "HSTUModelConfig",
    "RelativeAttentionBias",
    "STULayer",
    "STULayers",
    "LiGRLayer",
    "LiGRLayers",
    "SASRecDataPreparator",
    "SASRecModel",
    "SASRecModelConfig",
    "SASRecTransformerLayers",
    "DistanceSimilarityModule",
    "SimilarityModuleBase",
    "TransformerTrainingModule",
    "TransformerTrainingModuleBase",
    "leave_one_out_mask",
]
