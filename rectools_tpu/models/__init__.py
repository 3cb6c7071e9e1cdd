from .bpr import BPRModel, BPRModelConfig
from .item_knn import ItemKNNModel, ItemKNNModelConfig
from .base import FixedColdRecoModelMixin, ModelBase, ModelConfig
from .als import ALSModel, ALSModelConfig
from .ease import EASEModel, EASEModelConfig
from .popular import PopularModel, PopularModelConfig, Popularity
from .pure_svd import PureSVDModel, PureSVDModelConfig
from .random import RandomModel, RandomModelConfig
from .rank import Distance, Ranker, TPURanker
from .serialization import load_model, model_from_config, model_from_params
from .vector import Factors, VectorModel

__all__ = [
    "FixedColdRecoModelMixin",
    "ALSModel",
    "ALSModelConfig",
    "BPRModel",
    "BPRModelConfig",
    "ItemKNNModel",
    "ItemKNNModelConfig",
    "ModelBase",
    "ModelConfig",
    "EASEModel",
    "EASEModelConfig",
    "PopularModel",
    "PopularModelConfig",
    "Popularity",
    "PureSVDModel",
    "PureSVDModelConfig",
    "RandomModel",
    "RandomModelConfig",
    "Distance",
    "Ranker",
    "TPURanker",
    "load_model",
    "model_from_config",
    "model_from_params",
    "Factors",
    "VectorModel",
]
