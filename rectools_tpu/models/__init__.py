from .base import FixedColdRecoModelMixin, ModelBase, ModelConfig
from .als import ALSModel, ALSModelConfig
from .bpr import BPRModel, BPRModelConfig
from .ease import EASEModel, EASEModelConfig
from .hybrid_mf import HybridMFModel, HybridMFModelConfig
from .item_knn import ItemKNNModel, ItemKNNModelConfig
from .popular import PopularModel, PopularModelConfig, Popularity
from .popular_in_category import PopularInCategoryModel, PopularInCategoryModelConfig
from .pure_svd import PureSVDModel, PureSVDModelConfig
from .random import RandomModel, RandomModelConfig
from .rank import Distance, Ranker, TPURanker
from .serialization import load_model, model_from_config, model_from_params
from .vector import Factors, VectorModel
from .nn.dssm import DSSMModel, DSSMModelConfig
from .nn.transformers.sasrec import SASRecModel, SASRecModelConfig
from .nn.transformers.bert4rec import BERT4RecModel, BERT4RecModelConfig
from .nn.transformers.hstu import HSTUModel, HSTUModelConfig

# Aliases under the reference (RecTools) class names, for migrating users.
# The native solvers are first-class models here — the old wrapper names keep
# working as synonyms (see also compat.translate_reference_config for configs).
ImplicitALSWrapperModel = ALSModel
ImplicitBPRWrapperModel = BPRModel
ImplicitItemKNNWrapperModel = ItemKNNModel
LightFMWrapperModel = HybridMFModel

__all__ = [
    "ImplicitALSWrapperModel",
    "ImplicitBPRWrapperModel",
    "ImplicitItemKNNWrapperModel",
    "LightFMWrapperModel",
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
    "HybridMFModel",
    "HybridMFModelConfig",
    "PopularModel",
    "PopularInCategoryModel",
    "PopularInCategoryModelConfig",
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
    "DSSMModel",
    "DSSMModelConfig",
    "SASRecModel",
    "SASRecModelConfig",
    "BERT4RecModel",
    "BERT4RecModelConfig",
    "HSTUModel",
    "HSTUModelConfig",
]
