from .item_net import (
    CatFeaturesItemNet,
    IdEmbeddingsItemNet,
    ItemNetBase,
    ItemNetConstructorBase,
    SumOfEmbeddingsConstructor,
)

__all__ = [
    "CatFeaturesItemNet",
    "IdEmbeddingsItemNet",
    "ItemNetBase",
    "ItemNetConstructorBase",
    "SumOfEmbeddingsConstructor",
]
