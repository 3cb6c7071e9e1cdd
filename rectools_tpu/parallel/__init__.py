from . import distributed
from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    data_sharded,
    default_mesh,
    make_mesh,
    model_sharded,
    pad_to_multiple,
    replicated,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "data_sharded",
    "default_mesh",
    "distributed",
    "make_mesh",
    "model_sharded",
    "pad_to_multiple",
    "replicated",
]
