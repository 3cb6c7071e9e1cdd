"""rectools-tpu: a TPU-native recommender-system framework.

Same capabilities as the RecTools reference library (Dataset -> fit ->
recommend contract, 13 model families, metrics, splitters, two-stage
ranking), re-designed TPU-first: XLA/Pallas compute, SPMD sharding over
jax device meshes, functional training loops.
"""

from .columns import Columns
from .exceptions import NotFittedError, NotFittedForStageError
from .types import AnyIds, AnySequence, ExternalId, ExternalIds, InternalId, InternalIds

__version__ = "0.1.0"

__all__ = [
    "AnyIds",
    "AnySequence",
    "Columns",
    "NotFittedError",
    "NotFittedForStageError",
    "ExternalId",
    "ExternalIds",
    "InternalId",
    "InternalIds",
    "__version__",
]
