from . import als, bpr  # noqa: F401

HAS_CUDA = False


class _Unavailable:
    def __init__(self, *args, **kwargs):
        raise NotImplementedError("implicit stub: GPU is not available")


KnnQuery = Matrix = CSRMatrix = COOMatrix = _Unavailable
