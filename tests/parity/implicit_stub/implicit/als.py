from .cpu.als import AlternatingLeastSquares  # noqa: F401
