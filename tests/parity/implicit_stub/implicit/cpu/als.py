class AlternatingLeastSquares:  # import-time placeholder
    def __init__(self, *args, **kwargs):
        raise NotImplementedError("implicit stub: CPU ALS solver is not available in parity tests")
