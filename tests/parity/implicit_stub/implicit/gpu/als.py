class AlternatingLeastSquares:  # import-time placeholder
    def __init__(self, *args, **kwargs):
        raise NotImplementedError("implicit stub: GPU ALS solver is not available")
