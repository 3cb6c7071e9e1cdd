class BayesianPersonalizedRanking:  # import-time placeholder
    def __init__(self, *args, **kwargs):
        raise NotImplementedError("implicit stub: CPU BPR solver is not available in parity tests")
