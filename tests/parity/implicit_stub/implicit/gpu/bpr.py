class BayesianPersonalizedRanking:  # import-time placeholder
    def __init__(self, *args, **kwargs):
        raise NotImplementedError("implicit stub: GPU BPR solver is not available")
