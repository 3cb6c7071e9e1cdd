from .cpu.bpr import BayesianPersonalizedRanking  # noqa: F401
