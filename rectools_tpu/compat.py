"""Dummy classes for optional extras (reference rectools/compat.py:19-94)."""

import typing as tp


class RequirementUnavailable:
    """Placeholder raising an informative error when the optional dependency
    backing a feature is not installed."""

    requirement: str = ""

    def __init__(self, *args: tp.Any, **kwargs: tp.Any) -> None:
        raise ImportError(
            f"Requirement `{self.requirement}` is not satisfied. "
            f"Install the missing package to use `{self.__class__.__name__}`."
        )


class CatBoostRerankerUnavailable(RequirementUnavailable):
    """Dummy for CatBoostReranker when catboost is not installed."""

    requirement = "catboost"
