"""Misc utilities (reference: rectools/utils/misc.py:25-261)."""

import importlib
import typing as tp

import numpy as np

T = tp.TypeVar("T")


def import_object(path: str) -> tp.Any:
    """Import an object from a ``module.sub:attr`` or ``module.sub.attr`` path."""
    if ":" in path:
        module_path, attr = path.split(":")
    else:
        module_path, _, attr = path.rpartition(".")
    module = importlib.import_module(module_path)
    return getattr(module, attr)


def get_class_or_function_full_path(obj: tp.Any) -> str:
    """Full ``module.attr`` import path of a class or function."""
    return f"{obj.__module__}.{obj.__qualname__}"


def make_dict_flat(d: tp.Dict[str, tp.Any], sep: str = ".", parent_key: str = "") -> tp.Dict[str, tp.Any]:
    """Flatten a nested dict into one level with `sep`-joined keys."""
    items: tp.List[tp.Tuple[str, tp.Any]] = []
    for key, value in d.items():
        new_key = f"{parent_key}{sep}{key}" if parent_key else str(key)
        if isinstance(value, dict) and value:
            items.extend(make_dict_flat(value, sep=sep, parent_key=new_key).items())
        else:
            items.append((new_key, value))
    return dict(items)


def unflatten_dict(d: tp.Dict[str, tp.Any], sep: str = ".") -> tp.Dict[str, tp.Any]:
    """Inverse of `make_dict_flat`."""
    result: tp.Dict[str, tp.Any] = {}
    for flat_key, value in d.items():
        keys = flat_key.split(sep)
        cur = result
        for key in keys[:-1]:
            cur = cur.setdefault(key, {})
        cur[keys[-1]] = value
    return result


def select_by_type(
    objects: tp.Dict[tp.Any, tp.Any],
    types: tp.Union[type, tp.Tuple[type, ...]],
) -> tp.Dict[tp.Any, tp.Any]:
    """Select dict entries whose values are instances of `types`."""
    return {k: v for k, v in objects.items() if isinstance(v, types)}


def log_at_base(arr: np.ndarray, base: float) -> np.ndarray:
    """Logarithm at an arbitrary base."""
    return np.log(arr) / np.log(base)


def pairwise(iterable: tp.Iterable[T]) -> tp.Iterator[tp.Tuple[T, T]]:
    """s -> (s0,s1), (s1,s2), (s2,s3), ..."""
    import itertools

    a, b = itertools.tee(iterable)
    next(b, None)
    return zip(a, b)
