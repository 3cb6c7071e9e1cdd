"""Shim exposing the typeguard v4 API (`check_type(value, type)` +
`TypeCheckError`) on top of plain typing introspection — the installed
typeguard is v2, whose API the reference tree doesn't speak. Only the depth
the reference needs (`utils.misc.is_instance` for metric dispatch over
concrete classes, unions and simple generics) is implemented."""

import typing as tp


class TypeCheckError(TypeError):
    pass


def check_type(value, expected_type):
    if not _matches(value, expected_type):
        raise TypeCheckError(f"{value!r} is not an instance of {expected_type!r}")
    return value


def _matches(value, expected_type) -> bool:
    if expected_type is tp.Any:
        return True
    origin = tp.get_origin(expected_type)
    if origin is None:
        try:
            return isinstance(value, expected_type)
        except TypeError:
            return False
    if origin is tp.Union:
        return any(_matches(value, arg) for arg in tp.get_args(expected_type))
    try:
        return isinstance(value, origin)  # generic: origin check, args unchecked
    except TypeError:
        return False
