from .array_ops import (
    fast_isin,
    fast_isin_for_sorted_test_elements,
    fast_2d_int_unique,
    fast_2d_2col_int_unique,
    isin_2d_int,
)
from .config import BaseConfig
from .indexing import get_element_ids, get_from_series_by_index
from .misc import (
    import_object,
    get_class_or_function_full_path,
    is_instance,
    make_dict_flat,
    unflatten_dict,
    pairwise,
    select_by_type,
    log_at_base,
)

__all__ = [
    "fast_isin",
    "fast_isin_for_sorted_test_elements",
    "fast_2d_int_unique",
    "fast_2d_2col_int_unique",
    "isin_2d_int",
    "BaseConfig",
    "get_element_ids",
    "get_from_series_by_index",
    "import_object",
    "get_class_or_function_full_path",
    "is_instance",
    "make_dict_flat",
    "unflatten_dict",
    "pairwise",
    "select_by_type",
    "log_at_base",
]
