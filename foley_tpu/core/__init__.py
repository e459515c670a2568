from foley_tpu.core.dtypes import DTypePolicy, resolve_dtype, upcast_weight
from foley_tpu.core.params import (
    flatten_params,
    unflatten_params,
    cast_params,
    stack_params,
    unstack_params,
    param_count,
    param_bytes,
)

__all__ = [
    "DTypePolicy",
    "resolve_dtype",
    "upcast_weight",
    "flatten_params",
    "unflatten_params",
    "cast_params",
    "stack_params",
    "unstack_params",
    "param_count",
    "param_bytes",
]
