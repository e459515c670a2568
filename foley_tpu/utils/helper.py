"""Small utilities (reference ``utils/helper.py``: to_Ntuple, dict/yaml merging,
``get_obj_from_str`` dynamic import)."""

from __future__ import annotations

import importlib
from typing import Any, Tuple


def to_ntuple(x: Any, n: int) -> Tuple:
    if isinstance(x, (tuple, list)):
        assert len(x) == n, (x, n)
        return tuple(x)
    return (x,) * n


def to_1tuple(x):
    return to_ntuple(x, 1)


def to_2tuple(x):
    return to_ntuple(x, 2)


def get_obj_from_str(string: str, reload: bool = False) -> Any:
    """Import ``pkg.module.Attr`` dynamically."""
    module_name, _, obj_name = string.rpartition(".")
    module = importlib.import_module(module_name)
    if reload:
        module = importlib.reload(module)
    return getattr(module, obj_name)
