"""Attribute-style config access + YAML loading.

Equivalent capability to the reference's ``AttributeDict``/``load_yaml``
(reference ``hunyuanvideo_foley/utils/config_utils.py:7-109``), reimplemented:
recursive dict/list -> attribute access with ``get/keys/values/items/to_dict``.
"""

from __future__ import annotations

import re
from typing import Any, Iterator

import yaml

_IDENT_RE = re.compile(r"[^0-9a-zA-Z_]")


def _sanitize_key(key: str) -> str:
    """Make a dict key usable as a Python attribute name."""
    key = _IDENT_RE.sub("_", str(key))
    if key and key[0].isdigit():
        key = "_" + key
    return key


class AttributeDict:
    """Read-mostly recursive attribute wrapper over dicts/lists parsed from YAML."""

    def __init__(self, data: Any = None):
        object.__setattr__(self, "_data", {} if data is None else dict(data))

    # -- attribute & item access -------------------------------------------------
    def __getattr__(self, name: str) -> Any:
        data = object.__getattribute__(self, "_data")
        for key, value in data.items():
            if key == name or _sanitize_key(key) == name:
                return _wrap(value)
        raise AttributeError(f"No config key {name!r}; available: {list(data)}")

    def __setattr__(self, name: str, value: Any) -> None:
        self._data[name] = value

    def __getitem__(self, key: str) -> Any:
        return _wrap(self._data[key])

    def __setitem__(self, key: str, value: Any) -> None:
        self._data[key] = value

    def __contains__(self, key: str) -> bool:
        return key in self._data

    def __iter__(self) -> Iterator[str]:
        return iter(self._data)

    def __len__(self) -> int:
        return len(self._data)

    def __repr__(self) -> str:
        return f"AttributeDict({self._data!r})"

    def __eq__(self, other: Any) -> bool:
        if isinstance(other, AttributeDict):
            return self._data == other._data
        return self._data == other

    # -- dict protocol -----------------------------------------------------------
    def get(self, key: str, default: Any = None) -> Any:
        if key in self._data:
            return _wrap(self._data[key])
        return default

    def keys(self):
        return self._data.keys()

    def values(self):
        return [_wrap(v) for v in self._data.values()]

    def items(self):
        return [(k, _wrap(v)) for k, v in self._data.items()]

    def to_dict(self) -> dict:
        def unwrap(v):
            if isinstance(v, AttributeDict):
                return v.to_dict()
            if isinstance(v, list):
                return [unwrap(x) for x in v]
            if isinstance(v, dict):
                return {k: unwrap(x) for k, x in v.items()}
            return v

        return {k: unwrap(v) for k, v in self._data.items()}


def _wrap(value: Any) -> Any:
    if isinstance(value, dict):
        return AttributeDict(value)
    if isinstance(value, list):
        return [_wrap(v) for v in value]
    return value


def load_yaml(path: str) -> AttributeDict:
    """Load a YAML file into an AttributeDict (reference ``config_utils.py:101-109``)."""
    with open(path, "r") as f:
        data = yaml.safe_load(f)
    return AttributeDict(data)


def merge_dicts(base: dict, override: dict) -> dict:
    """Recursive dict merge (reference ``utils/helper.py`` capability)."""
    out = dict(base)
    for k, v in override.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = merge_dicts(out[k], v)
        else:
            out[k] = v
    return out
