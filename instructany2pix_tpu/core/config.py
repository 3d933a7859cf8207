"""Typed config tree + string-target instantiation.

The reference mixes three config mechanisms (HF dataclass args, string
-target `instantiate_from_config` at reference utils/__init__.py:3-17,
and hard-coded constants). Here there is one mechanism: frozen
dataclasses with `from_dict`/`to_dict`, plus `instantiate_from_config`
kept for YAML-driven codec/prior configs so the reference's config-name
surface (e.g. `vq-npz`) remains intact.
"""

from __future__ import annotations

import dataclasses
import importlib
from typing import Any, Dict, Type, TypeVar

T = TypeVar("T")


def from_dict(cls: Type[T], d: Dict[str, Any]) -> T:
    """Build a (possibly nested) dataclass from a plain dict, ignoring
    unknown keys and recursing into dataclass-typed fields."""
    if not dataclasses.is_dataclass(cls):
        return d  # type: ignore[return-value]
    fields = {f.name: f for f in dataclasses.fields(cls)}
    kwargs = {}
    for k, v in d.items():
        if k not in fields:
            continue
        ftype = fields[k].type
        if isinstance(ftype, str):
            ftype = None  # postponed annotations; accept as-is
        if ftype is not None and dataclasses.is_dataclass(ftype) and isinstance(v, dict):
            v = from_dict(ftype, v)
        kwargs[k] = v
    return cls(**kwargs)


def to_dict(obj) -> Dict[str, Any]:
    return dataclasses.asdict(obj)


def get_obj_from_str(string: str, reload: bool = False):
    module, cls = string.rsplit(".", 1)
    mod = importlib.import_module(module)
    if reload:
        importlib.reload(mod)
    return getattr(mod, cls)


def instantiate_from_config(config: Dict[str, Any]):
    """Same contract as reference utils/__init__.py:3-17: a dict with a
    `target` dotted path and optional `params` kwargs."""
    if "target" not in config:
        raise KeyError("Expected key `target` to instantiate.")
    return get_obj_from_str(config["target"])(**config.get("params", {}))
