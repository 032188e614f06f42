"""Config serialization: recursive dataclass <-> dict with ``_target_`` instantiation
and yaml round-trip.

Parity: srl/utils/serialize.py:108-478 (apply_dict_to_dataclass / dataclass_to_dict /
get_modified_fields) and the yaml entry points srl.load_* (srl/base/context.py:211-251).
Configs here are plain dataclasses (AlgoConfig subclasses, MemoryConfig, SchedulerConfig
...), so the same engine covers algorithm, env and run configuration.
"""

from __future__ import annotations

import dataclasses
import enum
import importlib
from typing import Any, Dict, List, Optional, Type


def _locate(path: str):
    """Resolve a dotted path to a class/callable (the ``_target_`` mechanism)."""
    module, _, name = path.rpartition(".")
    return getattr(importlib.import_module(module), name)


def dataclass_to_dict(obj: Any, *, include_target: bool = True) -> Any:
    """Recursive dataclass -> plain dict; enums -> names; tuples -> lists
    (parity: serialize.py:380)."""
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        out: Dict[str, Any] = {}
        if include_target:
            cls = type(obj)
            out["_target_"] = f"{cls.__module__}.{cls.__qualname__}"
        for f in dataclasses.fields(obj):
            out[f.name] = dataclass_to_dict(getattr(obj, f.name), include_target=include_target)
        return out
    if isinstance(obj, enum.Enum):
        return obj.name
    if isinstance(obj, (list, tuple)):
        return [dataclass_to_dict(v, include_target=include_target) for v in obj]
    if isinstance(obj, dict):
        return {k: dataclass_to_dict(v, include_target=include_target) for k, v in obj.items()}
    return obj


def apply_dict_to_dataclass(obj: Any, data: Dict[str, Any]) -> Any:
    """Apply a (possibly partial) dict onto an existing dataclass instance, recursing
    into nested dataclasses; ``_target_`` keys re-instantiate the named class
    (parity: serialize.py:108)."""
    for k, v in data.items():
        if k == "_target_":
            continue
        if not hasattr(obj, k):
            raise AttributeError(f"{type(obj).__name__} has no field {k!r}")
        cur = getattr(obj, k)
        if dataclasses.is_dataclass(cur) and isinstance(v, dict):
            apply_dict_to_dataclass(cur, v)
        elif isinstance(cur, enum.Enum) and isinstance(v, str):
            setattr(obj, k, type(cur)[v])
        elif isinstance(cur, tuple) and isinstance(v, list):
            setattr(obj, k, tuple(_maybe_instantiate(item) for item in v))
        elif isinstance(v, list):
            # re-instantiate serialized objects inside lists (e.g. EnvConfig /
            # AlgoConfig processor lists) — a plain assignment would leave raw
            # ``_target_`` dicts behind (round-1 advisor finding)
            setattr(obj, k, [_maybe_instantiate(item) for item in v])
        else:
            setattr(obj, k, v)
    return obj


def _maybe_instantiate(item: Any) -> Any:
    if isinstance(item, dict) and "_target_" in item:
        return instantiate(item)
    return item


def instantiate(data: Dict[str, Any], default_cls: Optional[Type] = None) -> Any:
    """Build an object from a ``_target_`` dict (parity: the hydra-style dynamic class
    resolution in serialize.py)."""
    cls = _locate(data["_target_"]) if "_target_" in data else default_cls
    assert cls is not None, "need _target_ or a default class"
    obj = cls()
    return apply_dict_to_dataclass(obj, data)


def get_modified_fields(obj: Any) -> Dict[str, Any]:
    """Diff against a default-constructed instance (parity: serialize.py:480, used by
    summary(show_changed_only=True))."""
    default = type(obj)()
    out = {}
    for f in dataclasses.fields(obj):
        cur, ref = getattr(obj, f.name), getattr(default, f.name)
        if dataclasses.is_dataclass(cur):
            sub = {}
            ref_sub = get_modified_fields(cur)
            if ref_sub:
                sub = ref_sub
            if sub:
                out[f.name] = sub
        elif cur != ref:
            out[f.name] = cur
    return out


def save_yaml(obj: Any, path: str) -> None:
    import yaml

    with open(path, "w") as f:
        yaml.safe_dump(dataclass_to_dict(obj), f, sort_keys=False)


def load_yaml(path: str, default_cls: Optional[Type] = None) -> Any:
    import yaml

    with open(path) as f:
        data = yaml.safe_load(f)
    return instantiate(data, default_cls)
