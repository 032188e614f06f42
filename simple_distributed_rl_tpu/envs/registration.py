"""Env registry (parity: srl/base/env/registration.py:17,116 of the reference).

ids map to factory callables; ``make`` instantiates an EnvCore with merged kwargs.
Built-in envs self-register on package import (lazy, like the reference's autoload).
"""

from __future__ import annotations

from typing import Callable, Dict

from .core import EnvCore

_registry: Dict[str, tuple] = {}


def register(id: str, factory: Callable[..., EnvCore], **default_kwargs) -> None:
    if id in _registry:
        raise ValueError(f"env id already registered: {id}")
    _registry[id] = (factory, default_kwargs)


def make(id: str, **kwargs) -> EnvCore:
    if id not in _registry:
        # Lazy fallback: try the gymnasium adapter for unknown ids (parity with the
        # reference's gym autoload, srl/base/env/registration.py:17-107).
        from . import gym_adapter

        if gym_adapter.is_available(id):
            return gym_adapter.make(id, **kwargs)
        raise KeyError(f"unknown env id: {id}. registered: {sorted(_registry)}")
    factory, defaults = _registry[id]
    merged = {**defaults, **kwargs}
    return factory(**merged)


def registered_ids():
    return sorted(_registry)
