"""Algorithm registry (parity: srl/base/rl/registration.py:228)."""

from typing import Callable, Dict

from .base import AlgoConfig, PolicyContext, Transition
from .dqn import DQNConfig
from .ql import QLConfig

_registry: Dict[str, Callable[..., AlgoConfig]] = {}


def register(name: str, factory: Callable[..., AlgoConfig]) -> None:
    _registry[name] = factory


def make(name: str, **kwargs) -> AlgoConfig:
    return _registry[name](**kwargs)


register("QL", QLConfig)
register("DQN", DQNConfig)

__all__ = [
    "AlgoConfig",
    "DQNConfig",
    "PolicyContext",
    "QLConfig",
    "Transition",
    "make",
    "register",
]
