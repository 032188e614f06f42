"""simple_distributed_rl_tpu — a TPU-native RL framework with the capability surface of
pocokhc/simple_distributed_rl, built from scratch on jax/XLA/pjit/Pallas.

Quick start (mirrors the reference's ``srl.Runner`` API):

    import simple_distributed_rl_tpu as srl
    runner = srl.Runner("Grid", srl.algorithms.QLConfig(), num_envs=512, seed=1)
    runner.train(max_train_count=100_000)
    runner.evaluate_compare_to_baseline_single_player()
"""

from . import algorithms, envs, memories, models, spaces, utils
from .define import DoneTypes, PlayerType, RLBaseTypes, SpaceTypes
from .envs import EnvConfig, EnvCore, make as make_env, register as register_env
from .runner import Runner
from .utils.compilation_cache import enable_compilation_cache

#: Rebuild a Runner from a full-run yaml (env:/rl:/context: document) — parity:
#: srl.load (srl/__init__.py:6-8 / base/context.py:211-251)
load = Runner.load

__version__ = "0.1.0"

__all__ = [
    "DoneTypes",
    "EnvCore",
    "PlayerType",
    "RLBaseTypes",
    "Runner",
    "SpaceTypes",
    "enable_compilation_cache",
    "load",
    "algorithms",
    "envs",
    "EnvConfig",
    "make_env",
    "memories",
    "models",
    "register_env",
    "spaces",
    "utils",
]
