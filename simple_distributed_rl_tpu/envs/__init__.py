from .config import EnvConfig, ProcessedEnv
from .core import AutoResetEnv, AutoResetState, EnvCore, TimeStep
from .registration import make, register, registered_ids

# built-in env registrations (parity with srl/envs/ autoload)
from . import board_games, classic_control, grid, hungry_geese, oneroad, sample_env  # noqa: F401,E402

__all__ = [
    "AutoResetEnv",
    "EnvConfig",
    "ProcessedEnv",
    "AutoResetState",
    "EnvCore",
    "TimeStep",
    "make",
    "register",
    "registered_ids",
]
