from . import rl_functions, schedulers

__all__ = ["rl_functions", "schedulers"]
