"""Algorithm registry (parity: srl/base/rl/registration.py:228)."""

from typing import Callable, Dict

from .agent57 import Agent57Config
from .agent57_light import Agent57LightConfig
from .alphazero import AlphaZeroConfig
from .base import AlgoConfig, PolicyContext, Transition
from .c51 import C51Config
from .diamond import DiamondConfig
from .dqn import DQNConfig
from .dreamer_v3 import DreamerV3Config
from .dynaq import DynaQConfig
from .efficient_zero_v2 import EfficientZeroV2Config
from .go_dqn import GoDQNConfig
from .godq_v1 import GoDQv1Config
from .godq_v1_lstm import GoDQv1LstmConfig
from .go_dynaq import GoDynaQConfig
from .go_explore import GoExploreConfig
from .mcts import MCTSConfig
from .muzero import MuZeroConfig
from .no_target import NoTargetDQNConfig, NoTargetSACConfig
from .planet import PlaNetConfig
from .ppo import PPOConfig
from .ppo_v import PPOVConfig
from .ql import QLConfig
from .ql_agent57 import QLAgent57Config
from .r2d2 import R2D2Config
from .rainbow import RainbowConfig
from .snd import SNDConfig
from .stochastic_muzero import StochasticMuZeroConfig
from .sac import SACConfig
from .search_dynaq import SearchDynaQConfig
from .ddpg import DDPGConfig
from .vanilla_policy import VanillaPolicyConfig
from .world_models import WorldModelsConfig

_registry: Dict[str, Callable[..., AlgoConfig]] = {}


def register(name: str, factory: Callable[..., AlgoConfig]) -> None:
    _registry[name] = factory


def make(name: str, **kwargs) -> AlgoConfig:
    return _registry[name](**kwargs)


def registered_names():
    """Registered algorithm names (parity: srl.rl registration listing)."""
    return tuple(_registry)


register("QL", QLConfig)
register("DQN", DQNConfig)
register("C51", C51Config)
register("Rainbow", RainbowConfig)
register("R2D2", R2D2Config)
register("PPO", PPOConfig)
register("SAC", SACConfig)
register("DDPG", DDPGConfig)
register("VanillaPolicy", VanillaPolicyConfig)
register("MCTS", MCTSConfig)
register("DynaQ", DynaQConfig)
register("Agent57_light", Agent57LightConfig)
register("QL_agent57", QLAgent57Config)
register("Agent57", Agent57Config)
register("AlphaZero", AlphaZeroConfig)
register("MuZero", MuZeroConfig)
register("SND", SNDConfig)
register("DreamerV3", DreamerV3Config)
register("PlaNet", PlaNetConfig)
register("NoTarget_DQN", NoTargetDQNConfig)
register("NoTarget_SAC", NoTargetSACConfig)
register("PPO_V", PPOVConfig)
register("SearchDynaQ", SearchDynaQConfig)
register("Go-Explore", GoExploreConfig)
register("GoExplore", GoExploreConfig)
register("GoDynaQ", GoDynaQConfig)
register("GoDQN", GoDQNConfig)
register("GoDQ_v1", GoDQv1Config)
register("GoDQ_v1_LSTM", GoDQv1LstmConfig)
register("EfficientZeroV2", EfficientZeroV2Config)
register("EfficientZero", EfficientZeroV2Config)
register("DIAMOND", DiamondConfig)
register("WorldModels", WorldModelsConfig)
register("StochasticMuZero", StochasticMuZeroConfig)

__all__ = [
    "Agent57Config",
    "Agent57LightConfig",
    "AlphaZeroConfig",
    "AlgoConfig",
    "C51Config",
    "DDPGConfig",
    "DQNConfig",
    "DreamerV3Config",
    "DynaQConfig",
    "GoDQNConfig",
    "GoDynaQConfig",
    "GoExploreConfig",
    "MCTSConfig",
    "MuZeroConfig",
    "NoTargetDQNConfig",
    "NoTargetSACConfig",
    "PlaNetConfig",
    "PPOConfig",
    "PPOVConfig",
    "PolicyContext",
    "QLAgent57Config",
    "QLConfig",
    "R2D2Config",
    "RainbowConfig",
    "SACConfig",
    "SNDConfig",
    "SearchDynaQConfig",
    "StochasticMuZeroConfig",
    "VanillaPolicyConfig",
    "WorldModelsConfig",
    "Transition",
    "make",
    "register",
]
