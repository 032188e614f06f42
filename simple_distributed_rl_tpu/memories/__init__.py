from .priority_buffer import (
    PriorityReplayBuffer,
    PriorityReplayState,
    RankBasedLinearReplayBuffer,
    RankBasedReplayBuffer,
)
from .episode_buffer import EpisodeReplayBuffer
from .replay_buffer import ReplayBuffer, ReplayState
from .single_use import SingleUseBuffer, SingleUseState

__all__ = [
    "EpisodeReplayBuffer",
    "PriorityReplayBuffer",
    "PriorityReplayState",
    "RankBasedLinearReplayBuffer",
    "RankBasedReplayBuffer",
    "ReplayBuffer",
    "ReplayState",
    "SingleUseBuffer",
    "SingleUseState",
]
