"""Algorithm abstraction: pure-function worker/trainer pairs.

The reference splits an algorithm into Config/Memory/Parameter/Trainer/Worker objects
(srl/base/rl/config.py:42, memory.py:48, parameter.py:15, trainer.py:14, worker.py:147)
communicating through mutable state and mp queues. Here an algorithm is a config
dataclass exposing four pure functions over an explicit state pytree:

    init(key)                                  -> AlgoState
    policy(state, obs, invalid, ctx, key)      -> rl_action            (batched over envs)
    observe(state, transitions, mask)          -> AlgoState            (memory write)
    train(state, key, num_steps)               -> (AlgoState, metrics) (num_steps updates)

all of which compile into ONE jitted rollout+update chunk by the play engine. The
env↔RL space auto-negotiation of RLConfig.setup (srl/base/rl/config.py:226-445) is
``setup(env)`` here: it resolves observation/action encoders as static trace-time
transforms.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..define import RLBaseTypes
from ..envs.core import EnvCore
from ..spaces import Encoder, Space

Array = jax.Array


@struct.dataclass
class Transition:
    """One (s, a, r, s') sample as seen by the acting player, in RL (encoded) space.

    ``reward`` is the acting player's accumulated reward since its previous action
    (matching WorkerRun's per-player delayed view, srl/base/rl/worker_run.py:107-228).
    ``undone`` = not terminated — the bootstrap mask, named after the reference's DQN
    batch field (srl/algorithms/dqn/dqn.py:243).
    """

    obs: Any
    action: Any
    reward: Array  # f32
    next_obs: Any
    undone: Array  # f32: 0 if terminated, 1 otherwise (truncation still bootstraps)
    invalid_mask: Array  # [A] bool at s
    next_invalid_mask: Array  # [A] bool at s'


@struct.dataclass
class PolicyContext:
    """Per-call info available to the policy (parity: the worker shortcut properties,
    srl/base/rl/worker.py:25-147)."""

    step: Array  # global env-step counter (per-shard)
    training: Array  # bool
    env_ids: Array  # [B] int32 — actor-ladder index (parity: actor_id epsilon ladders)


@dataclasses.dataclass
class AlgoConfig:
    """Base config. Subclasses add hyperparameters and implement the pure fns."""

    # which representation this algorithm wants (parity: RLConfig base types,
    # srl/base/rl/algorithms/base_ql.py / base_dqn.py)
    observation_type: RLBaseTypes = RLBaseTypes.BOX
    action_type: RLBaseTypes = RLBaseTypes.DISCRETE
    obs_division: int = 10  # quantization grid when discretizing continuous obs
    # Mesh axis name for data-parallel gradient sync; set by DataParallelEngine.
    # Inside train/observe, algorithms pmean/psum their update statistics over this
    # axis so learner replicas stay identical (replaces the reference's parameter
    # board + sync threads, play_mp.py:289-318).
    pmean_axis: Optional[str] = None

    def get_name(self) -> str:
        raise NotImplementedError()

    # --- space negotiation (static, trace-time) ---------------------------
    def setup(self, env: EnvCore) -> None:
        """Resolve encoders. Mirrors RLConfig.setup (srl/base/rl/config.py:226-445) but
        produces static transforms instead of mutating runtime state."""
        self.env = env
        self.obs_encoder: Encoder = env.observation_space.encoder(
            self.observation_type, division=self.obs_division
        )
        self.action_encoder: Encoder = env.action_space.encoder(self.action_type)
        self.obs_space: Space = self.obs_encoder.space
        self.action_space: Space = self.action_encoder.space
        self.num_actions: int = env.num_actions
        self.on_setup()

    def on_setup(self) -> None:
        pass

    # --- pure functions ---------------------------------------------------
    def init(self, key: Array) -> Any:
        raise NotImplementedError()

    def policy(self, state: Any, obs: Any, invalid_mask: Array, ctx: PolicyContext, key: Array) -> Array:
        """Batched action selection: obs leaves have leading dim B; returns [B] actions
        in RL space."""
        raise NotImplementedError()

    def observe(self, state: Any, transitions: Transition, mask: Array) -> Any:
        """Write a flat batch of transitions (leading dim N, with validity mask) into
        the algorithm's memory."""
        return state

    def train(self, state: Any, key: Array, num_steps: int) -> Tuple[Any, Dict[str, Array]]:
        """Run ``num_steps`` (static) parameter updates."""
        return state, {}

    # --- cadence ----------------------------------------------------------
    @property
    def train_interval(self) -> int:
        """Env steps (per instance) between train calls (parity: RunContext
        train_interval)."""
        return 1

    # --- persistence ------------------------------------------------------
    def params_of(self, state: Any) -> Any:
        """The pytree that constitutes the learned parameters (for checkpoint/eval
        sync; parity: RLParameter.call_backup, srl/base/rl/parameter.py:56)."""
        return state

    def restore_params(self, state: Any, params: Any) -> Any:
        return params
