"""kaggle_environments interop (parity: srl/base/env/kaggle_wrapper.py + the
srl/envs/kaggle/ registrations).

Like the gymnasium adapter this is the HOST-side escape hatch — the wrapped kaggle
env steps through ``io_callback``; prefer the native pure-JAX ports (``ConnectX``,
``hungry_geese`` in this package) for on-device throughput. The wrapper exists so any
other kaggle competition runs unmodified when ``kaggle_environments`` is installed.

The kaggle runtime advances ALL active players simultaneously; the wrapper sequences
that into the engine's turn-based protocol exactly like the reference: each player's
action is buffered, and the underlying env steps once the last active player chose
(kaggle_wrapper.py:75-92).

``as_kaggle_agent(runner, wrapper)`` turns a trained Runner into a kaggle submission
callable (the reference's direct_step path, kaggle_wrapper.py:94-99).
"""

from __future__ import annotations

import importlib.util
from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..spaces import Discrete, Space
from .core import EnvCore, TimeStep

_HAS_KAGGLE = importlib.util.find_spec("kaggle_environments") is not None


def is_available() -> bool:
    return _HAS_KAGGLE


@struct.dataclass
class KaggleHostState:
    slot: jax.Array  # int32 (single host instance)


class KaggleWrapper(EnvCore):
    """Subclass and implement ``encode_obs`` / ``decode_action`` (and optionally
    ``get_invalid_actions``), plus the space/metadata properties."""

    def __init__(self, name: str, player_num: int):
        if not _HAS_KAGGLE:
            raise ImportError(
                "kaggle_environments is not installed — use the native envs "
                "('ConnectX', 'hungry_geese') instead"
            )
        import kaggle_environments

        self.name = name
        self._player_num = int(player_num)
        self.env = kaggle_environments.make(name, debug=False)
        self.configuration = self.env.configuration
        self._pending: List[Optional[Any]] = []
        self._host_next = 0
        self._last_obs = None

    # --- subclass hooks (parity: the abstract methods) -----------------------
    def encode_obs(self, observation, configuration):
        """-> (is_start_episode, state_value, player_index, info)"""
        raise NotImplementedError()

    def decode_action(self, action):
        raise NotImplementedError()

    def get_invalid_actions(self, player_index: int) -> List[int]:
        return []

    # --- metadata -------------------------------------------------------------
    @property
    def player_num(self) -> int:
        return self._player_num

    # --- host mechanics ---------------------------------------------------------
    def _shared_obs(self, obs):
        import copy

        merged = copy.deepcopy(obs[0]["observation"])
        merged.update(obs[self._host_next]["observation"])
        return merged

    def _refresh(self, obs):
        self._kaggle_obs = obs
        self._rewards = np.asarray(
            [0.0 if o["reward"] is None else float(o["reward"]) for o in obs], np.float32
        )
        self._pending = [
            None if obs[i]["status"] == "ACTIVE" else 0 for i in range(self._player_num)
        ]
        self._host_next = 0
        self._advance_next()

    def _advance_next(self):
        for i in range(self._host_next, self._player_num):
            if self._pending[i] is None:
                self._host_next = i
                return
        self._host_next = -1

    def _pack(self):
        _, state, _, _ = self.encode_obs(self._shared_obs(self._kaggle_obs), self.configuration)
        ospace = self.observation_space
        obs = np.asarray(state, ospace.dtype).reshape(ospace.shape)
        invalid = np.zeros((self.num_actions,), np.bool_)
        for a in self.get_invalid_actions(max(self._host_next, 0)):
            invalid[a] = True
        return (
            obs,
            self._rewards,
            np.bool_(self.env.done),
            invalid,
            np.int32(max(self._host_next, 0)),
        )

    def _host_reset(self, seed):
        obs = self.env.reset(self._player_num)
        self._refresh(obs)
        return self._pack()

    def _host_step(self, action):
        self._pending[self._host_next] = np.asarray(action).item()
        self._advance_next()
        if self._host_next == -1:
            actions = [self.decode_action(a) for a in self._pending]
            obs = self.env.step(actions)
            self._refresh(obs)
        return self._pack()

    def _out_shapes(self):
        ospace = self.observation_space
        return (
            jax.ShapeDtypeStruct(ospace.shape, ospace.dtype),
            jax.ShapeDtypeStruct((self._player_num,), jnp.float32),
            jax.ShapeDtypeStruct((), jnp.bool_),
            jax.ShapeDtypeStruct((self.num_actions,), jnp.bool_),
            jax.ShapeDtypeStruct((), jnp.int32),
        )

    def reset(self, key) -> Tuple[KaggleHostState, TimeStep]:
        seed = jax.random.randint(key, (), 0, 2**31 - 1)
        obs, rewards, done, invalid, nxt = jax.experimental.io_callback(
            self._host_reset, self._out_shapes(), seed, ordered=True
        )
        return KaggleHostState(slot=jnp.asarray(0, jnp.int32)), self.timestep(
            obs, rewards, done, invalid_mask=invalid, next_player=nxt
        )

    def step(self, state, action, key) -> Tuple[KaggleHostState, TimeStep]:
        obs, rewards, done, invalid, nxt = jax.experimental.io_callback(
            self._host_step, self._out_shapes(), action, ordered=True
        )
        return state, self.timestep(
            obs, rewards, done, invalid_mask=invalid, next_player=nxt
        )


def as_kaggle_agent(runner, wrapper: KaggleWrapper):
    """Wrap a trained Runner as a kaggle ``agent(observation, configuration)``
    callable for submission (parity: the direct_step flow)."""
    import jax.random as jr

    algo = runner.algo
    state = runner.algo_state
    keyholder = {"key": jr.PRNGKey(0)}

    def agent(observation, configuration):
        _, obs_val, player_index, _ = wrapper.encode_obs(dict(observation), dict(configuration))
        enc = algo.obs_encoder.encode(jnp.asarray(obs_val))
        invalid = np.zeros((wrapper.num_actions,), bool)
        for a in wrapper.get_invalid_actions(player_index):
            invalid[a] = True
        keyholder["key"], k = jr.split(keyholder["key"])
        from ..algorithms.base import PolicyContext

        ctx = PolicyContext(
            step=jnp.asarray(0, jnp.int32),
            training=jnp.asarray(False),
            env_ids=jnp.zeros((1,), jnp.int32),
        )
        a_rl = algo.policy(state, jax.tree.map(lambda x: x[None], enc),
                           jnp.asarray(invalid)[None], ctx, k)
        a_env = algo.action_encoder.decode(jax.tree.map(lambda x: x[0], a_rl))
        return wrapper.decode_action(np.asarray(a_env).item())

    return agent


# --- concrete wrappers (parity: srl/envs/kaggle/connectx.py / hungry_geese.py) ----
if _HAS_KAGGLE:
    from ..spaces import ArrayDiscrete
    from .registration import register

    class KaggleConnectX(KaggleWrapper):
        def __init__(self):
            super().__init__("connectx", player_num=2)
            self.columns = self.configuration["columns"]
            self.rows = self.configuration["rows"]

        @property
        def action_space(self):
            return Discrete(self.columns)

        @property
        def observation_space(self):
            return ArrayDiscrete(self.columns * self.rows, 0, 2)

        @property
        def max_episode_steps(self):
            return self.columns * self.rows + 2

        def encode_obs(self, observation, configuration):
            return observation["step"] == 0, observation["board"], observation["mark"] - 1, {}

        def decode_action(self, action):
            return int(action)

        def get_invalid_actions(self, player_index):
            board = self._shared_obs(self._kaggle_obs)["board"]
            return [c for c in range(self.columns) if board[c] != 0]

    class KaggleHungryGeese(KaggleWrapper):
        def __init__(self, player_num: int = 4):
            super().__init__("hungry_geese", player_num=player_num)
            self.columns = self.configuration["columns"]
            self.rows = self.configuration["rows"]
            self._prev_action = None

        @property
        def action_space(self):
            return Discrete(4)

        @property
        def observation_space(self):
            return ArrayDiscrete(self.columns * self.rows, 0, 9)

        @property
        def max_episode_steps(self):
            return 200 * self._player_num

        def encode_obs(self, observation, configuration):
            if observation["step"] == 0:
                self._prev_action = None
            field = [0] * (self.columns * self.rows)
            for n in observation["food"]:
                field[n] = 9
            for idx, goose in enumerate(observation["geese"]):
                for n in goose:
                    field[n] = 1 + idx
            return observation["step"] == 0, field, observation["index"], {}

        def decode_action(self, action):
            self._prev_action = int(action)
            return ["NORTH", "EAST", "SOUTH", "WEST"][int(action) % 4]

        def get_invalid_actions(self, player_index):
            opposite = {0: 2, 1: 3, 2: 0, 3: 1}
            return [opposite[self._prev_action]] if self._prev_action is not None else []

    register("kaggle_connectx", KaggleConnectX)
    register("kaggle_hungry_geese", KaggleHungryGeese, player_num=4)
