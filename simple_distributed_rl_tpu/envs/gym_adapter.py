"""Gymnasium interop — the escape hatch for host-side (non-jittable) envs.

Parity target: srl/base/env/gymnasium_wrapper.py:31-228 (space auto-conversion,
value encode/decode, seed plumbing). Unlike the built-in pure-function envs this
wrapper steps on the HOST via ``jax.experimental.io_callback`` — it exists for
capability coverage (any gymnasium env runs), not for the TPU fast path. Prefer the
native envs in this package (CartPole/Pendulum/... are re-implemented as pure JAX) for
throughput.
"""

from __future__ import annotations

import importlib.util
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..define import SpaceTypes
from ..spaces import Box, Discrete, Space
from .core import EnvCore, TimeStep

_HAS_GYMNASIUM = importlib.util.find_spec("gymnasium") is not None


def is_available(env_id: str) -> bool:
    if not _HAS_GYMNASIUM:
        return False
    import gymnasium

    return env_id in gymnasium.registry


def convert_space(gym_space) -> Space:
    """gymnasium space -> native space (parity: gymnasium_wrapper.py:31-226)."""
    import gymnasium

    if isinstance(gym_space, gymnasium.spaces.Discrete):
        return Discrete(int(gym_space.n), start=int(gym_space.start))
    if isinstance(gym_space, gymnasium.spaces.Box):
        stype = SpaceTypes.CONTINUOUS
        if len(gym_space.shape) == 3 and gym_space.dtype == np.uint8:
            stype = SpaceTypes.COLOR if gym_space.shape[-1] == 3 else SpaceTypes.FEATURE_MAP
        return Box(
            gym_space.shape,
            float(np.min(gym_space.low)),
            float(np.max(gym_space.high)),
            jnp.dtype(gym_space.dtype),
            stype,
        )
    raise ValueError(f"unsupported gymnasium space: {gym_space}")


@struct.dataclass
class HostEnvState:
    slot: jax.Array  # int32 instance slot managed host-side


class GymnasiumEnv(EnvCore):
    """Single-instance host env bridged into the functional protocol. Each jittable
    reset/step escapes to the host through io_callback (ordered per slot)."""

    def __init__(self, env_id: str, terminal_on_life_loss: bool = False, **kwargs):
        import gymnasium

        self.env_id = env_id
        self._env = gymnasium.make(env_id, **kwargs)
        self._aspace = convert_space(self._env.action_space)
        self._ospace = convert_space(self._env.observation_space)
        spec_steps = getattr(self._env.spec, "max_episode_steps", None)
        self._max_steps = int(spec_steps or 99_999)
        # ALE life-loss episode semantics (parity: AtariProcessor.remap_step,
        # srl/envs/processors/atari_processor.py:44-52) — host-side, like the env itself.
        self._terminal_on_life_loss = bool(terminal_on_life_loss)
        self._lives = 0

    def _ale_lives(self) -> int:
        ale = getattr(getattr(self._env, "unwrapped", self._env), "ale", None)
        return int(ale.lives()) if ale is not None else 0

    @property
    def action_space(self):
        return self._aspace

    @property
    def observation_space(self):
        return self._ospace

    @property
    def max_episode_steps(self) -> int:
        return self._max_steps

    # host callbacks ------------------------------------------------------
    def _host_reset(self, seed):
        obs, _ = self._env.reset(seed=int(seed))
        if self._terminal_on_life_loss:
            self._lives = self._ale_lives()
        return np.asarray(obs, self._ospace.dtype)

    def _host_step(self, action):
        a = np.asarray(action)
        if isinstance(self._aspace, Discrete):
            a = int(a)
        obs, reward, terminated, truncated, _ = self._env.step(a)
        if self._terminal_on_life_loss:
            new_lives = self._ale_lives()
            if new_lives < self._lives:
                terminated = True
            self._lives = new_lives
        return (
            np.asarray(obs, self._ospace.dtype),
            np.float32(reward),
            np.bool_(terminated),
            np.bool_(truncated),
        )

    def reset(self, key) -> Tuple[HostEnvState, TimeStep]:
        seed = jax.random.randint(key, (), 0, 2**31 - 1)
        obs = jax.experimental.io_callback(
            self._host_reset,
            jax.ShapeDtypeStruct(self._ospace.shape, self._ospace.dtype),
            seed,
            ordered=True,
        )
        return HostEnvState(slot=jnp.asarray(0, jnp.int32)), self.timestep(obs)

    def step(self, state, action, key) -> Tuple[HostEnvState, TimeStep]:
        obs, reward, terminated, truncated = jax.experimental.io_callback(
            self._host_step,
            (
                jax.ShapeDtypeStruct(self._ospace.shape, self._ospace.dtype),
                jax.ShapeDtypeStruct((), jnp.float32),
                jax.ShapeDtypeStruct((), jnp.bool_),
                jax.ShapeDtypeStruct((), jnp.bool_),
            ),
            action,
            ordered=True,
        )
        return state, self.timestep(obs, reward, terminated, truncated)


def make(env_id: str, **kwargs) -> GymnasiumEnv:
    return GymnasiumEnv(env_id, **kwargs)
