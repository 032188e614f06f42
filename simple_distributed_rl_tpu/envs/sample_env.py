"""SampleEnv — the "write your own env" template (parity: srl/envs/sample_env.py).

A 9-cell corridor: start at 4, X (death, -1) at 0, G (goal, +1) at 8, move_reward per
step. This file doubles as the minimal example of a functional TPU env: one state
pytree + pure reset/step, terminal render, key binds for ``play_terminal``."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..spaces import Discrete
from .core import EnvCore, TimeStep
from .registration import register

LEFT, RIGHT = 0, 1
_FIELD = (-1, 0, 0, 0, 0, 0, 0, 0, 1)  # -1 death, +1 goal


@struct.dataclass
class SampleEnvState:
    pos: jax.Array  # int32


class SampleEnv(EnvCore):
    def __init__(self, move_reward: float = -0.04):
        self.move_reward = float(move_reward)

    @property
    def action_space(self):
        return Discrete(2)

    @property
    def observation_space(self):
        return Discrete(len(_FIELD))

    @property
    def max_episode_steps(self) -> int:
        # the reference returns 10 in training / 50 otherwise (sample_env.py:47-50);
        # a jitted env needs ONE static bound — use the larger
        return 50

    def reset(self, key) -> Tuple[SampleEnvState, TimeStep]:
        state = SampleEnvState(pos=jnp.asarray(4, jnp.int32))
        return state, self.timestep(state.pos)

    def step(self, state: SampleEnvState, action, key) -> Tuple[SampleEnvState, TimeStep]:
        pos = jnp.clip(
            state.pos + jnp.where(action == LEFT, -1, 1), 0, len(_FIELD) - 1
        )
        cell = jnp.asarray(_FIELD, jnp.int32)[pos]
        reward = jnp.where(cell == -1, -1.0, jnp.where(cell == 1, 1.0, self.move_reward))
        terminated = cell != 0
        new_state = SampleEnvState(pos=pos)
        return new_state, self.timestep(pos, reward, terminated)

    # --- host-side helpers ---------------------------------------------------
    def render_terminal(self, state) -> None:
        pos = int(state.pos)
        s = ""
        for x, cell in enumerate(_FIELD):
            s += "P" if x == pos else ("X" if cell == -1 else ("G" if cell == 1 else "."))
        print(s)

    def action_to_str(self, action) -> str:
        return "←" if int(action) == LEFT else "→"

    def get_key_bind(self):
        return {"": LEFT, "a": LEFT, "d": RIGHT}


register("SampleEnv", SampleEnv, move_reward=-0.04)
