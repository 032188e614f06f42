"""OneRoad / IGrid / Tiger — small deterministic/POMDP envs, pure-function form.

Semantic parity: srl/envs/oneroad.py (OneRoad, OneRoad-hard), srl/envs/igrid.py (IGrid
key/goal switching), srl/envs/tiger.py (classic Tiger POMDP with noisy listen).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..spaces import ArrayDiscrete, Discrete
from .core import EnvCore, TimeStep
from .registration import register


@struct.dataclass
class OneRoadState:
    pos: jax.Array  # int32


class OneRoad(EnvCore):
    """Walk straight: action 0 advances, anything else ends (or restarts)
    (srl/envs/oneroad.py:26-78)."""

    def __init__(self, N: int = 10, action: int = 2, is_end: bool = True):
        self.N = int(N)
        self.n_action = int(action)
        self.is_end = bool(is_end)

    @property
    def action_space(self):
        return Discrete(self.n_action)

    @property
    def observation_space(self):
        return Discrete(self.N + 1)

    @property
    def max_episode_steps(self) -> int:
        return int(self.N * 1.1)

    @property
    def reward_baseline(self):
        return {"episode": 100, "baseline": 1.0}

    def reset(self, key) -> Tuple[OneRoadState, TimeStep]:
        state = OneRoadState(pos=jnp.asarray(0, jnp.int32))
        return state, self.timestep(state.pos)

    def step(self, state: OneRoadState, action, key) -> Tuple[OneRoadState, TimeStep]:
        fwd = action == 0
        if self.is_end:
            pos = jnp.where(fwd, state.pos + 1, state.pos)
            terminated_wrong = jnp.logical_not(fwd)
        else:
            pos = jnp.where(fwd, state.pos + 1, 0)
            terminated_wrong = jnp.asarray(False)
        goal = pos == self.N
        reward = jnp.where(jnp.logical_and(goal, jnp.logical_not(terminated_wrong)), 1.0, 0.0)
        terminated = jnp.logical_or(goal, terminated_wrong)
        new_state = OneRoadState(pos=pos)
        return new_state, self.timestep(pos, reward, terminated)

    def render_terminal(self, state):
        print(f"{int(state.pos)} / {self.N}")


register("OneRoad", OneRoad, N=10, action=2, is_end=True)
register("OneRoad-hard", OneRoad, N=20, action=16, is_end=False)


# ---------------------------------------------------------------------------
# IGrid — corridor with keys that decide which end is the goal (srl/envs/igrid.py)
# ---------------------------------------------------------------------------
LEFT, DOWN, RIGHT, UP = 0, 1, 2, 3
_DX = np.array([-1, 0, 1, 0], np.int32)
_DY = np.array([0, 1, 0, -1], np.int32)


@struct.dataclass
class IGridState:
    pos: jax.Array  # [2] int32 (x, y)
    key_state: jax.Array  # int32: 0=no key, 1=took A (goal at C), 2=took B (goal at D)


class IGrid(EnvCore):
    """POMDP corridor: obs is position only; which end rewards +1 depends on which key
    cell was visited (srl/envs/igrid.py:33-140). Cell codes in the static field:
    0=wall, 1=path, 2=keyA, 3=keyB; ends become goal(+1)/hole(-1) per key_state."""

    def __init__(self, N: int = 0):
        self.N = int(N)
        self.length = self.N * 2 + 1
        self.W = 3
        self.H = self.length + 2
        field = [[1, 1, 1]] + [[0, 1, 0]] * self.length + [[2, 1, 3]]
        self.field = np.asarray(field, np.int32)
        # flat layout: single linear-index gather under vmap (no per-env broadcast)
        self._field_dev = jnp.asarray(self.field.reshape(-1))
        self.start = (1, (self.H - 1) // 2)

    @property
    def action_space(self):
        return Discrete(4)

    @property
    def observation_space(self):
        return ArrayDiscrete(2, 0, (self.W, self.H))

    @property
    def max_episode_steps(self) -> int:
        return (self.length + 2) * 2 * 2

    @property
    def reward_baseline(self):
        return {"episode": 100, "baseline": 1.0}

    def reset(self, key) -> Tuple[IGridState, TimeStep]:
        state = IGridState(
            pos=jnp.asarray(self.start, jnp.int32), key_state=jnp.asarray(0, jnp.int32)
        )
        return state, self.timestep(state.pos)

    def step(self, state: IGridState, action, key) -> Tuple[IGridState, TimeStep]:
        x = state.pos[0] + jnp.asarray(_DX)[action]
        y = state.pos[1] + jnp.asarray(_DY)[action]
        in_bounds = (x >= 0) & (x < self.W) & (y >= 0) & (y < self.H)
        xc = jnp.clip(x, 0, self.W - 1)
        yc = jnp.clip(y, 0, self.H - 1)
        walkable = in_bounds & (self._field_dev[yc * self.W + xc] != 0)
        nx = jnp.where(walkable, xc, state.pos[0])
        ny = jnp.where(walkable, yc, state.pos[1])

        cell = self._field_dev[ny * self.W + nx]
        key_state = jnp.where(cell == 2, 1, jnp.where(cell == 3, 2, state.key_state))

        # corners: (0,0) is "C", (2,0) is "D" — active only once a key is held
        at_c = (nx == 0) & (ny == 0)
        at_d = (nx == self.W - 1) & (ny == 0)
        goal = ((key_state == 1) & at_c) | ((key_state == 2) & at_d)
        hole = ((key_state == 1) & at_d) | ((key_state == 2) & at_c)
        reward = jnp.where(goal, 1.0, jnp.where(hole, -1.0, 0.0))
        terminated = goal | hole

        new_state = IGridState(pos=jnp.stack([nx, ny]), key_state=key_state)
        return new_state, self.timestep(new_state.pos, reward, terminated)


register("IGrid", IGrid, N=0)


# ---------------------------------------------------------------------------
# Tiger POMDP (srl/envs/tiger.py)
# ---------------------------------------------------------------------------
CHECK, T_LEFT, T_RIGHT = 0, 1, 2


@struct.dataclass
class TigerState:
    tiger: jax.Array  # int32 0=left 1=right
    obs: jax.Array  # int32 last observed hint


class Tiger(EnvCore):
    def __init__(self, prob: float = 0.85, max_episode: int = 50):
        self.prob = float(prob)
        self.max_episode = int(max_episode)

    @property
    def action_space(self):
        return Discrete(3)

    @property
    def observation_space(self):
        return Discrete(2)

    @property
    def max_episode_steps(self) -> int:
        return self.max_episode

    @property
    def reward_baseline(self):
        return {"episode": 1000, "baseline": 0.0}

    def reset(self, key) -> Tuple[TigerState, TimeStep]:
        k1, k2 = jax.random.split(key)
        state = TigerState(
            tiger=jax.random.randint(k1, (), 0, 2, jnp.int32),
            obs=jax.random.randint(k2, (), 0, 2, jnp.int32),
        )
        return state, self.timestep(state.obs)

    def step(self, state: TigerState, action, key) -> Tuple[TigerState, TimeStep]:
        correct = jax.random.uniform(key) < self.prob
        heard = jnp.where(correct, state.tiger, 1 - state.tiger)

        is_check = action == CHECK
        # opening a door: reward -1 if tiger behind it, else +0.1
        opened_left = action == T_LEFT
        tiger_left = state.tiger == 0
        open_reward = jnp.where(opened_left == tiger_left, -1.0, 0.1)

        reward = jnp.where(is_check, -0.01, open_reward)
        terminated = jnp.logical_not(is_check)
        obs = jnp.where(is_check, heard, state.tiger).astype(jnp.int32)
        new_state = TigerState(tiger=state.tiger, obs=obs)
        return new_state, self.timestep(obs, reward, terminated)


register("Tiger", Tiger)
