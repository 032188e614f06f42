"""Grid world family as pure-function envs.

Semantic parity with the reference Grid (srl/envs/grid.py:91-378): same field layout,
same stochastic transition model (move succeeds with ``move_prob``, otherwise slips
perpendicular with equal probability — srl/envs/grid.py:121-146), same rewards
(move -0.04, goal +1, hole -1) and 50-step cap, and the same registered variants
(Grid / EasyGrid / GridOneRoad / *-layer — srl/envs/grid.py:22-81). The dynamics are a
table-driven gather so thousands of instances step in lockstep under vmap on TPU.
Also exposes the value-iteration helpers (calc_state_values / calc_action_values,
srl/envs/grid.py:382-446) as vectorized numpy for tests.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..define import SpaceTypes
from ..spaces import ArrayDiscrete, Box, Discrete
from .core import EnvCore, TimeStep
from .registration import register

# actions (same ordering as the reference enum, srl/envs/grid.py:84)
LEFT, DOWN, RIGHT, UP = 0, 1, 2, 3
_DX = np.array([-1, 0, 1, 0], np.int32)
_DY = np.array([0, 1, 0, -1], np.int32)

DEFAULT_FIELD = [
    [9, 9, 9, 9, 9, 9],
    [9, 0, 0, 0, 1, 9],
    [9, 0, 9, 0, -1, 9],
    [9, 2, 0, 0, 0, 9],
    [9, 9, 9, 9, 9, 9],
]


@struct.dataclass
class GridState:
    pos: jax.Array  # [2] int32 (x, y)
    facing: jax.Array  # int32, last actual move (render only)


class Grid(EnvCore):
    def __init__(
        self,
        move_prob: float = 0.8,
        move_reward: float = -0.04,
        goal_reward: float = 1.0,
        hole_reward: float = -1.0,
        field: Optional[List[List[int]]] = None,
        reward_baseline_: Optional[dict] = None,
    ):
        self.move_prob = float(move_prob)
        self.move_reward = float(move_reward)
        self.goal_reward = float(goal_reward)
        self.hole_reward = float(hole_reward)
        self.field = np.asarray(field if field is not None else DEFAULT_FIELD, np.int32)
        self.H, self.W = self.field.shape
        self._baseline = reward_baseline_ or {"episode": 100, "baseline": 0.65}

        starts = np.argwhere(self.field == 2)  # [K, 2] (y, x)
        assert len(starts) > 0, "field needs at least one '2' start cell"
        self.start_xy = np.stack([starts[:, 1], starts[:, 0]], axis=1).astype(np.int32)

        # action -> distribution over actual moves (srl/envs/grid.py:121-146)
        p, q = self.move_prob, (1.0 - self.move_prob) / 2.0
        probs = np.zeros((4, 4), np.float32)
        for a in range(4):
            probs[a, a] = p
            for b in range(4):
                if _DX[b] == -_DX[a] and _DY[b] == -_DY[a]:
                    continue  # never moves backwards
                if b != a:
                    probs[a, b] = q
        self.action_probs = probs

        # precomputed move table: for (y, x, move) -> next (x, y) after bounds+wall check
        nxt = np.zeros((self.H, self.W, 4, 2), np.int32)
        for y in range(self.H):
            for x in range(self.W):
                for a in range(4):
                    nx, ny = x + _DX[a], y + _DY[a]
                    if not (0 <= nx < self.W and 0 <= ny < self.H) or self.field[ny, nx] == 9:
                        nx, ny = x, y
                    nxt[y, x, a] = (nx, ny)
        # flat [(H*W*4), 2] layout: one linear-index gather under vmap (a (y,x,a)
        # triple-index lowers to a batched gather that broadcasts the whole table
        # per env — 19% of the DQN/Grid chunk time on TPU before flattening)
        self._move_tbl = jnp.asarray(nxt.reshape(-1, 2))
        self._field_dev = jnp.asarray(self.field.reshape(-1))
        self._log_probs = jnp.log(jnp.asarray(np.maximum(probs, 1e-30)))
        self._starts_dev = jnp.asarray(self.start_xy)

    # --- metadata ---------------------------------------------------------
    @property
    def action_space(self):
        return Discrete(4)

    @property
    def observation_space(self):
        return ArrayDiscrete(2, low=0, high=(self.W - 1, self.H - 1))

    @property
    def max_episode_steps(self) -> int:
        return 50

    @property
    def reward_baseline(self):
        return self._baseline

    # --- dynamics ---------------------------------------------------------
    def _obs(self, state: GridState):
        return state.pos

    def reset(self, key) -> Tuple[GridState, TimeStep]:
        idx = jax.random.randint(key, (), 0, len(self.start_xy))
        state = GridState(pos=self._starts_dev[idx], facing=jnp.asarray(DOWN, jnp.int32))
        return state, self.timestep(self._obs(state))

    def step(self, state: GridState, action, key) -> Tuple[GridState, TimeStep]:
        move = jax.random.categorical(key, self._log_probs[action]).astype(jnp.int32)
        new_pos = self._move_tbl[(state.pos[1] * self.W + state.pos[0]) * 4 + move]
        cell = self._field_dev[new_pos[1] * self.W + new_pos[0]]
        reward = jnp.where(
            cell == 1, self.goal_reward, jnp.where(cell == -1, self.hole_reward, self.move_reward)
        )
        terminated = jnp.logical_or(cell == 1, cell == -1)
        new_state = GridState(pos=new_pos, facing=move)
        return new_state, self.timestep(self._obs(new_state), reward, terminated)

    # --- host helpers -----------------------------------------------------
    def render_terminal(self, state) -> None:
        px, py = (int(v) for v in np.asarray(state.pos))
        chars = {0: " ", 1: "G", 2: "S", -1: "X", 9: "."}
        for y in range(self.H):
            row = "".join(
                "P" if (x, y) == (px, py) else chars.get(int(self.field[y, x]), "?")
                for x in range(self.W)
            )
            print(row)

    def action_to_str(self, action) -> str:
        return {0: "←", 1: "↓", 2: "→", 3: "↑"}.get(int(action), str(action))

    # --- exact planning helpers (host-side; parity srl/envs/grid.py:382-446) ----
    def _move_host(self, x, y, a):
        nx, ny = x + int(_DX[a]), y + int(_DY[a])
        if not (0 <= nx < self.W and 0 <= ny < self.H) or self.field[ny, nx] == 9:
            return x, y
        return nx, ny

    def _reward_done(self, x, y):
        c = int(self.field[y, x])
        if c == 1:
            return self.goal_reward, True
        if c == -1:
            return self.hole_reward, True
        return self.move_reward, False

    def calc_state_values(self, discount: float = 0.9, threshold: float = 1e-6):
        V = np.zeros((self.H, self.W), np.float64)
        walkable = np.isin(self.field, (0, 2))
        for _ in range(100):
            delta = 0.0
            for y in range(self.H):
                for x in range(self.W):
                    if not walkable[y, x]:
                        continue
                    qs = []
                    for a in range(4):
                        r = 0.0
                        for b in range(4):
                            prob = float(self.action_probs[a, b])
                            if prob == 0.0:
                                continue
                            nx, ny = self._move_host(x, y, b)
                            rew, done = self._reward_done(nx, ny)
                            gain = rew if done else rew + discount * V[ny, nx]
                            r += prob * gain
                        qs.append(r)
                    m = max(qs)
                    delta = max(delta, abs(V[y, x] - m))
                    V[y, x] = m
            if delta < threshold:
                break
        return V

    def calc_action_values(self, discount: float = 0.9, threshold: float = 1e-6):
        V = self.calc_state_values(discount, threshold)
        Q = np.zeros((self.H, self.W, 4), np.float64)
        for y in range(self.H):
            for x in range(self.W):
                if not np.isin(self.field[y, x], (0, 2)):
                    continue
                for a in range(4):
                    r = 0.0
                    for b in range(4):
                        prob = float(self.action_probs[a, b])
                        if prob == 0.0:
                            continue
                        nx, ny = self._move_host(x, y, b)
                        rew, done = self._reward_done(nx, ny)
                        gain = rew if done else rew + discount * V[ny, nx]
                        r += prob * gain
                    Q[y, x, a] = r
        return Q


class GridLayer(Grid):
    """Feature-map observation variant (parity: srl/envs/grid.py:676-697)."""

    @property
    def observation_space(self):
        return Box((self.H, self.W, 1), 0, 1, jnp.uint8, SpaceTypes.FEATURE_MAP)

    def _obs(self, state: GridState):
        one_hot = jnp.zeros((self.H, self.W, 1), jnp.uint8)
        return one_hot.at[state.pos[1], state.pos[0], 0].set(1)


# --- registrations (parity: srl/envs/grid.py:22-81) -------------------------
register("Grid", Grid, move_reward=-0.04, move_prob=0.8,
         reward_baseline_={"episode": 100, "baseline": 0.65})
register("Grid-layer", GridLayer, move_reward=-0.04, move_prob=0.8,
         reward_baseline_={"episode": 100, "baseline": 0.65})
register("EasyGrid", Grid, move_reward=0.0, move_prob=1.0,
         reward_baseline_={"episode": 100, "baseline": 0.9})
register("EasyGrid-layer", GridLayer, move_reward=0.0, move_prob=1.0,
         reward_baseline_={"episode": 100, "baseline": 0.9})
register(
    "GridOneRoad",
    Grid,
    move_reward=0.0,
    move_prob=1.0,
    hole_reward=0.0,
    field=[
        [2, 0, -1, 0, 0, 0, -1, 0, 1],
        [0, 0, -1, 0, -1, 0, -1, 0, 0],
        [0, 0, 0, 0, -1, 0, 0, 0, 0],
    ],
)
