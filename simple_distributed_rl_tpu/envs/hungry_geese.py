"""HungryGeese — native TPU implementation (parity: srl/envs/kaggle/hungry_geese.py,
which wraps ``kaggle_environments``'s hungry_geese; here the rules are implemented as
a pure-JAX env so thousands of matches run vectorized on-device).

Rules (kaggle configuration: 7x11 torus, hunger_rate=40, episodeSteps=200, min_food=2):
geese move N/E/S/W simultaneously each round; eating food grows the goose and the food
respawns; every 40th round every goose loses a tail segment (starving at length 0);
after moving, a goose dies if it reversed into its own neck, or its head lands on any
body segment, or two heads share a cell. The episode ends when at most one goose is
alive or after 200 rounds.

The simultaneous round is expressed turn-based for the engine: each alive goose picks
its action on its turn (observation parity: the reference's encode_obs field layout —
0 empty, 1..4 goose bodies, 9 food); once all alive geese chose, the world advances.
Final rewards are rank-based in [-1, 1] by (survival round, length) — the ranking
the kaggle scorer induces with its cumulative (step, length) reward.

An env-provided "greedy" worker (parity: make_worker("greedy") wrapping kaggle's
greedy_agent) chases the nearest food while avoiding immediately fatal cells.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..define import SpaceTypes
from ..spaces import ArrayDiscrete
from ..spaces import Discrete
from .core import EnvCore, TimeStep
from .registration import register

ROWS, COLS = 7, 11
CELLS = ROWS * COLS
MAXB = CELLS  # body length bound
HUNGER_RATE = 40
MAX_ROUNDS = 200
N_FOOD = 2
NORTH, EAST, SOUTH, WEST = 0, 1, 2, 3
_OPPOSITE = jnp.asarray([SOUTH, WEST, NORTH, EAST], jnp.int32)


def _move(cell, action):
    r, c = cell // COLS, cell % COLS
    r = jnp.where(action == NORTH, (r - 1) % ROWS, jnp.where(action == SOUTH, (r + 1) % ROWS, r))
    c = jnp.where(action == EAST, (c + 1) % COLS, jnp.where(action == WEST, (c - 1) % COLS, c))
    return r * COLS + c


def _torus_dist(a, b):
    ra, ca = a // COLS, a % COLS
    rb, cb = b // COLS, b % COLS
    dr = jnp.abs(ra - rb)
    dc = jnp.abs(ca - cb)
    return jnp.minimum(dr, ROWS - dr) + jnp.minimum(dc, COLS - dc)


@struct.dataclass
class GeeseState:
    bodies: jax.Array  # [P, MAXB] int32 cell index, -1 pad; head at column 0
    length: jax.Array  # [P] int32
    alive: jax.Array  # [P] bool
    prev_action: jax.Array  # [P] int32, -1 before the first move
    pending_action: jax.Array  # [P] int32 actions chosen this round
    acted: jax.Array  # [P] bool
    food: jax.Array  # [N_FOOD] int32
    round: jax.Array  # int32 completed world rounds
    death_round: jax.Array  # [P] int32 (MAX_ROUNDS+1 while alive)
    death_length: jax.Array  # [P] int32 length when death was recorded
    next_player: jax.Array  # int32


class HungryGeese(EnvCore):
    def __init__(self, player_num: int = 4):
        self._player_num = int(player_num)
        assert 2 <= self._player_num <= 4

    @property
    def action_space(self):
        return Discrete(4)

    @property
    def observation_space(self):
        # field layout parity: srl/envs/kaggle/hungry_geese.py FieldType (0 empty,
        # 1..P goose bodies, 9 food)
        return ArrayDiscrete(CELLS, 0, 9)

    @property
    def player_num(self) -> int:
        return self._player_num

    @property
    def max_episode_steps(self) -> int:
        return MAX_ROUNDS * self._player_num + self._player_num

    @property
    def worker_names(self) -> Tuple[str, ...]:
        return ("greedy",)

    # --- helpers -------------------------------------------------------------
    def _occupancy(self, state: GeeseState):
        """[CELLS] int32 count of live body segments per cell."""
        P = self._player_num
        valid = (jnp.arange(MAXB)[None, :] < state.length[:, None]) & state.alive[:, None]
        cells = jnp.where(valid, state.bodies, CELLS)  # park padding off-board
        return jnp.zeros((CELLS + 1,), jnp.int32).at[cells.reshape(-1)].add(1)[:CELLS]

    def _obs(self, state: GeeseState):
        P = self._player_num
        field = jnp.zeros((CELLS,), jnp.int32)
        for p in range(P):  # static tiny loop
            valid = (jnp.arange(MAXB) < state.length[p]) & state.alive[p]
            cells = jnp.where(valid, state.bodies[p], CELLS)
            field = field.at[cells].set(p + 1, mode="drop")
        field = field.at[state.food].set(9)
        return field

    def _invalid(self, state: GeeseState, player):
        pa = state.prev_action[player]
        mask = jnp.zeros((4,), bool)
        return jnp.where(pa >= 0, mask.at[_OPPOSITE[pa % 4]].set(True), mask)

    def _ts(self, state: GeeseState, rewards=None, terminated=False):
        return self.timestep(
            self._obs(state),
            rewards if rewards is not None else jnp.zeros((self._player_num,)),
            terminated,
            invalid_mask=self._invalid(state, state.next_player),
            next_player=state.next_player,
        )

    def _spawn_food(self, state: GeeseState, eaten_mask, key):
        """Respawn each eaten food on a uniformly random empty cell."""
        occ = self._occupancy(state) > 0

        def one(i, carry):
            food, k = carry
            k, k2 = jax.random.split(k)
            blocked = occ | jnp.zeros((CELLS,), bool).at[food].set(True)
            logits = jnp.where(blocked, -jnp.inf, 0.0)
            new = jax.random.categorical(k2, logits).astype(jnp.int32)
            food = jnp.where(eaten_mask[i], food.at[i].set(new), food)
            return (food, k)

        food, _ = jax.lax.fori_loop(0, N_FOOD, one, (state.food, key))
        return food

    # --- core ------------------------------------------------------------------
    def reset(self, key) -> Tuple[GeeseState, TimeStep]:
        P = self._player_num
        k1, k2 = jax.random.split(key)
        # P distinct start cells + N_FOOD distinct food cells
        picks = jax.random.choice(k1, CELLS, shape=(P + N_FOOD,), replace=False)
        bodies = jnp.full((P, MAXB), -1, jnp.int32).at[:, 0].set(picks[:P])
        state = GeeseState(
            bodies=bodies,
            length=jnp.ones((P,), jnp.int32),
            alive=jnp.ones((P,), bool),
            prev_action=jnp.full((P,), -1, jnp.int32),
            pending_action=jnp.zeros((P,), jnp.int32),
            acted=jnp.zeros((P,), bool),
            food=picks[P:],
            round=jnp.asarray(0, jnp.int32),
            death_round=jnp.full((P,), MAX_ROUNDS + 1, jnp.int32),
            death_length=jnp.ones((P,), jnp.int32),
            next_player=jnp.asarray(0, jnp.int32),
        )
        return state, self._ts(state)

    def _advance_round(self, state: GeeseState, key) -> GeeseState:
        """All alive geese chose: resolve the simultaneous move."""
        P = self._player_num
        act = state.pending_action
        heads = state.bodies[:, 0]
        new_heads = jax.vmap(_move)(heads, act)

        # reversing into the neck is fatal (kaggle: last_action opposite)
        reversed_ = (state.prev_action >= 0) & (act == _OPPOSITE[state.prev_action % 4])

        ate = jnp.zeros((P,), bool)
        food_eaten = jnp.zeros((N_FOOD,), bool)
        for i in range(N_FOOD):
            hit = (new_heads == state.food[i]) & state.alive
            ate = ate | hit
            food_eaten = food_eaten.at[i].set(jnp.any(hit))
        ate = ate & state.alive

        # hunger tick AFTER the move on every HUNGER_RATE-th round (kaggle semantics)
        hunger = (state.round + 1) % HUNGER_RATE == 0

        # body shift: insert new head, keep tail iff grew
        new_bodies = jnp.concatenate([new_heads[:, None], state.bodies[:, :-1]], 1)
        new_len = state.length + ate.astype(jnp.int32) - jnp.where(hunger, 1, 0)
        new_len = jnp.clip(new_len, 0, MAXB)
        starved = state.alive & (new_len <= 0)
        col = jnp.arange(MAXB)[None, :]
        new_bodies = jnp.where(col < new_len[:, None], new_bodies, -1)

        # collisions on the post-move board (kaggle: heads vs all body segments
        # except heads; head-on-head both die)
        alive0 = state.alive
        seg_valid = (col >= 1) & (col < new_len[:, None]) & alive0[:, None]
        seg_cells = jnp.where(seg_valid, new_bodies, CELLS)
        seg_occ = jnp.zeros((CELLS + 1,), jnp.int32).at[seg_cells.reshape(-1)].add(1)[:CELLS]
        head_cells = jnp.where(alive0, new_heads, CELLS)
        head_occ = jnp.zeros((CELLS + 1,), jnp.int32).at[head_cells].add(1)[:CELLS]
        hit_body = seg_occ[new_heads] > 0
        hit_head = head_occ[jnp.clip(new_heads, 0, CELLS - 1)] > 1
        died = alive0 & (reversed_ | starved | hit_body | hit_head)
        alive = alive0 & ~died

        this_round = state.round + 1
        death_round = jnp.where(died, this_round, state.death_round)
        death_length = jnp.where(died, jnp.maximum(new_len, 1), state.death_length)
        # survivors of a finished game score as if they lived past everyone
        state = state.replace(
            bodies=new_bodies,
            length=jnp.where(alive, new_len, 0),
            alive=alive,
            prev_action=jnp.where(alive0, act, state.prev_action),
            acted=jnp.zeros((P,), bool),
            round=this_round,
            death_round=death_round,
            death_length=death_length,
        )
        food = self._spawn_food(state, food_eaten, key)
        return state.replace(food=food)

    def _final_rewards(self, state: GeeseState) -> jax.Array:
        """Rank geese by (survival round, length) -> rewards in [-1, 1]."""
        P = self._player_num
        final_len = jnp.where(state.alive, state.length, state.death_length)
        score = state.death_round * (MAXB + 1) + final_len
        better = (score[None, :] > score[:, None]).sum(1)  # geese strictly above me
        worse = (score[None, :] < score[:, None]).sum(1)
        return (worse - better).astype(jnp.float32) / max(P - 1, 1)

    def step(self, state: GeeseState, action, key) -> Tuple[GeeseState, TimeStep]:
        P = self._player_num
        p = state.next_player
        state = state.replace(
            pending_action=state.pending_action.at[p].set(jnp.asarray(action, jnp.int32)),
            acted=state.acted.at[p].set(True),
        )
        all_acted = jnp.all(~state.alive | state.acted)
        state = jax.lax.cond(
            all_acted, lambda s: self._advance_round(s, key), lambda s: s, state
        )
        # next alive goose that has not acted yet this round
        cand = (jnp.arange(P) + p + 1) % P
        ok = state.alive[cand] & ~state.acted[cand]
        nxt = cand[jnp.argmax(ok)]
        state = state.replace(next_player=jnp.where(jnp.any(ok), nxt, p).astype(jnp.int32))

        terminated = (state.alive.sum() <= 1) | (state.round >= MAX_ROUNDS)
        rewards = jnp.where(terminated, self._final_rewards(state), jnp.zeros((P,)))
        return state, self._ts(state, rewards, terminated)

    # --- env workers -----------------------------------------------------------
    def worker_policy(self, name: str, state: GeeseState, ts: TimeStep, key):
        """"greedy" (parity: kaggle greedy_agent): move toward the nearest food,
        never into a currently-occupied cell or a reverse move."""
        p = state.next_player
        head = state.bodies[p, 0]
        occ = self._occupancy(state) > 0
        acts = jnp.arange(4, dtype=jnp.int32)
        nxt = jax.vmap(lambda a: _move(head, a))(acts)
        food_d = jax.vmap(lambda c: jnp.min(jax.vmap(lambda f: _torus_dist(c, f))(state.food)))(nxt)
        unsafe = occ[nxt] | self._invalid(state, p)
        score = -food_d.astype(jnp.float32) - 1000.0 * unsafe.astype(jnp.float32)
        noise = jax.random.uniform(key, (4,)) * 0.1
        return jnp.argmax(score + noise).astype(jnp.int32)

    # --- host-side helpers -------------------------------------------------------
    def render_terminal(self, state) -> None:
        import numpy as np

        field = np.asarray(self._obs(state)).reshape(ROWS, COLS)
        heads = {int(state.bodies[i, 0]): i for i in range(self._player_num) if bool(state.alive[i])}
        out = []
        for r in range(ROWS):
            row = ""
            for c in range(COLS):
                cell = r * COLS + c
                v = field[r, c]
                if cell in heads:
                    row += chr(ord("A") + heads[cell])
                elif v == 9:
                    row += "*"
                elif v == 0:
                    row += "."
                else:
                    row += str(v)
            out.append(row)
        print("\n".join(out))
        print(f"round {int(state.round)} alive={np.asarray(state.alive).tolist()}")

    def action_to_str(self, action) -> str:
        return ["N", "E", "S", "W"][int(action) % 4]


register("hungry_geese", HungryGeese, player_num=4)
