"""Turn-based two-player board envs in pure-function form: OX, StoneTaking, Othello.

Semantic parity: srl/envs/ox.py (tic-tac-toe with illegal-move loss, invalid-action
masks, per-player rewards, perfect-play "cpu" opponent), srl/envs/stone_taking.py
(nim-like), srl/envs/othello.py (6x6/8x8 reversi). Turn rotation follows the reference:
``next_player`` flips only while the game is live, and rewards is a [2] vector.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..define import SpaceTypes
from ..spaces import ArrayDiscrete, Box, Discrete
from .core import EnvCore, TimeStep
from .registration import register

# the 8 winning lines of 3x3 tic-tac-toe (srl/envs/ox.py:116-127)
_OX_LINES = np.array(
    [[0, 1, 2], [3, 4, 5], [6, 7, 8], [0, 3, 6], [1, 4, 7], [2, 5, 8], [0, 4, 8], [2, 4, 6]],
    np.int32,
)


@struct.dataclass
class OXState:
    field: jax.Array  # [9] int32 (0 empty, 1 = P1, -1 = P2)
    next_player: jax.Array  # int32


class OX(EnvCore):
    def __init__(self):
        self.W = self.H = 3
        self._lines = jnp.asarray(_OX_LINES)

    @property
    def action_space(self):
        return Discrete(9)

    @property
    def observation_space(self):
        return ArrayDiscrete(9, -1, 1)

    @property
    def player_num(self) -> int:
        return 2

    @property
    def max_episode_steps(self) -> int:
        return 10

    @property
    def reward_baseline(self):
        return [
            {"episode": 200, "players": [None, "random"], "baseline": [0.8, None]},
            {"episode": 200, "players": ["random", None], "baseline": [None, 0.65]},
        ]

    def _obs(self, state: OXState):
        return state.field

    def _ts(self, state: OXState, rewards, terminated):
        return self.timestep(
            self._obs(state),
            rewards,
            terminated,
            invalid_mask=state.field != 0,
            next_player=state.next_player,
        )

    def reset(self, key) -> Tuple[OXState, TimeStep]:
        state = OXState(field=jnp.zeros((9,), jnp.int32), next_player=jnp.asarray(0, jnp.int32))
        return state, self._ts(state, 0.0, False)

    def step(self, state: OXState, action, key) -> Tuple[OXState, TimeStep]:
        mark = jnp.where(state.next_player == 0, 1, -1).astype(jnp.int32)
        illegal = state.field[action] != 0

        field = jnp.where(illegal, state.field, state.field.at[action].set(mark))

        line_vals = field[self._lines]  # [8, 3]
        p1_win = jnp.any(jnp.all(line_vals == 1, axis=1))
        p2_win = jnp.any(jnp.all(line_vals == -1, axis=1))
        full = jnp.all(field != 0)

        # illegal move: mover loses immediately (srl/envs/ox.py:99-105)
        mover_is_p1 = state.next_player == 0
        r_illegal = jnp.where(mover_is_p1, jnp.asarray([-1.0, 0.0]), jnp.asarray([0.0, -1.0]))
        r_win = jnp.where(p1_win, jnp.asarray([1.0, -1.0]), jnp.where(p2_win, jnp.asarray([-1.0, 1.0]), jnp.asarray([0.0, 0.0])))
        rewards = jnp.where(illegal, r_illegal, r_win)

        terminated = illegal | p1_win | p2_win | full
        next_player = jnp.where(terminated, state.next_player, 1 - state.next_player)
        new_state = OXState(field=field, next_player=next_player)
        return new_state, self._ts(new_state, rewards, terminated)

    def render_terminal(self, state):
        f = np.asarray(state.field)
        sym = {1: " o", -1: " x"}
        print("-" * 10)
        for y in range(3):
            print("|" + "|".join(sym.get(int(f[3 * y + x]), f"{3 * y + x:2d}") for x in range(3)) + "|")
            print("-" * 10)


class OXLayer(OX):
    """Two-plane feature-map observation from the mover's perspective
    (srl/envs/ox.py OXLayer)."""

    @property
    def observation_space(self):
        return Box((3, 3, 2), 0, 1, jnp.float32, SpaceTypes.FEATURE_MAP)

    def _obs(self, state: OXState):
        mine = jnp.where(state.next_player == 0, 1, -1)
        grid = state.field.reshape(3, 3)
        return jnp.stack([(grid == mine), (grid == -mine)], axis=-1).astype(jnp.float32)


register("OX", OX)
register("OX-layer", OXLayer)


# ---------------------------------------------------------------------------
# StoneTaking (srl/envs/stone_taking.py): take 1..3 stones; taking the last loses.
# ---------------------------------------------------------------------------
@struct.dataclass
class StoneState:
    field: jax.Array  # int32 stones remaining
    next_player: jax.Array  # int32


class StoneTaking(EnvCore):
    def __init__(self, stones: int = 10, max_stones: int = 3):
        self.stones = int(stones)
        self.max_stones = int(max_stones)

    @property
    def action_space(self):
        return Discrete(self.max_stones)

    @property
    def observation_space(self):
        return Discrete(self.stones + 1)

    @property
    def player_num(self) -> int:
        return 2

    @property
    def max_episode_steps(self) -> int:
        return self.stones

    @property
    def reward_baseline(self):
        return [
            {"episode": 200, "players": [None, "random"], "baseline": [0.9, None]},
            {"episode": 200, "players": ["random", None], "baseline": [None, 0.7]},
        ]

    def _ts(self, state, rewards, terminated):
        return self.timestep(
            state.field, rewards, terminated, next_player=state.next_player
        )

    def reset(self, key) -> Tuple[StoneState, TimeStep]:
        state = StoneState(
            field=jnp.asarray(self.stones, jnp.int32), next_player=jnp.asarray(0, jnp.int32)
        )
        return state, self._ts(state, 0.0, False)

    def step(self, state: StoneState, action, key) -> Tuple[StoneState, TimeStep]:
        take = action + 1
        field = jnp.maximum(state.field - take, 0)
        done = field == 0
        # whoever takes the last stone loses (srl/envs/stone_taking.py:79-86)
        mover_is_p1 = state.next_player == 0
        r = jnp.where(
            done,
            jnp.where(mover_is_p1, jnp.asarray([-1.0, 1.0]), jnp.asarray([1.0, -1.0])),
            jnp.asarray([0.0, 0.0]),
        )
        next_player = 1 - state.next_player
        new_state = StoneState(field=field, next_player=next_player)
        return new_state, self._ts(new_state, r, done)

    def render_terminal(self, state):
        n = int(state.field)
        print(f"{n:3d}: " + "o" * n)


register("StoneTaking", StoneTaking)


# ---------------------------------------------------------------------------
# Othello / Reversi (srl/envs/othello.py) — vectorized flip computation.
# ---------------------------------------------------------------------------
_DIRS = np.array(
    [[-1, -1], [-1, 0], [-1, 1], [0, -1], [0, 1], [1, -1], [1, 0], [1, 1]], np.int32
)


@struct.dataclass
class OthelloState:
    field: jax.Array  # [H*W] int32 (0 empty, 1 P1(black), -1 P2(white))
    next_player: jax.Array  # int32


class Othello(EnvCore):
    """Reversi on an N×N board. Action N*N = pass. Valid-move/flip logic is computed as
    a dense scan along the 8 ray directions (max board dim steps), fully vectorized so
    it vmaps across thousands of boards.
    """

    def __init__(self, size: int = 8):
        self.size = int(size)
        self.cells = self.size * self.size
        # precompute rays: for each cell and direction, the cell indices along the ray
        # (padded with -1 past the edge)
        L = self.size - 1
        rays = np.full((self.cells, 8, max(L, 1)), -1, np.int32)
        for c in range(self.cells):
            y, x = divmod(c, self.size)
            for d, (dy, dx) in enumerate(_DIRS):
                for k in range(1, self.size):
                    ny, nx = y + dy * k, x + dx * k
                    if not (0 <= ny < self.size and 0 <= nx < self.size):
                        break
                    rays[c, d, k - 1] = ny * self.size + nx
        self._rays = jnp.asarray(rays)  # [cells, 8, L]

        # classic positional weights for the "cpu" worker (parity: the eval_field
        # tables in srl/envs/othello.py:446-490 — standard Othello corner/edge values)
        if self.size == 8:
            w = [
                [30, -12, 0, -1, -1, 0, -12, 30],
                [-12, -15, -3, -3, -3, -3, -15, -12],
                [0, -3, 0, -1, -1, 0, -3, 0],
                [-1, -3, -1, -1, -1, -1, -3, -1],
                [-1, -3, -1, -1, -1, -1, -3, -1],
                [0, -3, 0, -1, -1, 0, -3, 0],
                [-12, -15, -3, -3, -3, -3, -15, -12],
                [30, -12, 0, -1, -1, 0, -12, 30],
            ]
        elif self.size == 6:
            w = [
                [30, -12, 0, 0, -12, 30],
                [-12, -15, -3, -3, -15, -12],
                [0, -3, 0, 0, -3, 0],
                [0, -3, 0, 0, -3, 0],
                [-12, -15, -3, -3, -15, -12],
                [30, -12, 0, 0, -12, 30],
            ]
        else:
            w = np.ones((self.size, self.size), np.float32).tolist()
        self._eval_w = jnp.asarray(np.asarray(w, np.float32).reshape(-1))

    @property
    def action_space(self):
        return Discrete(self.cells + 1)  # +1 = pass

    @property
    def observation_space(self):
        return ArrayDiscrete(self.cells, -1, 1)

    @property
    def player_num(self) -> int:
        return 2

    @property
    def max_episode_steps(self) -> int:
        return self.cells + 20

    @property
    def reward_baseline(self):
        return [
            {"episode": 50, "players": [None, "random"], "baseline": [0.1, None]},
            {"episode": 50, "players": ["random", None], "baseline": [None, 0.5]},
        ]

    def _flips(self, field, cell, mark):
        """For a candidate cell, how many stones flip along each ray. Returns
        (flip_mask [cells], num_flipped scalar)."""
        ray_cells = self._rays[cell]  # [8, L]
        valid = ray_cells >= 0
        ray_vals = jnp.where(valid, field[jnp.maximum(ray_cells, 0)], 0)  # [8, L]
        is_opp = valid & (ray_vals == -mark)
        is_mine = valid & (ray_vals == mark)
        # opp_prefix[k] = all cells before k (inclusive) are opponent stones
        opp_prefix = jnp.cumprod(is_opp.astype(jnp.int32), axis=1).astype(bool)  # [8, L]
        # a ray captures up to position k if positions 0..k-1 are all-opponent and k is mine
        prev_all_opp = jnp.concatenate(
            [jnp.ones((8, 1), bool), opp_prefix[:, :-1]], axis=1
        )
        closes = prev_all_opp & is_mine & jnp.concatenate(
            [jnp.zeros((8, 1), bool), opp_prefix[:, :-1]], axis=1
        )  # needs >= 1 opp before the closing stone
        ray_captures = jnp.any(closes, axis=1, keepdims=True)  # [8, 1]
        flip_here = opp_prefix & ray_captures  # [8, L]
        flip_mask = jnp.zeros((self.cells,), bool).at[jnp.maximum(ray_cells, 0)].max(
            flip_here & valid
        )
        return flip_mask, jnp.sum(flip_here & valid)

    def _valid_moves(self, field, mark):
        """Boolean [cells] of playable cells for `mark`."""

        def check(c):
            _, n = self._flips(field, c, mark)
            return (field[c] == 0) & (n > 0)

        return jax.vmap(check)(jnp.arange(self.cells))

    def _mask(self, state):
        mark = jnp.where(state.next_player == 0, 1, -1)
        valid = self._valid_moves(state.field, mark)
        any_valid = jnp.any(valid)
        # pass (last action) is only legal when no move is; board moves invalid if not playable
        invalid = jnp.concatenate([~valid, jnp.asarray([any_valid])])
        return invalid

    def _ts(self, state, rewards, terminated):
        return self.timestep(
            state.field,
            rewards,
            terminated,
            invalid_mask=self._mask(state),
            next_player=state.next_player,
        )

    def reset(self, key) -> Tuple[OthelloState, TimeStep]:
        field = jnp.zeros((self.cells,), jnp.int32)
        h = self.size // 2
        c = lambda y, x: y * self.size + x
        field = field.at[c(h - 1, h - 1)].set(-1).at[c(h, h)].set(-1)
        field = field.at[c(h - 1, h)].set(1).at[c(h, h - 1)].set(1)
        state = OthelloState(field=field, next_player=jnp.asarray(0, jnp.int32))
        return state, self._ts(state, 0.0, False)

    def step(self, state: OthelloState, action, key) -> Tuple[OthelloState, TimeStep]:
        mark = jnp.where(state.next_player == 0, 1, -1).astype(jnp.int32)
        is_pass = action >= self.cells
        cell = jnp.minimum(action, self.cells - 1)
        flip_mask, nflip = self._flips(state.field, cell, mark)
        playable = (state.field[cell] == 0) & (nflip > 0) & (~is_pass)

        field = jnp.where(
            playable,
            jnp.where(flip_mask, mark, state.field).at[cell].set(mark),
            state.field,
        )

        opp_valid = jnp.any(self._valid_moves(field, -mark))
        my_valid = jnp.any(self._valid_moves(field, mark))
        board_full = jnp.all(field != 0)
        terminated = board_full | (~opp_valid & ~my_valid)

        score = jnp.sum(field)
        rewards = jnp.where(
            terminated,
            jnp.where(
                score > 0,
                jnp.asarray([1.0, -1.0]),
                jnp.where(score < 0, jnp.asarray([-1.0, 1.0]), jnp.asarray([0.0, 0.0])),
            ),
            jnp.asarray([0.0, 0.0]),
        )
        # next mover: opponent if they can move, else same player moves again
        next_player = jnp.where(
            terminated,
            state.next_player,
            jnp.where(opp_valid, 1 - state.next_player, state.next_player),
        )
        new_state = OthelloState(field=field, next_player=next_player)
        return new_state, self._ts(new_state, rewards, terminated)

    # --- env worker (parity: make_worker("cpu") negamax, othello.py:404,446) ----
    @property
    def worker_names(self):
        return ("cpu",)

    def _eval_board(self, field, mark):
        """Positional + mobility evaluation from `mark`'s perspective."""
        pos = jnp.sum(self._eval_w * field) * mark
        mob = jnp.sum(self._valid_moves(field, mark)) - jnp.sum(self._valid_moves(field, -mark))
        return pos + 2.0 * mob.astype(jnp.float32)

    def _sim_move(self, field, mark, action):
        """Apply a board move (no pass); returns (field', playable)."""
        cell = jnp.minimum(action, self.cells - 1)
        flip_mask, nflip = self._flips(field, cell, mark)
        playable = (field[cell] == 0) & (nflip > 0) & (action < self.cells)
        field2 = jnp.where(
            playable, jnp.where(flip_mask, mark, field).at[cell].set(mark), field
        )
        return field2, playable

    def worker_policy(self, name: str, state: OthelloState, ts: TimeStep, key):
        """"cpu": 2-ply negamax over the positional/mobility eval. The reference runs
        host-side memoized negamax at depth 2/3/6 by board size; a fixed 2-ply vmapped
        enumeration keeps the opponent jittable so eval matches run on-device."""
        mark = jnp.where(state.next_player == 0, 1, -1).astype(jnp.int32)
        acts = jnp.arange(self.cells + 1)

        def reply_score(f2):
            # opponent's best achievable eval (they pass if moveless)
            def opp(b):
                f3, ok = self._sim_move(f2, -mark, b)
                return jnp.where(ok, self._eval_board(f3, -mark), -jnp.inf)

            scores = jax.vmap(opp)(acts)
            return jnp.where(
                jnp.any(jnp.isfinite(scores)),
                jnp.max(scores),
                self._eval_board(f2, -mark),
            )

        def my_move(a):
            f2, ok = self._sim_move(state.field, mark, a)
            legal = jnp.where(a >= self.cells, ~jnp.any(self._valid_moves(state.field, mark)), ok)
            return jnp.where(legal, -reply_score(f2), -jnp.inf)

        scores = jax.vmap(my_move)(acts)
        scores = jnp.where(ts.invalid_mask, -jnp.inf, scores)
        noise = jax.random.uniform(key, scores.shape) * 1e-3
        return jnp.argmax(scores + noise).astype(jnp.int32)

    def render_terminal(self, state):
        f = np.asarray(state.field).reshape(self.size, self.size)
        sym = {1: "o", -1: "x", 0: "."}
        for row in f:
            print(" ".join(sym[int(v)] for v in row))


class OthelloLayer(Othello):
    """Feature-map observation variant: [H, W, 2] planes (layer0 = the acting
    player's stones, layer1 = the opponent's) from the acting player's perspective
    (parity: srl/envs/othello.py:421-443 OthelloLayer + its Othello*-layer
    registrations :41-67)."""

    @property
    def observation_space(self):
        return Box((self.size, self.size, 2), 0, 1, jnp.uint8, SpaceTypes.FEATURE_MAP)

    def _ts(self, state, rewards, terminated):
        mark = jnp.where(state.next_player == 0, 1, -1)
        board = state.field.reshape(self.size, self.size)
        obs = jnp.stack(
            [(board == mark).astype(jnp.uint8), (board == -mark).astype(jnp.uint8)],
            axis=-1,
        )
        return self.timestep(
            obs,
            rewards,
            terminated,
            invalid_mask=self._mask(state),
            next_player=state.next_player,
        )


register("Othello", Othello, size=8)
register("Othello6x6", Othello, size=6)
register("Othello4x4", Othello, size=4)
register("Othello-layer", OthelloLayer, size=8)
register("Othello6x6-layer", OthelloLayer, size=6)
register("Othello4x4-layer", OthelloLayer, size=4)


# ---------------------------------------------------------------------------
# ConnectX — connect-four on a 6x7 board (parity: srl/envs/kaggle/connectx.py,
# native here instead of wrapping kaggle_environments; obs = flat board with
# 0 empty / 1 P1 / 2 P2, action = column).
# ---------------------------------------------------------------------------
@struct.dataclass
class ConnectXState:
    board: jax.Array  # [rows*cols] int32: 0 empty, 1 P1, 2 P2
    next_player: jax.Array  # int32


class ConnectX(EnvCore):
    def __init__(self, rows: int = 6, columns: int = 7, inarow: int = 4):
        self.rows, self.columns, self.inarow = rows, columns, inarow
        self.cells = rows * columns
        # all winning line index quadruples
        lines = []
        for r in range(rows):
            for c in range(columns):
                for dr, dc in ((0, 1), (1, 0), (1, 1), (1, -1)):
                    rr, cc = r + dr * (inarow - 1), c + dc * (inarow - 1)
                    if 0 <= rr < rows and 0 <= cc < columns:
                        lines.append([(r + dr * k) * columns + (c + dc * k) for k in range(inarow)])
        self._lines = jnp.asarray(np.asarray(lines, np.int32))  # [L, inarow]

    @property
    def action_space(self):
        return Discrete(self.columns)

    @property
    def observation_space(self):
        return ArrayDiscrete(self.cells, 0, 2)

    @property
    def player_num(self) -> int:
        return 2

    @property
    def max_episode_steps(self) -> int:
        return self.cells + 2

    @property
    def reward_baseline(self):
        return [
            {"episode": 100, "players": [None, "random"], "baseline": [0.7, None]},
            {"episode": 100, "players": ["random", None], "baseline": [None, 0.7]},
        ]

    def _mask(self, board):
        # a column is playable while its TOP cell (row 0) is empty
        return board[: self.columns] != 0

    def _ts(self, state, rewards, terminated):
        return self.timestep(
            state.board, rewards, terminated,
            invalid_mask=self._mask(state.board),
            next_player=state.next_player,
        )

    def reset(self, key) -> Tuple["ConnectXState", TimeStep]:
        state = ConnectXState(
            board=jnp.zeros((self.cells,), jnp.int32),
            next_player=jnp.asarray(0, jnp.int32),
        )
        return state, self._ts(state, 0.0, False)

    def step(self, state: "ConnectXState", action, key) -> Tuple["ConnectXState", TimeStep]:
        mark = state.next_player + 1
        col = action
        # lowest empty row in the column
        col_cells = state.board[col + self.columns * jnp.arange(self.rows)]
        empties = col_cells == 0
        # the DEEPEST empty row = last True
        row = jnp.max(jnp.where(empties, jnp.arange(self.rows), -1))
        illegal = row < 0
        cell = jnp.maximum(row, 0) * self.columns + col
        board = jnp.where(illegal, state.board, state.board.at[cell].set(mark))

        line_vals = board[self._lines]  # [L, inarow]
        p1_win = jnp.any(jnp.all(line_vals == 1, axis=1))
        p2_win = jnp.any(jnp.all(line_vals == 2, axis=1))
        full = jnp.all(board != 0)

        mover_is_p1 = state.next_player == 0
        r_illegal = jnp.where(mover_is_p1, jnp.asarray([-1.0, 0.0]), jnp.asarray([0.0, -1.0]))
        r_win = jnp.where(
            p1_win, jnp.asarray([1.0, -1.0]),
            jnp.where(p2_win, jnp.asarray([-1.0, 1.0]), jnp.asarray([0.0, 0.0])),
        )
        rewards = jnp.where(illegal, r_illegal, r_win)
        terminated = illegal | p1_win | p2_win | full
        next_player = jnp.where(terminated, state.next_player, 1 - state.next_player)
        new_state = ConnectXState(board=board, next_player=next_player)
        return new_state, self._ts(new_state, rewards, terminated)

    def render_terminal(self, state):
        b = np.asarray(state.board).reshape(self.rows, self.columns)
        sym = {0: ".", 1: "o", 2: "x"}
        for row in b:
            print(" ".join(sym[int(v)] for v in row))
        print(" ".join(str(c) for c in range(self.columns)))


class ConnectXLayer(ConnectX):
    """Feature-map observation variant: [columns, rows, 2] planes (layer0 = acting
    player's pieces, layer1 = opponent's), matching the reference's transposed
    layer layout (parity: srl/envs/kaggle/connectx.py:105-128 LayerProcessor +
    the connectx-layer registration :18-30)."""

    @property
    def observation_space(self):
        return Box((self.columns, self.rows, 2), 0, 1, jnp.uint8, SpaceTypes.FEATURE_MAP)

    def _ts(self, state, rewards, terminated):
        my = state.next_player + 1
        board = state.board.reshape(self.rows, self.columns).T  # [columns, rows]
        obs = jnp.stack(
            [(board == my).astype(jnp.uint8), (board == (3 - my)).astype(jnp.uint8)],
            axis=-1,
        )
        return self.timestep(
            obs, rewards, terminated,
            invalid_mask=self._mask(state.board),
            next_player=state.next_player,
        )


register("ConnectX", ConnectX)
register("connectx-layer", ConnectXLayer)
