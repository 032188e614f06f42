"""MCTS (parity: srl/algorithms/mcts.py — UCT search with global state-keyed N/W
statistics, expansion threshold with random rollouts, enemy-turn sign flip, final
action = max visit count).

TPU re-design: the reference simulates by env.backup()/restore() with a python
recursion and dict tables (mcts.py:88-186). Here the env is a pure function, so a
"backup" is just holding the state pytree: each simulation is a bounded
walk-down/rollout/backup loop under jit, vmapped over ALL envs simultaneously — B
parallel tree searches per policy call, with N/W as dense [S, A] device tables
(the scatter-add merge across envs is the jit analog of the reference's
update_parameter_from_worker merge, mcts.py:32-33,66-67).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..define import RLBaseTypes
from ..utils import rl_functions as funcs
from .base import AlgoConfig, PolicyContext, Transition

Array = jax.Array


@struct.dataclass
class MCTSState:
    N: Array  # [S, A] visit counts
    W: Array  # [S, A] total value
    train_count: Array


@dataclasses.dataclass
class MCTSConfig(AlgoConfig):
    num_simulations: int = 10
    expansion_threshold: int = 5
    discount: float = 1.0
    uct_c: float = float(np.sqrt(2.0))
    #: max depth of the walk-down phase (defaults to env.max_episode_steps)
    max_depth: int = 0
    #: rollout length cap (defaults to env.max_episode_steps)
    max_rollout: int = 0

    observation_type: RLBaseTypes = RLBaseTypes.DISCRETE
    action_type: RLBaseTypes = RLBaseTypes.DISCRETE

    needs_env_state: bool = True

    def get_name(self) -> str:
        return "MCTS"

    def on_setup(self) -> None:
        self.num_states = self.obs_space.n
        self.A = self.action_space.n
        self._depth = self.max_depth or self.env.max_episode_steps
        self._rollout_len = self.max_rollout or self.env.max_episode_steps

    def init(self, key: Array) -> MCTSState:
        S, A = self.num_states, self.A
        return MCTSState(
            N=jnp.zeros((S, A), jnp.float32),
            W=jnp.zeros((S, A), jnp.float32),
            train_count=jnp.asarray(0, jnp.int32),
        )

    # ------------------------------------------------------------------
    def _uct(self, N_row, W_row, invalid, key):
        """UCT scores for one state (mcts.py:139-159): unvisited = +inf, invalid =
        -inf, else Q + c*sqrt(log(sumN)/n). Random tie-break."""
        total = jnp.maximum(jnp.sum(N_row), 1.0)
        q = W_row / jnp.maximum(N_row, 1.0)
        uct = q + self.uct_c * jnp.sqrt(jnp.log(total) / jnp.maximum(N_row, 1.0))
        uct = jnp.where(N_row == 0, jnp.inf, uct)
        uct = jnp.where(invalid, -jnp.inf, uct)
        return funcs.random_max_index(uct[None], jnp.zeros_like(invalid)[None], key)[0]

    def _state_index(self, obs):
        return self.obs_encoder.encode(obs)

    def _rollout(self, env_state, ts, player0, key):
        """Random playout to episode end; returns the discounted return from player0's
        perspective (mcts.py:163-175)."""

        def cond(c):
            _, ts, _, k, _, _ = c
            return jnp.logical_and(jnp.logical_not(ts.done), k < self._rollout_len)

        def body(c):
            env_state, ts, g, k, disc, key = c
            key, k_a, k_s = jax.random.split(key, 3)
            a = self.env.action_space.sample(k_a, ts.invalid_mask)
            env_state, ts = self.env.step(env_state, a, k_s)
            g = g + disc * ts.rewards[player0]
            return env_state, ts, g, k + 1, disc * self.discount, key

        _, _, g, _, _, _ = jax.lax.while_loop(
            cond, body, (env_state, ts, jnp.asarray(0.0), jnp.asarray(0), jnp.asarray(1.0), key)
        )
        return g

    def _simulate_one(self, N, W, env_state, ts, key):
        """One simulation for one env. Returns (d_N, d_W) scatter deltas [S, A]."""
        D = self._depth
        path_s = jnp.zeros((D,), jnp.int32)
        path_a = jnp.zeros((D,), jnp.int32)
        path_r = jnp.zeros((D,), jnp.float32)
        path_enemy = jnp.zeros((D,), jnp.bool_)
        path_valid = jnp.zeros((D,), jnp.bool_)

        def cond(c):
            (env_state, ts, depth, stop, leaf_reward, key, *_rest) = c
            return jnp.logical_and(jnp.logical_not(stop), depth < D)

        def body(c):
            (env_state, ts, depth, stop, leaf_reward, key, ps, pa, pr, pe, pv) = c
            key, k_uct, k_step, k_roll = jax.random.split(key, 4)
            s = self._state_index(ts.obs)
            a = self._uct(N[s] + jnp.zeros((self.A,)), W[s], ts.invalid_mask, k_uct)
            ps = ps.at[depth].set(s)
            pa = pa.at[depth].set(a)
            pv = pv.at[depth].set(True)

            unexpanded = N[s, a] < self.expansion_threshold
            player = ts.next_player
            n_env_state, n_ts = self.env.step(env_state, self.action_encoder.decode(a), k_step)
            r = n_ts.rewards[player]
            pr = pr.at[depth].set(r)
            pe = pe.at[depth].set(n_ts.next_player != player)

            # rollout value if unexpanded (taken as the leaf); note rollout continues
            # FROM the stepped state, so its return composes with r at this level
            roll = self._rollout(n_env_state, n_ts, player, k_roll)
            leaf = jnp.where(unexpanded, roll, 0.0)

            stop2 = jnp.logical_or(unexpanded, n_ts.done)
            return (n_env_state, n_ts, depth + 1, stop2, jnp.where(stop2, leaf, leaf_reward), key, ps, pa, pr, pe, pv)

        (_, _, depth, _, leaf_reward, _, ps, pa, pr, pe, pv) = jax.lax.while_loop(
            cond,
            body,
            (env_state, ts, jnp.asarray(0), jnp.asarray(False), jnp.asarray(0.0), key,
             path_s, path_a, path_r, path_enemy, path_valid),
        )

        # backup: walk the path backward flipping sign at enemy turns (mcts.py:124-133)
        def back(carry, x):
            g = carry
            s, a, r, enemy, valid = x
            g_here = r + self.discount * jnp.where(enemy, -g, g)
            g_here = jnp.where(valid, g_here, g)
            return g_here, jnp.where(valid, g_here, 0.0)

        _, returns = jax.lax.scan(
            back,
            leaf_reward,
            (ps[::-1], pa[::-1], pr[::-1], pe[::-1], pv[::-1]),
        )
        returns = returns[::-1]

        d_N = jnp.zeros_like(N).at[ps, pa].add(pv.astype(jnp.float32))
        d_W = jnp.zeros_like(W).at[ps, pa].add(returns * pv.astype(jnp.float32))
        return d_N, d_W

    # ------------------------------------------------------------------
    policy_updates_state: bool = True

    def policy(self, state: MCTSState, obs, invalid_mask, ctx: PolicyContext, key):
        """Returns (action, new state): the accumulated N/W statistics ARE the
        parameter (mcts.py:49-67), persisted through the engine's
        policy_updates_state path. Simulations only run while training
        (mcts.py:88-93); ctx.training is trace-time constant, so the eval executable
        contains no search."""
        B = obs.shape[0]
        N, W = state.N, state.W

        if self.num_simulations > 0:
            def one_sim(carry, k):
                N, W = carry
                dN, dW = jax.vmap(
                    lambda es, t, kk: self._simulate_one(N, W, es, t, kk),
                    in_axes=(0, 0, 0),
                )(ctx.env_state, ctx.timestep, jax.random.split(k, B))
                # dp: merge simulation statistics across shards — replicas share one
                # global search tree and stay bit-identical under train_mp
                dN, dW = self.dp_psum(dN.sum(0)), self.dp_psum(dW.sum(0))
                return (N + dN, W + dW), None

            key, k_sims = jax.random.split(key)
            (N2, W2), _ = jax.lax.scan(
                one_sim, (N, W), jax.random.split(k_sims, self.num_simulations)
            )
            N = jnp.where(ctx.training, N2, N)
            W = jnp.where(ctx.training, W2, W)

        counts = N[obs]  # [B, A]
        counts = jnp.where(invalid_mask, -jnp.inf, counts)
        key, k_tie = jax.random.split(key)
        action = funcs.random_max_index(counts, jnp.zeros_like(invalid_mask), k_tie)
        return action, state.replace(N=N, W=W)

    def action_values(self, state: MCTSState, obs):
        """Mean action values W/N for the render overlay (parity: mcts worker
        render printing N and W/N per action)."""
        return state.W[obs] / jnp.maximum(state.N[obs], 1.0)

    def observe(self, state: MCTSState, t: Transition, mask) -> MCTSState:
        return state.replace(train_count=state.train_count + mask.sum().astype(jnp.int32))

    def train(self, state, key, num_steps):
        return state, {"train_count": state.train_count.astype(jnp.float32)}

    def params_of(self, state: MCTSState):
        return {"N": state.N, "W": state.W}

    def restore_params(self, state: MCTSState, p) -> MCTSState:
        return state.replace(N=p["N"], W=p["W"])
