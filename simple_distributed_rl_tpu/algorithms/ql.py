"""Tabular Q-learning (parity: srl/algorithms/ql.py:29-198).

The reference keeps Q as a string-keyed python dict updated one transition at a time
(ql.py:106-132). Here the observation is flattened to a dense state index at trace time
(ArrayDiscrete.flat_index — the TPU-native stand-in for ``to_str``) and Q is a dense
[S, A] device array: ε-greedy with random tie-breaking (ql.py:156-162) runs batched
over all envs, and TD updates are one scatter-add per chunk — thousands of parallel
Q-learners on one table (async Q-learning semantics).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..define import RLBaseTypes
from ..utils import rl_functions as funcs
from ..utils.schedulers import SchedulerConfig
from .base import AlgoConfig, PolicyContext, Transition

Array = jax.Array


@struct.dataclass
class QLState:
    q_table: Array  # [S, A]
    visit: Array  # [S] int32 — state-visit counter (diagnostics; reference info["size"])
    train_count: Array  # int32


@dataclasses.dataclass
class QLConfig(AlgoConfig):
    test_epsilon: float = 0.0
    epsilon: float = 0.1
    epsilon_scheduler: SchedulerConfig = dataclasses.field(default_factory=SchedulerConfig)
    lr: float = 0.1
    lr_scheduler: SchedulerConfig = dataclasses.field(default_factory=SchedulerConfig)
    discount: float = 0.9
    q_init: str = ""  # "" | "random" | "normal"  (parity: ql.py:51)
    # apply TD updates one transition at a time in chunk order (a lax.scan) instead
    # of the batched mean-TD scatter — reference-exact semantics (ql.py:126-127's
    # sequential loop); the right choice at num_envs=1, e.g. the engine-in-the-loop
    # parity harness (parity.run_engine_ql_grid)
    exact_sequential: bool = False

    observation_type: RLBaseTypes = RLBaseTypes.DISCRETE
    action_type: RLBaseTypes = RLBaseTypes.DISCRETE

    def get_name(self) -> str:
        return "QL"

    def on_setup(self) -> None:
        self.num_states = self.obs_space.n
        self._eps_sch = self.epsilon_scheduler.create(self.epsilon)
        self._lr_sch = self.lr_scheduler.create(self.lr)

    # ------------------------------------------------------------------
    def init(self, key: Array) -> QLState:
        S, A = self.num_states, self.action_space.n
        if self.q_init == "random":
            q = jax.random.uniform(key, (S, A))
        elif self.q_init == "normal":
            q = jax.random.normal(key, (S, A))
        else:
            q = jnp.zeros((S, A))
        return QLState(
            q_table=q.astype(jnp.float32),
            visit=jnp.zeros((S,), jnp.int32),
            train_count=jnp.asarray(0, jnp.int32),
        )

    def policy(self, state: QLState, obs, invalid_mask, ctx: PolicyContext, key) -> Array:
        eps = jnp.where(ctx.training, self._eps_sch(ctx.step), self.test_epsilon)
        q = state.q_table[obs]  # [B, A]
        return funcs.epsilon_greedy(q, invalid_mask, eps, key, tie_break=True)

    def action_values(self, state: QLState, obs):
        """Q row for the render overlay (parity: ql worker render, ql.py:190-198)."""
        return state.q_table[obs]

    def observe(self, state: QLState, t: Transition, mask) -> QLState:
        """Batched TD(0) update with invalid-action masking on the next state
        (parity: ql trainer, srl/algorithms/ql.py:106-132)."""
        t, mask = self.flatten_transitions(t, mask)
        lr = self._lr_sch(state.train_count)
        if self.exact_sequential:
            return self._observe_sequential(state, t, mask, lr)
        n_q = state.q_table[t.next_obs]  # [N, A]
        n_q = jnp.where(t.next_invalid_mask, -jnp.inf, n_q)
        max_nq = jnp.max(n_q, axis=-1)
        max_nq = jnp.where(jnp.isfinite(max_nq), max_nq, 0.0)
        target = t.reward + t.undone * self.discount * max_nq
        td = target - state.q_table[t.obs, t.action]
        m = mask.astype(jnp.float32)
        # Thousands of lockstep envs can hit the same (s, a) within one chunk; all their
        # TDs are computed against the same (stale) table, so a raw scatter-add would
        # multiply the learning rate by the visit count and diverge. Normalizing by the
        # per-(s, a) count applies the MEAN td once — the batched-expectation form of
        # the reference's one-at-a-time update (ql.py:126-127).
        A = self.action_space.n
        flat_sa = t.obs * A + t.action
        sum_td = jnp.zeros((self.num_states * A,), jnp.float32).at[flat_sa].add(td * m)
        cnt = jnp.zeros((self.num_states * A,), jnp.float32).at[flat_sa].add(m)
        if self.pmean_axis is not None:
            # data-parallel: global mean TD across shards (replaces trainer-process
            # aggregation, play_mp.py:248-286)
            sum_td, cnt = self.dp_psum((sum_td, cnt))
        mean_td = (sum_td / jnp.maximum(cnt, 1.0)).reshape(self.num_states, A)
        q = state.q_table + lr * mean_td
        visit = state.visit.at[t.obs].add(mask.astype(jnp.int32))
        return QLState(
            q_table=q,
            visit=visit,
            train_count=state.train_count + jnp.sum(mask.astype(jnp.int32)),
        )

    def _observe_sequential(self, state: QLState, t: Transition, mask, lr) -> QLState:
        """One-at-a-time TD updates in transition order (the exact-semantics form of
        the reference trainer loop, ql.py:106-132: each update sees every previous
        update's table)."""

        def upd(q, x):
            obs, action, reward, undone, next_obs, next_inv, m = x
            n_q = jnp.where(next_inv, -jnp.inf, q[next_obs])
            max_nq = jnp.max(n_q)
            max_nq = jnp.where(jnp.isfinite(max_nq), max_nq, 0.0)
            target = reward + undone * self.discount * max_nq
            td = target - q[obs, action]
            return q.at[obs, action].add(lr * td * m), None

        q, _ = jax.lax.scan(
            upd,
            state.q_table,
            (t.obs, t.action, t.reward, t.undone, t.next_obs,
             t.next_invalid_mask, mask.astype(jnp.float32)),
        )
        visit = state.visit.at[t.obs].add(mask.astype(jnp.int32))
        return QLState(
            q_table=q,
            visit=visit,
            train_count=state.train_count + jnp.sum(mask.astype(jnp.int32)),
        )

    def train(self, state: QLState, key, num_steps: int) -> Tuple[QLState, Dict[str, Array]]:
        # learning happens in observe (every transition trains once, like the
        # reference's single-use buffer + per-step trainer); nothing to do here.
        return state, {"train_count": state.train_count.astype(jnp.float32)}

    def params_of(self, state: QLState):
        return state.q_table

    def restore_params(self, state: QLState, params) -> QLState:
        return state.replace(q_table=params)
