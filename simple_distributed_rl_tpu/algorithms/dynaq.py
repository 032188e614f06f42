"""Dyna-Q (parity: srl/algorithms/dynaq.py — Q-learning plus a learned tabular MDP
model (transition counts / mean reward / done rate per (s, a), dynaq.py:60-150) used
for planning updates).

TPU form: the dict-of-dicts model becomes dense device tables — trans [S, A, S]
counts, reward/done/count [S, A] — updated with one scatter per chunk; planning draws
(s, a) from the empirical visit distribution and next states from the model's
categorical row, all vectorized (``planning_interval`` model updates per train call).
Dense S^2 A memory bounds this to small tabular envs, same practical envelope as the
reference's target use (Grid family).
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
class DynaQState:
    q_table: Array  # [S, A]
    trans: Array  # [S, A, S] visit counts
    rew_sum: Array  # [S, A]
    done_cnt: Array  # [S, A]
    cnt: Array  # [S, A]
    train_count: Array


@dataclasses.dataclass
class DynaQConfig(AlgoConfig):
    test_epsilon: float = 0.0
    epsilon: float = 0.1
    epsilon_scheduler: SchedulerConfig = dataclasses.field(default_factory=SchedulerConfig)
    discount: float = 0.9
    lr: float = 0.1
    #: model-based planning updates per train call (the Dyna loop)
    planning_batch: int = 256

    observation_type: RLBaseTypes = RLBaseTypes.DISCRETE
    action_type: RLBaseTypes = RLBaseTypes.DISCRETE

    def get_name(self) -> str:
        return "Dyna-Q"

    def on_setup(self) -> None:
        self.num_states = self.obs_space.n
        self.A = self.action_space.n
        self._eps_sch = self.epsilon_scheduler.create(self.epsilon)
        assert self.num_states * self.num_states * self.A < 50_000_000, (
            "dense Dyna-Q model too large for this state space"
        )

    def init(self, key: Array) -> DynaQState:
        S, A = self.num_states, self.A
        return DynaQState(
            q_table=jnp.zeros((S, A), jnp.float32),
            trans=jnp.zeros((S, A, S), jnp.float32),
            rew_sum=jnp.zeros((S, A), jnp.float32),
            done_cnt=jnp.zeros((S, A), jnp.float32),
            cnt=jnp.zeros((S, A), jnp.float32),
            train_count=jnp.asarray(0, jnp.int32),
        )

    def policy(self, state: DynaQState, obs, invalid_mask, ctx: PolicyContext, key) -> Array:
        eps = jnp.where(ctx.training, self._eps_sch(ctx.step), self.test_epsilon)
        q = state.q_table[obs]
        return funcs.epsilon_greedy(q, invalid_mask, eps, key, tie_break=True)

    def _q_update(self, q, s, a, r, undone, n_s, m):
        n_q = jnp.max(q[n_s], axis=-1)
        target = r + undone * self.discount * n_q
        td = target - q[s, a]
        A = self.A
        flat = s * A + a
        S = self.num_states
        sum_td = jnp.zeros((S * A,), jnp.float32).at[flat].add(td * m)
        cnt = jnp.zeros((S * A,), jnp.float32).at[flat].add(m)
        # dp: global mean TD across shards so learner replicas stay identical
        sum_td, cnt = self.dp_psum(sum_td), self.dp_psum(cnt)
        return q + self.lr * (sum_td / jnp.maximum(cnt, 1.0)).reshape(S, A)

    def observe(self, state: DynaQState, t: Transition, mask) -> DynaQState:
        t, mask = self.flatten_transitions(t, mask)
        m = mask.astype(jnp.float32)
        s, a, n_s = t.obs, t.action, t.next_obs
        done = 1.0 - t.undone

        # model update (dynaq.py _A_MDP.train) — deltas psum'd across dp shards so
        # every replica integrates the GLOBAL experience and stays identical
        deltas = self.dp_psum(dict(
            trans=jnp.zeros_like(state.trans).at[s, a, n_s].add(m),
            rew_sum=jnp.zeros_like(state.rew_sum).at[s, a].add(t.reward * m),
            done_cnt=jnp.zeros_like(state.done_cnt).at[s, a].add(done * m),
            cnt=jnp.zeros_like(state.cnt).at[s, a].add(m),
            n=mask.sum().astype(jnp.int32),
        ))

        # direct Q-learning on real experience (count-normalized batch form)
        q = self._q_update(state.q_table, s, a, t.reward, t.undone, n_s, m)

        return DynaQState(
            q_table=q,
            trans=state.trans + deltas["trans"],
            rew_sum=state.rew_sum + deltas["rew_sum"],
            done_cnt=state.done_cnt + deltas["done_cnt"],
            cnt=state.cnt + deltas["cnt"],
            train_count=state.train_count + deltas["n"],
        )

    def train(self, state: DynaQState, key: Array, num_steps: int) -> Tuple[DynaQState, Dict[str, Array]]:
        """Planning: replay (s, a) from the visit distribution through the learned
        model (dynaq.py Trainer.train with its model sample)."""
        S, A = self.num_states, self.A
        k1, k2, k3 = jax.random.split(key, 3)
        visits = state.cnt.reshape(-1)
        any_visit = visits.sum() > 0
        logits = jnp.where(visits > 0, jnp.log(jnp.maximum(visits, 1e-30)), -jnp.inf)
        logits = jnp.where(any_visit, logits, jnp.zeros_like(logits))
        flat_sa = jax.random.categorical(k1, logits, shape=(self.planning_batch,))
        s, a = flat_sa // A, flat_sa % A

        trans_rows = state.trans[s, a]  # [B, S]
        n_logits = jnp.where(trans_rows > 0, jnp.log(jnp.maximum(trans_rows, 1e-30)), -jnp.inf)
        has_next = jnp.any(trans_rows > 0, axis=-1)
        n_logits = jnp.where(has_next[:, None], n_logits, jnp.zeros_like(n_logits))
        n_s = jax.random.categorical(k2, n_logits, axis=-1)

        c = jnp.maximum(state.cnt[s, a], 1.0)
        r = state.rew_sum[s, a] / c
        p_done = state.done_cnt[s, a] / c
        done = jax.random.uniform(k3, (self.planning_batch,)) < p_done
        undone = 1.0 - done.astype(jnp.float32)

        m = (has_next & any_visit).astype(jnp.float32)
        q = self._q_update(state.q_table, s, a, r, undone, n_s, m)
        return state.replace(q_table=q), {
            "train_count": state.train_count.astype(jnp.float32)
        }

    def params_of(self, state: DynaQState):
        return {
            "q": state.q_table,
            "trans": state.trans,
            "rew_sum": state.rew_sum,
            "done_cnt": state.done_cnt,
            "cnt": state.cnt,
        }

    def restore_params(self, state: DynaQState, p) -> DynaQState:
        return state.replace(
            q_table=p["q"], trans=p["trans"], rew_sum=p["rew_sum"],
            done_cnt=p["done_cnt"], cnt=p["cnt"],
        )
