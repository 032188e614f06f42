"""QL_agent57 (parity: srl/algorithms/ql_agent57.py — tabular Q-learning with the
Agent57 exploration stack: split ext/int Q tables, episodic visit-count intrinsic
reward (1/sqrt(n) within the episode), lifelong multiplicative-decay bonus
(ql_agent57.py:90-91,158), sliding-window UCB over the (beta, epsilon) actor ladder).

TPU form: dense [S, A] ext/int Q tables updated with count-normalized scatter TDs
(single-use semantics — every transition trains once, like the reference's buffer);
per-env episodic count tables [B, S] reset at episode starts; one global lifelong
count table [S] with multiplicative decay; the UCB bandit is per env (each lockstep
env is an actor)."""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..define import RLBaseTypes
from ..utils import rl_functions as funcs
from .base import AlgoConfig, StepView, Transition

Array = jax.Array


@struct.dataclass
class QLA57ActorState:
    actor_idx: Array  # [B]
    epi_counts: Array  # [B, S] per-episode state visit counts
    r_int_cur: Array  # [B] intrinsic reward of the current obs
    ucb_count: Array  # [B, N]
    ucb_reward: Array  # [B, N]
    ep_reward: Array  # [B]


@struct.dataclass
class QLA57State:
    q_ext: Array  # [S, A]
    q_int: Array  # [S, A]
    lifelong: Array  # [S] multiplicative novelty factor (starts at 1, decays)
    train_count: Array


@dataclasses.dataclass
class QLAgent57Config(AlgoConfig):
    test_epsilon: float = 0.0
    test_beta: float = 0.0
    lr_ext: float = 0.1
    lr_int: float = 0.1
    discount: float = 0.9
    actor_num: int = 8
    ucb_epsilon: float = 0.5
    ucb_beta: float = 1.0
    lifelong_decrement_rate: float = 0.999
    lifelong_reward_L: float = 5.0
    enable_intrinsic_reward: bool = True

    observation_type: RLBaseTypes = RLBaseTypes.DISCRETE
    action_type: RLBaseTypes = RLBaseTypes.DISCRETE

    has_actor_state: bool = True
    needs_step_view: bool = True

    def get_name(self) -> str:
        return "QL_agent57"

    def on_setup(self) -> None:
        self.S = self.obs_space.n
        self.A = self.action_space.n
        N = self.actor_num
        self._beta_list = jnp.asarray(funcs.agent57_beta_list(N))
        self._eps_list = jnp.asarray(funcs.agent57_epsilon_list(N))

    def init(self, key: Array) -> QLA57State:
        return QLA57State(
            q_ext=jnp.zeros((self.S, self.A)),
            q_int=jnp.zeros((self.S, self.A)),
            lifelong=jnp.ones((self.S,)),
            train_count=jnp.asarray(0, jnp.int32),
        )

    def init_actor_state(self, key, num_envs) -> QLA57ActorState:
        B, N = num_envs, self.actor_num
        return QLA57ActorState(
            actor_idx=jnp.arange(B, dtype=jnp.int32) % N,
            epi_counts=jnp.zeros((B, self.S), jnp.int32),
            r_int_cur=jnp.zeros((B,)),
            ucb_count=jnp.ones((B, N)),
            ucb_reward=jnp.zeros((B, N)),
            ep_reward=jnp.zeros((B,)),
        )

    def actor_snapshot(self, actor: QLA57ActorState):
        return {"actor_idx": actor.actor_idx, "r_int_cur": actor.r_int_cur}

    def policy_step(self, state: QLA57State, actor, obs, invalid_mask, ctx, key, episode_start):
        B, N = invalid_mask.shape[0], self.actor_num
        idx = jnp.arange(B)
        prev_r = ctx.prev_rewards[:, 0]

        # UCB meta-controller at episode starts (ql_agent57.py:326-360)
        ep_reward = actor.ep_reward + prev_r
        ucb_count = actor.ucb_count.at[idx, actor.actor_idx].add(
            jnp.where(episode_start, 1.0, 0.0)
        )
        ucb_reward = actor.ucb_reward.at[idx, actor.actor_idx].add(
            jnp.where(episode_start, ep_reward, 0.0)
        )
        k_ucb, k_exp, k_act, key = jax.random.split(key, 4)
        total = ucb_count.sum(-1, keepdims=True)
        ucb = ucb_reward / ucb_count + self.ucb_beta * jnp.sqrt(
            jnp.log(jnp.maximum(total, 1.0)) / ucb_count
        )
        best = funcs.random_max_index(ucb, jnp.zeros((B, N), bool), k_ucb)
        rand_arm = jax.random.randint(k_exp, (B,), 0, N)
        explore = jax.random.uniform(key, (B,)) < self.ucb_epsilon
        arm = jnp.where(explore, rand_arm, best)
        actor_idx = jnp.where(episode_start, arm, actor.actor_idx)
        actor_idx = jnp.where(ctx.training, actor_idx, jnp.zeros_like(actor_idx))
        ep_reward = jnp.where(episode_start, 0.0, ep_reward)

        # intrinsic reward of the current state (episodic 1/sqrt(n) x lifelong)
        epi_counts = jnp.where(episode_start[:, None], 0, actor.epi_counts)
        n_epi = epi_counts[idx, obs].astype(jnp.float32)
        r_epi = 1.0 / jnp.sqrt(n_epi + 1.0)
        life = state.lifelong[obs]
        r_life = jnp.clip(life * self.lifelong_reward_L, 1.0, self.lifelong_reward_L)
        r_int = r_epi * r_life if self.enable_intrinsic_reward else jnp.zeros((B,))
        epi_counts = epi_counts.at[idx, obs].add(1)

        beta = jnp.where(ctx.training, self._beta_list[actor_idx], self.test_beta)
        eps = jnp.where(ctx.training, self._eps_list[actor_idx], self.test_epsilon)
        q = state.q_ext[obs] + beta[:, None] * state.q_int[obs]
        action = funcs.epsilon_greedy(q, invalid_mask, eps, k_act, tie_break=True)

        new_actor = QLA57ActorState(
            actor_idx=actor_idx,
            epi_counts=epi_counts,
            r_int_cur=jnp.where(ctx.training, r_int, 0.0),
            ucb_count=ucb_count,
            ucb_reward=ucb_reward,
            ep_reward=ep_reward,
        )
        return action, new_actor

    def observe_chunk(self, state: QLA57State, transitions, mask, sv: StepView) -> QLA57State:
        T, B = sv.reward.shape
        done = jnp.logical_or(sv.terminated, sv.truncated)
        was_reset = jnp.concatenate([jnp.zeros_like(done[:1]), done[:-1]], axis=0)
        valid = jnp.logical_not(was_reset)[: T - 1]
        valid = valid.at[0].set(False)  # unknown reset status of chunk head

        s = sv.obs[: T - 1].reshape(-1)
        a = sv.action[: T - 1].reshape(-1)
        n_s = sv.obs[1:].reshape(-1)
        r_ext = sv.reward[: T - 1].reshape(-1)
        r_int = sv.actor_snapshot["r_int_cur"][1:].reshape(-1)
        undone = (1.0 - sv.terminated[: T - 1].astype(jnp.float32)).reshape(-1)
        m = valid.reshape(-1).astype(jnp.float32)

        def td_update(q_table, rewards, lr):
            nq = jnp.max(q_table[n_s], axis=-1)
            target = rewards + undone * self.discount * nq
            td = target - q_table[s, a]
            flat = s * self.A + a
            sum_td = jnp.zeros((self.S * self.A,)).at[flat].add(td * m)
            cnt = jnp.zeros((self.S * self.A,)).at[flat].add(m)
            if self.pmean_axis is not None:
                sum_td, cnt = self.dp_psum((sum_td, cnt))
            return q_table + lr * (sum_td / jnp.maximum(cnt, 1.0)).reshape(self.S, self.A)

        q_ext = td_update(state.q_ext, r_ext, self.lr_ext)
        q_int = td_update(state.q_int, r_int, self.lr_int)

        # lifelong decay: each visit multiplies the state's factor
        visits = jnp.zeros((self.S,)).at[s].add(m)
        lifelong = state.lifelong * (self.lifelong_decrement_rate**visits)

        return QLA57State(
            q_ext=q_ext,
            q_int=q_int,
            lifelong=lifelong,
            train_count=state.train_count + m.sum().astype(jnp.int32),
        )

    def train(self, state, key, num_steps):
        return state, {"train_count": state.train_count.astype(jnp.float32)}

    def params_of(self, state: QLA57State):
        return {"q_ext": state.q_ext, "q_int": state.q_int, "lifelong": state.lifelong}

    def restore_params(self, state: QLA57State, p) -> QLA57State:
        return state.replace(q_ext=p["q_ext"], q_int=p["q_int"], lifelong=p["lifelong"])
