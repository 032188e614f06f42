"""SearchDynaQ (parity: srl/algorithms/search_dynaq.py — tabular model-based search:
learned MDP model (transitions, ext reward, EMA int reward), split ext/int Q tables
refreshed by value iteration over the model at intervals, episodic(1/sqrt n) x
lifelong-decay intrinsic rewards, min-max normalized ext/int mixing with a UCB action
bonus (search_dynaq.py:396-447)).

TPU re-design: the dict model becomes dense [S, A, S] tensors, so one value-iteration
sweep is literally ``R + gamma * T @ V`` — batched matmuls on the MXU. The reference's
wall-clock iteration timeout becomes a fixed sweep count under lax.fori_loop.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..define import RLBaseTypes
from ..utils import rl_functions as funcs
from .base import AlgoConfig, StepView

Array = jax.Array


@struct.dataclass
class SDQActorState:
    epi_counts: Array  # [B, S] per-episode state visits
    r_int_cur: Array  # [B]


@struct.dataclass
class SDQState:
    q_ext: Array  # [S, A]
    q_int: Array  # [S, A]
    trans: Array  # [S, A, S] counts
    rew_ext_sum: Array  # [S, A]
    rew_int: Array  # [S, A] EMA intrinsic reward of arriving transitions
    done_cnt: Array  # [S, A]
    cnt: Array  # [S, A]
    lifelong: Array  # [S]
    action_count: Array  # [S, A] for the UCB bonus
    train_count: Array


@dataclasses.dataclass
class SearchDynaQConfig(AlgoConfig):
    search_rate: float = 0.5
    test_search_rate: float = 0.01
    action_ucb_penalty_rate: float = 0.1
    int_reward_ema_rate: float = 0.5
    q_ext_discount: float = 0.9
    q_int_discount: float = 0.9
    q_ext_target_policy_prob: float = 1.0
    q_int_target_policy_prob: float = 0.9
    lifelong_decrement_rate: float = 0.999
    #: value-iteration sweeps per train call (replaces the wall-clock timeout)
    iteration_sweeps: int = 20

    observation_type: RLBaseTypes = RLBaseTypes.DISCRETE
    action_type: RLBaseTypes = RLBaseTypes.DISCRETE

    has_actor_state: bool = True
    needs_step_view: bool = True
    policy_updates_state: bool = False

    def get_name(self) -> str:
        return "SearchDynaQ"

    def on_setup(self) -> None:
        self.S = self.obs_space.n
        self.A = self.action_space.n
        assert self.S * self.S * self.A < 50_000_000, "state space too large for the dense model"

    def init(self, key: Array) -> SDQState:
        S, A = self.S, self.A
        return SDQState(
            q_ext=jnp.zeros((S, A)),
            q_int=jnp.zeros((S, A)),
            trans=jnp.zeros((S, A, S)),
            rew_ext_sum=jnp.zeros((S, A)),
            rew_int=jnp.zeros((S, A)),
            done_cnt=jnp.zeros((S, A)),
            cnt=jnp.zeros((S, A)),
            lifelong=jnp.ones((S,)),
            action_count=jnp.zeros((S, A)),
            train_count=jnp.asarray(0, jnp.int32),
        )

    def init_actor_state(self, key, num_envs) -> SDQActorState:
        return SDQActorState(
            epi_counts=jnp.zeros((num_envs, self.S), jnp.int32),
            r_int_cur=jnp.zeros((num_envs,)),
        )

    def actor_snapshot(self, actor: SDQActorState):
        return {"r_int_cur": actor.r_int_cur}

    @staticmethod
    def _normalize(q):
        mn = q.min(-1, keepdims=True)
        mx = q.max(-1, keepdims=True)
        return jnp.where(mx > mn, (q - mn) / jnp.maximum(mx - mn, 1e-12), q)

    def policy_step(self, state: SDQState, actor, obs, invalid_mask, ctx, key, episode_start):
        B = invalid_mask.shape[0]
        idx = jnp.arange(B)

        # intrinsic reward of the current state
        epi_counts = jnp.where(episode_start[:, None], 0, actor.epi_counts)
        n_epi = epi_counts[idx, obs].astype(jnp.float32)
        r_int = (1.0 / jnp.sqrt(n_epi + 1.0)) * state.lifelong[obs]
        epi_counts = epi_counts.at[idx, obs].add(1)

        q_ext = self._normalize(state.q_ext)[obs]
        q_int = self._normalize(state.q_int)[obs]
        ext_flat = jnp.all(state.q_ext == state.q_ext.reshape(-1)[0])
        q_train = jnp.where(
            ext_flat, q_int, (1 - self.search_rate) * q_ext + self.search_rate * q_int
        )
        # UCB action bonus (search_dynaq.py:424-440)
        n_sa = state.action_count[obs]  # [B, A]
        n_tot = jnp.maximum(n_sa.sum(-1, keepdims=True), 1.0)
        ucb = q_train + self.action_ucb_penalty_rate * jnp.sqrt(
            2.0 * jnp.log(n_tot) / jnp.maximum(n_sa, 1.0)
        )
        ucb = jnp.where(n_sa == 0, jnp.inf, ucb)
        q_test = (1 - self.test_search_rate) * q_ext + self.test_search_rate * q_int
        q_sel = jnp.where(ctx.training, ucb, q_test)
        k1, key = jax.random.split(key)
        action = funcs.random_max_index(
            jnp.where(invalid_mask, -jnp.inf, q_sel), jnp.zeros_like(invalid_mask), k1
        )

        new_actor = SDQActorState(epi_counts=epi_counts, r_int_cur=r_int)
        return action, new_actor

    # note: policy_updates_state + has_actor_state both used — the engine routes
    # through policy_step (actor path), so action_count updates land in observe.
    def observe_chunk(self, state: SDQState, transitions, mask, sv: StepView) -> SDQState:
        T, B = sv.reward.shape
        done = jnp.logical_or(sv.terminated, sv.truncated)
        was_reset = jnp.concatenate([jnp.zeros_like(done[:1]), done[:-1]], axis=0)
        valid = jnp.logical_not(was_reset)[: T - 1].at[0].set(False)

        s = sv.obs[: T - 1].reshape(-1)
        a = sv.action[: T - 1].reshape(-1)
        n_s = sv.obs[1:].reshape(-1)
        r_ext = sv.reward[: T - 1].reshape(-1)
        r_int = sv.actor_snapshot["r_int_cur"][1:].reshape(-1)
        term = sv.terminated[: T - 1].reshape(-1).astype(jnp.float32)
        m = valid.reshape(-1).astype(jnp.float32)

        # deltas psum'd across dp shards: every replica integrates the GLOBAL
        # experience, so the learned model/tables stay bit-identical under train_mp
        d = self.dp_psum(dict(
            trans=jnp.zeros_like(state.trans).at[s, a, n_s].add(m),
            rew_ext_sum=jnp.zeros_like(state.rew_ext_sum).at[s, a].add(r_ext * m),
            done_cnt=jnp.zeros_like(state.done_cnt).at[s, a].add(term * m),
            cnt=jnp.zeros_like(state.cnt).at[s, a].add(m),
            rint_sum=jnp.zeros_like(state.rew_int).at[s, a].add(r_int * m),
            visits=jnp.zeros((self.S,)).at[s].add(m),
            n=m.sum(),
        ))
        # EMA intrinsic reward per (s, a) (search_dynaq.py:315) toward the batch mean
        # of the new observations (deterministic + shard-identical, vs the reference's
        # one-at-a-time sequential EMA)
        e = self.int_reward_ema_rate
        sa_cnt = jnp.zeros_like(state.rew_int).at[s, a].add(m)
        sa_cnt = self.dp_psum(sa_cnt)
        mean_rint = d["rint_sum"] / jnp.maximum(sa_cnt, 1.0)
        rew_int = jnp.where(
            sa_cnt > 0, e * mean_rint + (1 - e) * state.rew_int, state.rew_int
        )
        lifelong = state.lifelong * (self.lifelong_decrement_rate ** d["visits"])

        return state.replace(
            trans=state.trans + d["trans"],
            rew_ext_sum=state.rew_ext_sum + d["rew_ext_sum"],
            rew_int=rew_int,
            done_cnt=state.done_cnt + d["done_cnt"],
            cnt=state.cnt + d["cnt"],
            lifelong=lifelong,
            action_count=state.action_count + d["cnt"],
            train_count=state.train_count + d["n"].astype(jnp.int32),
        )

    def _value_iteration(self, state: SDQState, q0, rewards, discount, policy_prob):
        """Sweeps of Q <- R + gamma * T [p*max + (1-p)*mean] Q over the learned model
        — dense matmuls (the MXU form of search_dynaq's policy iteration)."""
        c = jnp.maximum(state.cnt, 1.0)
        T_norm = state.trans / c[..., None]  # [S, A, S]
        R = rewards / c  # [S, A]
        p_done = state.done_cnt / c
        visited = state.cnt > 0

        def sweep(_, q):
            v = policy_prob * q.max(-1) + (1 - policy_prob) * q.mean(-1)  # [S]
            nq = jnp.einsum("sap,p->sa", T_norm, v)
            q_new = R + discount * (1.0 - p_done) * nq
            return jnp.where(visited, q_new, q)

        return jax.lax.fori_loop(0, self.iteration_sweeps, sweep, q0)

    def train(self, state: SDQState, key: Array, num_steps: int) -> Tuple[SDQState, Dict[str, Array]]:
        q_ext = self._value_iteration(
            state, state.q_ext, state.rew_ext_sum, self.q_ext_discount,
            self.q_ext_target_policy_prob,
        )
        q_int = self._value_iteration(
            state, state.q_int, state.rew_int * jnp.maximum(state.cnt, 1.0),
            self.q_int_discount, self.q_int_target_policy_prob,
        )
        return state.replace(q_ext=q_ext, q_int=q_int), {
            "train_count": state.train_count.astype(jnp.float32)
        }

    def params_of(self, state: SDQState):
        return {"q_ext": state.q_ext, "q_int": state.q_int, "trans": state.trans,
                "cnt": state.cnt, "lifelong": state.lifelong}

    def restore_params(self, state: SDQState, p) -> SDQState:
        return state.replace(
            q_ext=p["q_ext"], q_int=p["q_int"], trans=p["trans"], cnt=p["cnt"],
            lifelong=p["lifelong"],
        )
