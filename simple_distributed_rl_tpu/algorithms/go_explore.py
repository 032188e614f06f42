"""Go-Explore (parity: srl/algorithms/go_explore/ — archive of visited cells with
restorable snapshots, score-weighted cell selection (w_visit/w_select/eps terms,
go_explore.py:145-150), return-to-cell then explore with action-repeat
(action_change_rate), and a DQN robustified on the collected experience).

TPU re-design: "return to cell" is a masked gather — the functional env's
(AutoResetState, TimeStep) pytree IS the restorable snapshot, so the archive is a
dense [C, ...] stack keyed by the discrete cell index, and every auto-reset across
thousands of envs teleports to an independently score-sampled frontier cell in the
same jitted step (engine archive_restore hook). No downsampling processor needed for
tabular envs: the cell IS the DISCRETE-encoded observation.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..define import RLBaseTypes
from ..models.blocks import InputBlockConfig, QNetwork
from ..memories.replay_buffer import ReplayBuffer
from ..spaces import Box
from ..utils import rl_functions as funcs
from .base import AlgoConfig, Transition
from .common import masked_update, periodic_target_sync

Array = jax.Array


@struct.dataclass
class GoExploreActorState:
    ep_reward: Array  # [B]
    prev_action: Array  # [B]


@struct.dataclass
class GoExploreState:
    params: Any
    target_params: Any
    opt_state: Any
    memory: Any
    # archive, dense over cells
    visited: Array  # [C] bool
    visit: Array  # [C]
    select: Array  # [C]
    best_reward: Array  # [C]
    best_step: Array  # [C]
    snap_env: Any  # AutoResetState stacked [C, ...]
    snap_ts: Any  # TimeStep stacked [C, ...]
    train_count: Array


@dataclasses.dataclass
class GoExploreConfig(AlgoConfig):
    test_epsilon: float = 0.0
    epsilon: float = 0.05
    #: chance to re-roll the repeated exploration action (go_explore action_change_rate)
    action_change_rate: float = 0.2
    w_visit: float = 0.3
    w_select: float = 0.1
    eps1: float = 0.001
    eps2: float = 0.00001
    batch_size: int = 32
    memory_capacity: int = 10_000
    memory_warmup_size: int = 1_000
    lr: float = 5e-4
    discount: float = 0.99
    target_model_update_interval: int = 2000
    input_block: InputBlockConfig = dataclasses.field(default_factory=InputBlockConfig)
    hidden_sizes: Tuple[int, ...] = (64, 64)

    observation_type: RLBaseTypes = RLBaseTypes.BOX
    action_type: RLBaseTypes = RLBaseTypes.DISCRETE

    has_actor_state: bool = True
    needs_env_state: bool = True
    policy_updates_state: bool = True
    uses_archive_restore: bool = True

    def get_name(self) -> str:
        return "Go-Explore"

    def setup(self, env) -> None:
        super().setup(env)
        # the cell index comes from the DISCRETE encode of the observation
        self._cell_encoder = env.observation_space.encoder(RLBaseTypes.DISCRETE)
        self.C = self._cell_encoder.space.n
        assert self.C < 2_000_000, "cell space too large for a dense archive"

    def on_setup(self) -> None:
        self._replay = ReplayBuffer(self.memory_capacity, self.memory_warmup_size)
        self.model = QNetwork(
            num_actions=self.action_space.n,
            obs_space=self.obs_space,
            input_block=self.input_block,
            hidden=self.hidden_sizes,
        )
        self._tx = optax.adam(self.lr)

    def _example_transition(self) -> Transition:
        A = self.num_actions
        return Transition(
            obs=self.obs_space.zero(),
            action=jnp.asarray(0, jnp.int32),
            reward=jnp.asarray(0.0),
            next_obs=self.obs_space.zero(),
            undone=jnp.asarray(1.0),
            invalid_mask=jnp.zeros((A,), bool),
            next_invalid_mask=jnp.zeros((A,), bool),
        )

    def init(self, key: Array) -> GoExploreState:
        params = self.model.init(key, self.obs_space.zero()[None])
        # snapshot storage templates are created lazily on the first policy call —
        # we need an env-state example; the engine provides it through ctx, so init
        # allocates zeros via the env's own reset
        env_state0, ts0 = self.env.reset(jax.random.PRNGKey(0))
        from ..envs.core import AutoResetEnv

        aenv = AutoResetEnv(self.env)
        ar0, ats0 = aenv.reset(jax.random.PRNGKey(0))
        C = self.C + 1  # last row is a scratch slot for masked-out scatter writes
        snap_env = jax.tree.map(
            lambda x: jnp.zeros((C,) + jnp.shape(x), jnp.asarray(x).dtype), ar0
        )
        snap_ts = jax.tree.map(
            lambda x: jnp.zeros((C,) + jnp.shape(x), jnp.asarray(x).dtype), ats0
        )
        return GoExploreState(
            params=params,
            target_params=jax.tree.map(jnp.copy, params),
            opt_state=self._tx.init(params),
            memory=self._replay.init(self._example_transition()),
            visited=jnp.zeros((C,), bool),
            visit=jnp.zeros((C,)),
            select=jnp.zeros((C,)),
            best_reward=jnp.full((C,), -jnp.inf),
            best_step=jnp.full((C,), jnp.inf),
            snap_env=snap_env,
            snap_ts=snap_ts,
            train_count=jnp.asarray(0, jnp.int32),
        )

    def init_actor_state(self, key, num_envs) -> GoExploreActorState:
        return GoExploreActorState(
            ep_reward=jnp.zeros((num_envs,)),
            prev_action=jnp.zeros((num_envs,), jnp.int32),
        )

    # ------------------------------------------------------------------
    def policy_step(self, state: GoExploreState, actor, obs, invalid_mask, ctx, key, episode_start):
        B = invalid_mask.shape[0]
        idx = jnp.arange(B)
        # episode reward bookkeeping comes from the engine's AutoResetState so it
        # stays consistent across archive restores
        ep_reward = ctx.autoreset_state.episode_reward[:, 0]

        # --- archive update with the CURRENT state (go_explore archive_update) ----
        cell = jax.vmap(self._cell_encoder.encode)(ctx.timestep.obs)  # [B]
        step_num = ctx.autoreset_state.step_num.astype(jnp.float32)
        better = jnp.logical_or(
            jnp.logical_not(state.visited[cell]),
            jnp.logical_or(
                ep_reward > state.best_reward[cell],
                jnp.logical_and(
                    ep_reward == state.best_reward[cell], step_num < state.best_step[cell]
                ),
            ),
        )
        better = jnp.logical_and(better, ctx.training)
        # resolve duplicate cells within the batch: keep one winner per cell, and
        # route every non-winning write to the scratch row self.C
        first_of_cell = jnp.zeros((self.C + 1,), jnp.int32).at[cell].max(
            jnp.where(better, B - idx, 0)
        )
        is_winner = jnp.logical_and(better, (B - idx) == first_of_cell[cell])
        wcell = jnp.where(is_winner, cell, self.C)  # losers -> scratch row

        def scatter_snap(buf, val):
            return jax.tree.map(lambda b, v: b.at[wcell].set(v), buf, val)

        visited = state.visited.at[wcell].max(jnp.ones((B,), bool)).at[self.C].set(False)
        visit = state.visit.at[cell].add(jnp.where(ctx.training, 1.0, 0.0))
        best_reward = state.best_reward.at[wcell].set(ep_reward).at[self.C].set(-jnp.inf)
        best_step = state.best_step.at[wcell].set(step_num).at[self.C].set(jnp.inf)
        snap_env = scatter_snap(state.snap_env, ctx.autoreset_state)
        snap_ts = scatter_snap(state.snap_ts, ctx.timestep)

        # --- action: epsilon-greedy DQN with exploration action-repeat ------------
        k1, k2, k3, k4, key = jax.random.split(key, 5)
        q = self.model.apply(state.params, obs)
        eps = jnp.where(ctx.training, self.epsilon, self.test_epsilon)
        a_greedy = funcs.epsilon_greedy(q, invalid_mask, eps, k1)
        # during training, sticky random exploration (action_change_rate)
        change = jax.random.uniform(k2, (B,)) < self.action_change_rate
        rand_logits = jnp.where(  # width = ENCODED action space, mask broadcasts up
            invalid_mask, -jnp.inf, jnp.zeros((invalid_mask.shape[0], self.num_actions))
        )
        a_rand = jax.random.categorical(k3, rand_logits, -1).astype(jnp.int32)
        sticky = jnp.where(change, a_rand, actor.prev_action)
        # invalid sticky actions re-roll
        sticky_invalid = jnp.take_along_axis(invalid_mask, sticky[:, None], -1)[:, 0]
        sticky = jnp.where(sticky_invalid, a_rand, sticky)
        use_sticky = jnp.logical_and(
            ctx.training, jax.random.uniform(k4, (B,)) < 0.5
        )
        action = jnp.where(use_sticky, sticky, a_greedy)

        new_state = state.replace(
            visited=visited, visit=visit, best_reward=best_reward,
            best_step=best_step, snap_env=snap_env, snap_ts=snap_ts,
        )
        new_actor = GoExploreActorState(ep_reward=ep_reward, prev_action=action)
        return action, new_actor, new_state

    # ------------------------------------------------------------------
    def _scores(self, state: GoExploreState) -> Array:
        """Cell selection scores (go_explore.py _calc_score)."""
        s = (
            self.w_visit * (1.0 / (state.visit + self.eps1))
            + self.w_select * (1.0 / (state.select + self.eps1))
            + self.eps2
        )
        s = jnp.where(state.visited, s, 0.0)
        return s.at[self.C].set(0.0)  # never select the scratch row

    def archive_restore(self, state: GoExploreState, env_state, timestep, was_reset, key):
        B = was_reset.shape[0]
        scores = self._scores(state)
        any_cell = jnp.any(state.visited)
        logits = jnp.where(scores > 0, jnp.log(jnp.maximum(scores, 1e-30)), -jnp.inf)
        logits = jnp.where(any_cell, logits, jnp.zeros_like(logits))
        cells = jax.random.categorical(key, logits, shape=(B,))

        restore = jnp.logical_and(was_reset, any_cell)

        def pick(snap, cur):
            chosen = jax.tree.map(lambda b: b[cells], snap)
            sel = lambda c, x: jnp.where(
                restore.reshape((B,) + (1,) * (x.ndim - 1)), c, x
            )
            return jax.tree.map(sel, chosen, cur)

        new_env_state = pick(state.snap_env, env_state)
        new_ts = pick(state.snap_ts, timestep)
        return new_env_state, new_ts

    # ------------------------------------------------------------------
    def observe(self, state: GoExploreState, t: Transition, mask) -> GoExploreState:
        t, mask = self.flatten_transitions(t, mask)
        return state.replace(memory=self._replay.add_masked(state.memory, t, mask))

    def train(self, state: GoExploreState, key: Array, num_steps: int) -> Tuple[GoExploreState, Dict[str, Array]]:
        def one_update(st: GoExploreState, k):
            batch, _ = self._replay.sample_with_indices(st.memory, k, self.batch_size)
            n_q = self.model.apply(st.params, batch.next_obs)
            n_q_t = self.model.apply(st.target_params, batch.next_obs)
            neg = jnp.finfo(jnp.float32).min
            n_q = jnp.where(batch.next_invalid_mask, neg, n_q)
            n_act = jnp.argmax(n_q, -1)
            maxq = jnp.take_along_axis(n_q_t, n_act[:, None], -1)[:, 0]
            target = jax.lax.stop_gradient(
                batch.reward + batch.undone * self.discount * maxq
            )

            def loss_fn(p):
                q = self.model.apply(p, batch.obs)
                qa = jnp.take_along_axis(q, batch.action[:, None], -1)[:, 0]
                # reference: keras.losses.Huber (go_explore/go_explore.py:60,71)
                return jnp.mean(funcs.huber(qa - target))

            loss, grads = jax.value_and_grad(loss_fn)(st.params)
            if self.pmean_axis is not None:
                grads = self.dp_pmean(grads)
            updates, opt_state = self._tx.update(grads, st.opt_state, st.params)
            new_params = optax.apply_updates(st.params, updates)
            ready = self._replay.is_warmup_over(st.memory)
            params = masked_update(ready, new_params, st.params)
            opt_state = masked_update(ready, opt_state, st.opt_state)
            train_count = st.train_count + ready.astype(jnp.int32)
            target_params = periodic_target_sync(
                st.target_params, params, train_count, self.target_model_update_interval
            )
            return (
                st.replace(
                    params=params, target_params=target_params, opt_state=opt_state,
                    train_count=train_count,
                ),
                loss,
            )

        state, losses = jax.lax.scan(one_update, state, jax.random.split(key, num_steps))
        return state, {
            "loss": jnp.mean(losses),
            "archive_cells": state.visited.sum().astype(jnp.float32),
            "train_count": state.train_count.astype(jnp.float32),
        }

    def params_of(self, state: GoExploreState):
        return {"params": state.params, "target_params": state.target_params}

    def restore_params(self, state: GoExploreState, p) -> GoExploreState:
        return state.replace(params=p["params"], target_params=p["target_params"])
