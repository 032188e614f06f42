"""GoDQN (parity: srl/algorithms/go_dqn/ — "DQN with random initial states": a
Go-Explore style archive of restorable cells selected by UCB
(go_dqn/go_dqn.py:230-256), per-episode go modes — "go_random" (uniform actions) and
"go_action" (sticky action re-rolled with go_action_change_rate)
(go_dqn.py:121-168) — and a double-DQN robustified on the collected experience with
Huber loss (go_dqn.py:68-105).

TPU re-design (shared with this framework's Go-Explore): the functional env's
(AutoResetState, TimeStep) pytree IS the restorable snapshot, so the archive is a
dense [C+1, ...] stack keyed by the DISCRETE-encoded observation (the reference keys
cells by a 12x12 Otsu-binarized downsample of the render image, go_dqn/config.py:20-53
— for tabular envs the discrete obs is the exact cell; for image envs attach a
DownSamplingProcessor). Per-episode mode selection and cell-UCB restore are masked
lockstep updates across thousands of envs inside one jitted chunk:

- archive_restore (engine auto-reset hook) teleports a resetting env to a UCB-sampled
  cell with probability go_rate; a restored episode is detected at the next policy
  call by its snapshot step_num > 0, which is exactly the coupling the reference gets
  from choosing the mode before archive_select (go_dqn.py:131-144).
- The sequential select-count feedback of the reference's one-at-a-time argmax UCB
  (go_dqn.py:236-254) is re-expressed as a sharp categorical over UCB scores
  (ucb_select_temperature) so simultaneous restores spread over near-frontier cells.
- The reference aborts search episodes after search_max_step env steps
  (go_dqn.py:186-189); here episode length is bounded by the env's max_episode_steps
  (the snapshot carries step_num, so restored episodes resume the count).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..define import RLBaseTypes
from ..memories.replay_buffer import ReplayBuffer
from ..models.blocks import InputBlockConfig, QNetwork
from ..utils import rl_functions as funcs
from .base import AlgoConfig, Transition
from .common import masked_update, periodic_target_sync

Array = jax.Array

MODE_DQN, MODE_GO_RANDOM, MODE_GO_ACTION = 0, 1, 2


@struct.dataclass
class GoDQNActorState:
    mode: Array  # [B] int32
    go_action: Array  # [B] int32
    begin_pending: Array  # [B] bool — previous ts ended; next call starts an episode


@struct.dataclass
class GoDQNState:
    params: Any
    target_params: Any
    opt_state: Any
    memory: Any
    # dense archive over cells; last row is a scratch slot for masked-out writes
    visited: Array  # [C+1] bool
    visit: Array  # [C+1]
    select: Array  # [C+1]
    best_reward: Array  # [C+1] episode total reward of the stored snapshot
    best_step: Array  # [C+1] episode step of the stored snapshot
    cell_reward: Array  # [C+1] immediate reward on reaching the cell (UCB r term)
    total_visit: Array  # scalar — archive_total_visit (go_dqn.py:212)
    rmin: Array
    rmax: Array
    snap_env: Any  # AutoResetState stacked [C+1, ...]
    snap_ts: Any  # TimeStep stacked [C+1, ...]
    train_count: Array


@dataclasses.dataclass
class GoDQNConfig(AlgoConfig):
    epsilon: float = 0.001
    test_epsilon: float = 0.00001
    go_rate: float = 0.9
    go_action_change_rate: float = 0.05
    ucb_scale: float = 0.1
    #: temperature of the categorical re-expression of the reference's argmax UCB
    ucb_select_temperature: float = 0.02
    batch_size: int = 32
    memory_capacity: int = 50_000
    memory_warmup_size: int = 2_000
    lr: float = 1e-4
    discount: float = 0.995
    target_model_update_interval: int = 2000
    input_block: InputBlockConfig = dataclasses.field(default_factory=InputBlockConfig)
    hidden_sizes: Tuple[int, ...] = (64, 64)
    #: dueling head (the reference's hidden_block is a DuelingNetworkConfig,
    #: go_dqn/config.py:93)
    enable_dueling: bool = True

    observation_type: RLBaseTypes = RLBaseTypes.BOX
    action_type: RLBaseTypes = RLBaseTypes.DISCRETE

    has_actor_state: bool = True
    needs_env_state: bool = True
    policy_updates_state: bool = True
    uses_archive_restore: bool = True

    def get_name(self) -> str:
        return "GoDQN"

    def setup(self, env) -> None:
        super().setup(env)
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
            dueling=self.enable_dueling,
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

    def init(self, key: Array) -> GoDQNState:
        params = self.model.init(key, self.obs_space.zero()[None])
        from ..envs.core import AutoResetEnv

        aenv = AutoResetEnv(self.env)
        ar0, ats0 = aenv.reset(jax.random.PRNGKey(0))
        C = self.C + 1
        return GoDQNState(
            params=params,
            target_params=jax.tree.map(jnp.copy, params),
            opt_state=self._tx.init(params),
            memory=self._replay.init(self._example_transition()),
            visited=jnp.zeros((C,), bool),
            visit=jnp.zeros((C,)),
            select=jnp.zeros((C,)),
            best_reward=jnp.full((C,), -jnp.inf),
            best_step=jnp.full((C,), jnp.inf),
            cell_reward=jnp.zeros((C,)),
            total_visit=jnp.asarray(0.0),
            rmin=jnp.asarray(jnp.inf),
            rmax=jnp.asarray(-jnp.inf),
            snap_env=jax.tree.map(
                lambda x: jnp.zeros((C,) + jnp.shape(x), jnp.asarray(x).dtype), ar0
            ),
            snap_ts=jax.tree.map(
                lambda x: jnp.zeros((C,) + jnp.shape(x), jnp.asarray(x).dtype), ats0
            ),
            train_count=jnp.asarray(0, jnp.int32),
        )

    def init_actor_state(self, key, num_envs) -> GoDQNActorState:
        return GoDQNActorState(
            mode=jnp.zeros((num_envs,), jnp.int32),
            go_action=jnp.zeros((num_envs,), jnp.int32),
            begin_pending=jnp.zeros((num_envs,), bool),
        )

    # ------------------------------------------------------------------
    def policy_step(self, state: GoDQNState, actor, obs, invalid_mask, ctx, key, episode_start):
        B = invalid_mask.shape[0]
        idx = jnp.arange(B)
        ts = ctx.timestep
        live = jnp.logical_not(jnp.logical_or(ts.terminated, ts.truncated))
        ep_reward = ctx.autoreset_state.episode_reward[:, 0]
        step_num = ctx.autoreset_state.step_num.astype(jnp.float32)
        step_reward = ctx.prev_rewards[:, 0]  # reward of the step that reached here

        # --- archive update with the CURRENT state (go_dqn.py archive_update) -----
        cell = jax.vmap(self._cell_encoder.encode)(ts.obs)  # [B]
        can_store = jnp.logical_and(jnp.logical_and(live, ctx.training), step_num > 0)
        better = jnp.logical_or(
            jnp.logical_not(state.visited[cell]),
            jnp.logical_or(
                ep_reward > state.best_reward[cell],
                jnp.logical_and(
                    ep_reward == state.best_reward[cell], step_num < state.best_step[cell]
                ),
            ),
        )
        better = jnp.logical_and(better, can_store)
        # one winner per duplicate cell within the batch; losers -> scratch row C
        first_of_cell = jnp.zeros((self.C + 1,), jnp.int32).at[cell].max(
            jnp.where(better, B - idx, 0)
        )
        is_winner = jnp.logical_and(better, (B - idx) == first_of_cell[cell])
        wcell = jnp.where(is_winner, cell, self.C)

        visited = state.visited.at[wcell].max(jnp.ones((B,), bool)).at[self.C].set(False)
        vcell = jnp.where(can_store, cell, self.C)
        visit = state.visit.at[vcell].add(1.0).at[self.C].set(0.0)
        total_visit = state.total_visit + can_store.sum()
        # an update resets the cell's select count (go_dqn.py:226)
        select = state.select.at[wcell].set(0.0).at[self.C].set(0.0)
        best_reward = state.best_reward.at[wcell].set(ep_reward).at[self.C].set(-jnp.inf)
        best_step = state.best_step.at[wcell].set(step_num).at[self.C].set(jnp.inf)
        cell_reward = state.cell_reward.at[wcell].set(step_reward).at[self.C].set(0.0)
        stored_r = jnp.where(can_store, step_reward, jnp.inf)
        rmin = jnp.minimum(state.rmin, stored_r.min())
        rmax = jnp.maximum(state.rmax, jnp.where(can_store, step_reward, -jnp.inf).max())
        snap_env = jax.tree.map(
            lambda b, v: b.at[wcell].set(v), state.snap_env, ctx.autoreset_state
        )
        snap_ts = jax.tree.map(lambda b, v: b.at[wcell].set(v), state.snap_ts, ts)

        # --- per-episode mode selection (go_dqn.py on_reset) -----------------------
        k_go, k_mode, k_goact, k_eps, k_rand, k_chg, k_chact = jax.random.split(key, 7)
        begin = jnp.logical_or(actor.begin_pending, episode_start)
        # restored episodes resume at snapshot step_num > 0 — that IS the go signal
        restored = jnp.logical_and(begin, step_num > 0)
        any_cell = jnp.any(state.visited)
        # before the archive has cells, go modes still occur w.p. go_rate (the
        # reference sets the mode before archive_select, go_dqn.py:131-137)
        go_empty = jnp.logical_and(
            jnp.logical_and(begin, jnp.logical_not(any_cell)),
            jax.random.uniform(k_go, (B,)) < self.go_rate,
        )
        is_go = jnp.logical_and(jnp.logical_or(restored, go_empty), ctx.training)
        new_mode_go = jnp.where(
            jax.random.uniform(k_mode, (B,)) < 0.5, MODE_GO_RANDOM, MODE_GO_ACTION
        )
        rand_logits = jnp.where(  # width = ENCODED action space, mask broadcasts up
            invalid_mask, -jnp.inf, jnp.zeros((invalid_mask.shape[0], self.num_actions))
        )
        fresh_go_action = jax.random.categorical(k_goact, rand_logits, -1).astype(jnp.int32)
        mode = jnp.where(begin, jnp.where(is_go, new_mode_go, MODE_DQN), actor.mode)
        go_action = jnp.where(begin, fresh_go_action, actor.go_action)
        # restored envs charge the chosen cell's select count (go_dqn.py:254)
        sel_cell = jnp.where(restored, cell, self.C)
        select = select.at[sel_cell].add(1.0).at[self.C].set(0.0)

        # --- action ---------------------------------------------------------------
        q = self.model.apply(state.params, obs)
        eps = jnp.where(ctx.training, self.epsilon, self.test_epsilon)
        a_dqn = funcs.epsilon_greedy(q, invalid_mask, eps, k_eps)
        a_rand = jax.random.categorical(k_rand, rand_logits, -1).astype(jnp.int32)
        # go_action: re-roll w.p. go_action_change_rate, and whenever invalid here
        change = jax.random.uniform(k_chg, (B,)) < self.go_action_change_rate
        a_change = jax.random.categorical(k_chact, rand_logits, -1).astype(jnp.int32)
        go_action = jnp.where(change, a_change, go_action)
        ga_invalid = jnp.take_along_axis(invalid_mask, go_action[:, None], -1)[:, 0]
        go_action = jnp.where(ga_invalid, a_change, go_action)

        action = jnp.where(
            mode == MODE_GO_RANDOM, a_rand, jnp.where(mode == MODE_GO_ACTION, go_action, a_dqn)
        )

        new_state = state.replace(
            visited=visited, visit=visit, select=select, total_visit=total_visit,
            best_reward=best_reward, best_step=best_step, cell_reward=cell_reward,
            rmin=rmin, rmax=rmax, snap_env=snap_env, snap_ts=snap_ts,
        )
        new_actor = GoDQNActorState(
            mode=mode,
            go_action=go_action,
            begin_pending=jnp.logical_not(live),
        )
        return action, new_actor, new_state

    # ------------------------------------------------------------------
    def _ucb(self, state: GoDQNState) -> Array:
        """Batched UCB over cells (go_dqn.py archive_select, :230-256)."""
        n = state.visit + state.select
        N = jnp.maximum(state.total_visit, 1.0)
        r = state.cell_reward
        span = state.rmax - state.rmin
        r = jnp.where(span > 0, (r - state.rmin) / jnp.maximum(span, 1e-12), r)
        ucb = r * self.ucb_scale + jnp.sqrt(2.0 * jnp.log(N) / jnp.maximum(n, 1e-12))
        ucb = jnp.where(state.visited, ucb, -jnp.inf)
        return ucb.at[self.C].set(-jnp.inf)

    def archive_restore(self, state: GoDQNState, env_state, timestep, was_reset, key):
        B = was_reset.shape[0]
        k_cell, k_go = jax.random.split(key)
        logits = self._ucb(state) / self.ucb_select_temperature
        any_cell = jnp.any(state.visited)
        logits = jnp.where(any_cell, logits, jnp.zeros_like(logits))
        cells = jax.random.categorical(k_cell, logits, shape=(B,))
        want_go = jax.random.uniform(k_go, (B,)) < self.go_rate
        restore = jnp.logical_and(jnp.logical_and(was_reset, any_cell), want_go)

        def pick(snap, cur):
            chosen = jax.tree.map(lambda b: b[cells], snap)
            sel = lambda c, x: jnp.where(restore.reshape((B,) + (1,) * (x.ndim - 1)), c, x)
            return jax.tree.map(sel, chosen, cur)

        return pick(state.snap_env, env_state), pick(state.snap_ts, timestep)

    # ------------------------------------------------------------------
    def observe(self, state: GoDQNState, t: Transition, mask) -> GoDQNState:
        t, mask = self.flatten_transitions(t, mask)
        return state.replace(memory=self._replay.add_masked(state.memory, t, mask))

    def train(self, state: GoDQNState, key: Array, num_steps: int) -> Tuple[GoDQNState, Dict[str, Array]]:
        def one_update(st: GoDQNState, k):
            batch, _ = self._replay.sample_with_indices(st.memory, k, self.batch_size)
            # double DQN target (go_dqn.py:84-90)
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
                return jnp.mean(optax.huber_loss(qa, target))

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

    def params_of(self, state: GoDQNState):
        return {"params": state.params, "target_params": state.target_params}

    def restore_params(self, state: GoDQNState, p) -> GoDQNState:
        return state.replace(params=p["params"], target_params=p["target_params"])
