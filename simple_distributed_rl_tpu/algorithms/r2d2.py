"""R2D2 (parity: srl/algorithms/r2d2/ — recurrent replay distributed DQN: LSTM
Q-network, sequence replay with stored recurrent states, burn-in replay before BPTT,
DoubleDQN targets, value rescaling, per-actor ε ladder; config defaults and the
atari preset burnin=40/sequence_length=80 follow r2d2/config.py:62-63,95-96).

TPU re-design: the actor IS the vectorized engine — the LSTM hidden is engine-threaded
per-env actor state (AlgoConfig.has_actor_state), reset at episode starts as a masked
zeroing (no per-env python state machine). Each engine chunk of
``burnin + sequence_length`` lockstep steps yields one stored sequence per env, with
the entering hidden snapshot (StepView.actor_snapshot) — the chunk structure replaces
the reference's per-worker sliding window. Training replays burn-in with stored
hiddens (stale-hidden semantics, r2d2/r2d2.py:111-135) then BPTT over the training
segment, all inside one lax.scan.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..define import RLBaseTypes
from ..models.blocks import DuelingHead, InputBlockConfig, MLPBlock
from ..memories.replay_buffer import ReplayBuffer
from ..utils import rl_functions as funcs
from ..utils.schedulers import SchedulerConfig
from .base import AlgoConfig, PolicyContext, StepView, Transition
from .common import masked_update, periodic_target_sync

Array = jax.Array


class R2D2Net(nn.Module):
    num_actions: int
    obs_space: Any
    input_block: InputBlockConfig
    lstm_units: int
    head_hidden: Tuple[int, ...]
    dueling: bool

    @nn.compact
    def __call__(self, carry, x):
        e = self.input_block.create_block(self.obs_space)(jnp.asarray(x, jnp.float32))
        e = MLPBlock(self.head_hidden)(e)
        carry, h = nn.OptimizedLSTMCell(self.lstm_units)(carry, e)
        if self.dueling:
            q = DuelingHead(self.num_actions)(h)
        else:
            q = nn.Dense(self.num_actions)(h)
        return carry, q


@struct.dataclass
class SeqItem:
    """One stored sequence: T steps + the hidden state entering step 0."""

    obs: Any  # [T, ...]
    action: Array  # [T]
    reward: Array  # [T]
    terminated: Array  # [T] f32
    episode_start: Array  # [T] bool
    invalid_mask: Array  # [T, A]
    init_h: Array  # [units]
    init_c: Array  # [units]


@struct.dataclass
class R2D2State:
    params: Any
    target_params: Any
    opt_state: Any
    memory: Any
    train_count: Array


@dataclasses.dataclass
class R2D2Config(AlgoConfig):
    test_epsilon: float = 0.0
    epsilon: float = 0.1
    epsilon_scheduler: SchedulerConfig = dataclasses.field(default_factory=SchedulerConfig)
    actor_epsilon: float = 0.4
    actor_alpha: float = 7.0
    num_actors: int = 0
    batch_size: int = 32
    capacity: int = 10_000  # sequences
    warmup_size: int = 100
    lr: float = 0.001
    discount: float = 0.997
    target_model_update_interval: int = 1000
    enable_double_dqn: bool = True
    enable_rescale: bool = True
    burnin: int = 5
    sequence_length: int = 10
    lstm_units: int = 64
    input_block: InputBlockConfig = dataclasses.field(default_factory=InputBlockConfig)
    hidden_sizes: Tuple[int, ...] = (64,)
    dueling: bool = True

    observation_type: RLBaseTypes = RLBaseTypes.BOX
    action_type: RLBaseTypes = RLBaseTypes.DISCRETE

    has_actor_state: bool = True
    needs_step_view: bool = True

    def get_name(self) -> str:
        return "R2D2"

    def set_atari_config(self):
        """(parity: r2d2/config.py:95-96)"""
        self.burnin = 40
        self.sequence_length = 80
        self.lstm_units = 512
        self.input_block.set_dqn_block()
        self.enable_rescale = True
        self.discount = 0.997
        return self

    @property
    def required_chunk_steps(self) -> int:
        """The engine chunk length that yields exactly one stored sequence per env."""
        return self.burnin + self.sequence_length

    def on_setup(self) -> None:
        self._eps_sch = self.epsilon_scheduler.create(self.epsilon)
        self._replay = ReplayBuffer(self.capacity, self.warmup_size)
        self.model = R2D2Net(
            num_actions=self.action_space.n,
            obs_space=self.obs_space,
            input_block=self.input_block,
            lstm_units=self.lstm_units,
            head_hidden=self.hidden_sizes,
            dueling=self.dueling,
        )
        self._tx = optax.adam(self.lr)
        if self.num_actors > 0:
            self._actor_eps = jnp.asarray(
                funcs.agent57_epsilon_list(self.num_actors, self.actor_epsilon, self.actor_alpha)
            )
        else:
            self._actor_eps = None

    def _zero_carry(self, batch: int):
        return (
            jnp.zeros((batch, self.lstm_units), jnp.float32),
            jnp.zeros((batch, self.lstm_units), jnp.float32),
        )

    def _example_item(self) -> SeqItem:
        T, A = self.required_chunk_steps, self.num_actions
        obs0 = self.obs_space.zero()
        return SeqItem(
            obs=jnp.zeros((T,) + obs0.shape, obs0.dtype),
            action=jnp.zeros((T,), jnp.int32),
            reward=jnp.zeros((T,), jnp.float32),
            terminated=jnp.zeros((T,), jnp.float32),
            episode_start=jnp.zeros((T,), jnp.bool_),
            invalid_mask=jnp.zeros((T, A), jnp.bool_),
            init_h=jnp.zeros((self.lstm_units,), jnp.float32),
            init_c=jnp.zeros((self.lstm_units,), jnp.float32),
        )

    def init(self, key: Array) -> R2D2State:
        params = self.model.init(key, self._zero_carry(1), self.obs_space.zero()[None])
        return R2D2State(
            params=params,
            target_params=jax.tree.map(jnp.copy, params),
            opt_state=self._tx.init(params),
            memory=self._replay.init(self._example_item()),
            train_count=jnp.asarray(0, jnp.int32),
        )

    # --- actor ------------------------------------------------------------
    def init_actor_state(self, key: Array, num_envs: int):
        return self._zero_carry(num_envs)

    def actor_snapshot(self, actor):
        return actor

    def policy_step(self, state, actor, obs, invalid_mask, ctx, key, episode_start):
        c, h = actor
        m = episode_start[:, None].astype(jnp.float32)
        carry = (c * (1.0 - m), h * (1.0 - m))
        carry, q = self.model.apply(state.params, carry, obs)
        if self._actor_eps is not None:
            eps = self._actor_eps[ctx.env_ids % self.num_actors]
            eps = jnp.where(ctx.training, eps, self.test_epsilon)
        else:
            eps = jnp.where(ctx.training, self._eps_sch(ctx.step), self.test_epsilon)
        a = funcs.epsilon_greedy(q, invalid_mask, eps, key)
        return a, carry

    # --- memory -----------------------------------------------------------
    def observe_chunk(self, state: R2D2State, transitions: Transition, mask, sv: StepView) -> R2D2State:
        # one sequence per env per chunk; the snapshot at scan step 0 is the hidden
        # entering the chunk (stale-hidden storage semantics, r2d2/r2d2.py:111-135)
        c0, h0 = sv.actor_snapshot  # leaves [T, B, units]
        items = SeqItem(
            obs=jnp.moveaxis(sv.obs, 0, 1),
            action=jnp.moveaxis(sv.action, 0, 1),
            reward=jnp.moveaxis(sv.reward, 0, 1),
            terminated=jnp.moveaxis(sv.terminated, 0, 1).astype(jnp.float32),
            episode_start=jnp.moveaxis(sv.episode_start, 0, 1),
            invalid_mask=jnp.moveaxis(sv.invalid_mask, 0, 1),
            init_h=h0[0],
            init_c=c0[0],
        )
        return state.replace(memory=self._replay.add(state.memory, items))

    # --- trainer ----------------------------------------------------------
    def _unroll(self, params, carry, obs_seq, episode_start):
        """Scan the recurrent net over a [bs, T, ...] sequence, resetting hidden at
        episode starts. Returns q values [bs, T, A]."""

        def step(carry, x):
            o, es = x
            m = es[:, None].astype(jnp.float32)
            carry = (carry[0] * (1.0 - m), carry[1] * (1.0 - m))
            carry, q = self.model.apply(params, carry, o)
            return carry, q

        obs_t = jnp.moveaxis(jnp.asarray(obs_seq, jnp.float32), 0, 1)  # [T, bs, ...]
        es_t = jnp.moveaxis(episode_start, 0, 1)
        carry, qs = jax.lax.scan(step, carry, (obs_t, es_t))
        return jnp.moveaxis(qs, 0, 1)  # [bs, T, A]

    def _loss(self, params, target_params, batch: SeqItem):
        bs = batch.action.shape[0]
        carry0 = (batch.init_c, batch.init_h)

        # burn-in with stored hidden, no gradient (r2d2 burn-in replay)
        if self.burnin > 0:
            burn_obs = jax.tree.map(lambda x: x[:, : self.burnin], batch.obs)
            burn_es = batch.episode_start[:, : self.burnin]

            def bstep(carry, x):
                o, es = x
                m = es[:, None].astype(jnp.float32)
                carry = (carry[0] * (1.0 - m), carry[1] * (1.0 - m))
                carry, _ = self.model.apply(params, carry, o)
                return carry, None

            obs_t = jnp.moveaxis(jnp.asarray(burn_obs, jnp.float32), 0, 1)
            es_t = jnp.moveaxis(burn_es, 0, 1)
            carry_on, _ = jax.lax.scan(bstep, carry0, (obs_t, es_t))
            carry_on = jax.lax.stop_gradient(carry_on)

            def btstep(carry, x):
                o, es = x
                m = es[:, None].astype(jnp.float32)
                carry = (carry[0] * (1.0 - m), carry[1] * (1.0 - m))
                carry, _ = self.model.apply(target_params, carry, o)
                return carry, None

            carry_tg, _ = jax.lax.scan(btstep, carry0, (obs_t, es_t))
        else:
            carry_on = carry0
            carry_tg = carry0

        T = self.sequence_length
        sl = slice(self.burnin, self.burnin + T)
        obs = jax.tree.map(lambda x: x[:, sl], batch.obs)
        es = batch.episode_start[:, sl]
        act = batch.action[:, sl]
        rew = batch.reward[:, sl]
        term = batch.terminated[:, sl]
        inv = batch.invalid_mask[:, sl]

        q_on = self._unroll(params, carry_on, obs, es)  # [bs, T, A]
        q_tg = self._unroll(target_params, carry_tg, obs, es)

        # targets: for step t use q at t+1 within the segment (the last step has no
        # successor and is masked out of the loss)
        neg = jnp.finfo(jnp.float32).min
        nq_on = jnp.where(inv[:, 1:], neg, q_on[:, 1:])
        nq_tg = q_tg[:, 1:]
        if self.enable_double_dqn:
            n_act = jnp.argmax(nq_on, axis=-1)
            maxq = jnp.take_along_axis(nq_tg, n_act[..., None], axis=-1)[..., 0]
        else:
            maxq = jnp.max(jnp.where(inv[:, 1:], neg, nq_tg), axis=-1)
        if self.enable_rescale:
            maxq = funcs.inverse_rescaling(maxq)
        undone = 1.0 - term[:, :-1]
        target = rew[:, :-1] + undone * self.discount * maxq
        if self.enable_rescale:
            target = funcs.rescaling(target)
        target = jax.lax.stop_gradient(target)

        q_sel = jnp.take_along_axis(q_on[:, :-1], act[:, :-1, None], axis=-1)[..., 0]
        # steps whose successor starts a new episode have no valid target
        valid = 1.0 - es[:, 1:].astype(jnp.float32)
        td = (target - q_sel) * valid
        # reference: keras.losses.Huber on the weighted Q (r2d2/r2d2.py:87,209)
        return jnp.sum(funcs.huber(td)) / jnp.maximum(jnp.sum(valid), 1.0)

    def train(self, state: R2D2State, key: Array, num_steps: int) -> Tuple[R2D2State, Dict[str, Array]]:
        grad_fn = jax.value_and_grad(self._loss)

        def one_update(st: R2D2State, k):
            batch, _ = self._replay.sample_with_indices(st.memory, k, self.batch_size)
            loss, grads = grad_fn(st.params, st.target_params, batch)
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
                    params=params,
                    target_params=target_params,
                    opt_state=opt_state,
                    train_count=train_count,
                ),
                loss,
            )

        state, losses = jax.lax.scan(one_update, state, jax.random.split(key, num_steps))
        return state, {"loss": jnp.mean(losses), "train_count": state.train_count.astype(jnp.float32)}

    def params_of(self, state: R2D2State):
        return {"params": state.params, "target_params": state.target_params}

    def restore_params(self, state: R2D2State, p) -> R2D2State:
        return state.replace(params=p["params"], target_params=p["target_params"])
