"""Rainbow (parity: srl/algorithms/rainbow/ — DQN + DoubleDQN + PER + dueling +
multi-step + noisy nets + per-actor ε ladder; the reference's Rainbow omits the
categorical head, which lives in C51).

TPU re-design notes:
  - multi-step returns are built vectorized from the chunk's chronological per-env
    sequences (common.nstep_returns) instead of per-worker python accumulation;
  - the per-actor ε ladder (rainbow/rainbow.py:70-74 via setup_from_actor,
    srl/base/rl/config.py:184) maps onto the vectorized env axis: env i uses
    epsilon_list[i % num_actors] — thousands of parallel actors for free;
  - noisy exploration resamples factorized gaussian noise per policy call.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..define import RLBaseTypes
from ..memories.demo_mixed import DemoMixedReplayBuffer
from ..memories.priority_buffer import PriorityReplayBuffer
from ..models.blocks import InputBlockConfig, QNetwork
from ..utils import rl_functions as funcs
from ..utils.schedulers import SchedulerConfig
from .base import AlgoConfig, PolicyContext, Transition
from .common import masked_update, nstep_returns, periodic_target_sync, to_env_sequences
from .dqn import MemoryConfig

Array = jax.Array


@struct.dataclass
class RainbowState:
    params: Any
    target_params: Any
    opt_state: Any
    memory: Any
    train_count: Array


@struct.dataclass
class NStepItem:
    """n-step sample stored in replay: a Transition plus its bootstrap discount."""

    t: Transition
    bootstrap_discount: Array


@dataclasses.dataclass
class RainbowConfig(AlgoConfig):
    test_epsilon: float = 0.0
    epsilon: float = 0.1
    epsilon_scheduler: SchedulerConfig = dataclasses.field(default_factory=SchedulerConfig)
    #: per-actor ε ladder (parity: actor_epsilon/actor_alpha, rainbow/rainbow.py:70-74)
    actor_epsilon: float = 0.4
    actor_alpha: float = 7.0
    num_actors: int = 0  # 0 = single schedule; >0 = ladder over the env axis
    batch_size: int = 32
    memory: MemoryConfig = dataclasses.field(
        default_factory=lambda: MemoryConfig(kind="proportional")
    )
    lr: float = 0.001
    discount: float = 0.99
    target_model_update_interval: int = 1000
    enable_reward_clip: bool = False
    enable_double_dqn: bool = True
    enable_noisy_dense: bool = False
    enable_rescale: bool = False
    multisteps: int = 3
    input_block: InputBlockConfig = dataclasses.field(default_factory=InputBlockConfig)
    hidden_sizes: Tuple[int, ...] = (64, 64)
    dueling: bool = True

    observation_type: RLBaseTypes = RLBaseTypes.BOX
    action_type: RLBaseTypes = RLBaseTypes.DISCRETE

    def get_name(self) -> str:
        return "Rainbow"

    def set_atari_config(self):
        """(parity: rainbow set_atari_config)"""
        self.epsilon_scheduler.set_linear(1.0, 0.1, 1_000_000)
        self.input_block.set_dqn_block()
        self.hidden_sizes = (512,)
        self.dueling = True
        self.enable_double_dqn = True
        self.discount = 0.99
        self.lr = 0.0000625
        self.batch_size = 32
        self.target_model_update_interval = 32_000
        self.enable_reward_clip = True
        self.memory.warmup_size = 80_000
        self.memory.capacity = 1_000_000
        self.memory.set_proportional(alpha=0.5, beta_initial=0.4, beta_steps=1_000_000)
        self.multisteps = 3
        return self

    def on_setup(self) -> None:
        self._eps_sch = self.epsilon_scheduler.create(self.epsilon)
        self._replay = self.memory.create()
        self._is_per = isinstance(self._replay, PriorityReplayBuffer) or (
            isinstance(self._replay, DemoMixedReplayBuffer)
        )
        self.model = QNetwork(
            num_actions=self.action_space.n,
            obs_space=self.obs_space,
            input_block=self.input_block,
            hidden=self.hidden_sizes,
            dueling=self.dueling,
            noisy=self.enable_noisy_dense,
        )
        self._tx = optax.adam(self.lr)
        if self.num_actors > 0:
            self._actor_eps = jnp.asarray(
                funcs.agent57_epsilon_list(self.num_actors, self.actor_epsilon, self.actor_alpha)
            )
        else:
            self._actor_eps = None

    def _example_item(self) -> NStepItem:
        A = self.num_actions
        return NStepItem(
            t=Transition(
                obs=self.obs_space.zero(),
                action=jnp.asarray(0, jnp.int32),
                reward=jnp.asarray(0.0, jnp.float32),
                next_obs=self.obs_space.zero(),
                undone=jnp.asarray(1.0, jnp.float32),
                invalid_mask=jnp.zeros((A,), jnp.bool_),
                next_invalid_mask=jnp.zeros((A,), jnp.bool_),
            ),
            bootstrap_discount=jnp.asarray(1.0, jnp.float32),
        )

    def init(self, key: Array) -> RainbowState:
        k1, k2 = jax.random.split(key)
        params = self.model.init(
            {"params": k1, "noise": k2}, self.obs_space.zero()[None]
        )
        return RainbowState(
            params=params,
            target_params=jax.tree.map(jnp.copy, params),
            opt_state=self._tx.init(params),
            memory=self._replay.init(self._example_item()),
            train_count=jnp.asarray(0, jnp.int32),
        )

    def _apply(self, params, obs, key=None):
        obs = jnp.asarray(obs, jnp.float32)
        if self.enable_noisy_dense and key is not None:
            return self.model.apply(params, obs, rngs={"noise": key})
        return self.model.apply(params, obs)

    def action_values(self, state: "RainbowState", obs):
        """Q-values (noise off) for the render overlay."""
        return self._apply(state.params, obs, None)

    def policy(self, state: RainbowState, obs, invalid_mask, ctx: PolicyContext, key) -> Array:
        k_noise, k_eps = jax.random.split(key)
        q = self._apply(state.params, obs, k_noise if self.enable_noisy_dense else None)
        if self.enable_noisy_dense:
            # noisy nets explore via weight noise; no ε-greedy
            return jnp.argmax(jnp.where(invalid_mask, -jnp.inf, q), axis=-1).astype(jnp.int32)
        if self._actor_eps is not None:
            eps = self._actor_eps[ctx.env_ids % self.num_actors]
            eps = jnp.where(ctx.training, eps, self.test_epsilon)
        else:
            eps = jnp.where(ctx.training, self._eps_sch(ctx.step), self.test_epsilon)
        return funcs.epsilon_greedy(q, invalid_mask, eps, k_eps)

    def observe(self, state: RainbowState, t: Transition, mask) -> RainbowState:
        if self.enable_reward_clip:
            t = t.replace(reward=jnp.sign(t.reward))
        num_envs = mask.shape[1] // (1 + self.env.player_num)
        seq, valid, is_final = to_env_sequences(t, mask, num_envs)
        nt, nmask, bdisc = nstep_returns(seq, valid, self.multisteps, self.discount, is_final)
        flat = jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), NStepItem(t=nt, bootstrap_discount=bdisc))
        return state.replace(
            memory=self._replay.add_masked(state.memory, flat, nmask.reshape(-1))
        )

    def _target_q(self, params, target_params, item: NStepItem, key) -> Array:
        batch = item.t
        n_obs = jnp.asarray(batch.next_obs, jnp.float32)
        k1, k2 = jax.random.split(key)
        n_q_target = self._apply(target_params, n_obs, k1)
        neg = jnp.finfo(jnp.float32).min
        if self.enable_double_dqn:
            n_q = self._apply(params, n_obs, k2)
            n_q = jnp.where(batch.next_invalid_mask, neg, n_q)
            n_act = jnp.argmax(n_q, axis=-1)
            maxq = jnp.take_along_axis(n_q_target, n_act[:, None], axis=-1)[:, 0]
        else:
            n_q_target = jnp.where(batch.next_invalid_mask, neg, n_q_target)
            maxq = jnp.max(n_q_target, axis=-1)
        if self.enable_rescale:
            maxq = funcs.inverse_rescaling(maxq)
        target = batch.reward + batch.undone * item.bootstrap_discount * maxq
        if self.enable_rescale:
            target = funcs.rescaling(target)
        return jax.lax.stop_gradient(target)

    def _loss(self, params, target_params, item: NStepItem, weights, key):
        batch = item.t
        q_all = self._apply(params, jnp.asarray(batch.obs, jnp.float32), key)
        q = jnp.take_along_axis(q_all, batch.action[:, None], axis=-1)[:, 0]
        target = self._target_q(params, target_params, item, key)
        td_error = target - q
        # reference convention: HuberLoss(target*w, q*w) (rainbow/model_torch.py:74)
        return jnp.mean(funcs.huber(weights * td_error)), td_error

    def train(self, state: RainbowState, key: Array, num_steps: int) -> Tuple[RainbowState, Dict[str, Array]]:
        grad_fn = jax.grad(self._loss, has_aux=True)

        def one_update(st: RainbowState, k):
            k_sample, k_noise = jax.random.split(k)
            if self._is_per:
                item, weights, indices = self._replay.sample(
                    st.memory, k_sample, self.batch_size, st.train_count
                )
            else:
                item, indices = self._replay.sample_with_indices(
                    st.memory, k_sample, self.batch_size
                )
                weights = jnp.ones((self.batch_size,), jnp.float32)
            grads, td_error = grad_fn(st.params, st.target_params, item, weights, k_noise)
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
            memory = st.memory
            if self._is_per:
                memory = self._replay.update(memory, indices, jnp.abs(td_error), enable=ready)
            return (
                st.replace(
                    params=params,
                    target_params=target_params,
                    opt_state=opt_state,
                    memory=memory,
                    train_count=train_count,
                ),
                jnp.mean(jnp.square(td_error)),
            )

        state, losses = jax.lax.scan(one_update, state, jax.random.split(key, num_steps))
        return state, {"loss": jnp.mean(losses), "train_count": state.train_count.astype(jnp.float32)}

    def params_of(self, state: RainbowState):
        return {"params": state.params, "target_params": state.target_params}

    def restore_params(self, state: RainbowState, p) -> RainbowState:
        return state.replace(params=p["params"], target_params=p["target_params"])
