"""C51 — categorical distributional DQN (parity: srl/algorithms/c51/).

Same capability as the reference: Z-network over ``num_atoms`` support atoms in
[v_min, v_max], greedy action by expected value, distributional Bellman projection.
The reference projects with a per-sample python double loop (c51.py:110-124); here the
projection is the twohot scatter applied to the shifted support — one einsum over
atoms, batched on the MXU.
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
from ..models.blocks import InputBlockConfig, MLPBlock
from ..utils import rl_functions as funcs
from ..utils.schedulers import SchedulerConfig
from .base import AlgoConfig, PolicyContext, Transition
from .common import masked_update, periodic_target_sync
from .dqn import MemoryConfig

Array = jax.Array


class ZNetwork(nn.Module):
    num_actions: int
    num_atoms: int
    obs_space: Any
    input_block: InputBlockConfig
    hidden: Tuple[int, ...]

    @nn.compact
    def __call__(self, x):
        x = self.input_block.create_block(self.obs_space)(x)
        x = MLPBlock(self.hidden)(x)
        x = nn.Dense(self.num_actions * self.num_atoms)(x)
        return x.reshape(x.shape[:-1] + (self.num_actions, self.num_atoms))


@struct.dataclass
class C51State:
    params: Any
    target_params: Any
    opt_state: Any
    memory: Any
    train_count: Array


@dataclasses.dataclass
class C51Config(AlgoConfig):
    test_epsilon: float = 0.0
    epsilon: float = 0.1
    epsilon_scheduler: SchedulerConfig = dataclasses.field(default_factory=SchedulerConfig)
    batch_size: int = 32
    memory: MemoryConfig = dataclasses.field(default_factory=MemoryConfig)
    lr: float = 0.001
    discount: float = 0.9
    target_model_update_interval: int = 1000
    categorical_num_atoms: int = 51
    categorical_v_min: float = -2.0
    categorical_v_max: float = 2.0
    input_block: InputBlockConfig = dataclasses.field(default_factory=InputBlockConfig)
    hidden_sizes: Tuple[int, ...] = (64, 64)

    observation_type: RLBaseTypes = RLBaseTypes.BOX
    action_type: RLBaseTypes = RLBaseTypes.DISCRETE

    def get_name(self) -> str:
        return "C51"

    def on_setup(self) -> None:
        self._eps_sch = self.epsilon_scheduler.create(self.epsilon)
        self._replay = self.memory.create()
        self.model = ZNetwork(
            num_actions=self.action_space.n,
            num_atoms=self.categorical_num_atoms,
            obs_space=self.obs_space,
            input_block=self.input_block,
            hidden=self.hidden_sizes,
        )
        self._tx = optax.adam(self.lr)
        self._support = jnp.linspace(
            self.categorical_v_min, self.categorical_v_max, self.categorical_num_atoms
        )

    def _example_transition(self) -> Transition:
        A = self.num_actions
        return Transition(
            obs=self.obs_space.zero(),
            action=jnp.asarray(0, jnp.int32),
            reward=jnp.asarray(0.0, jnp.float32),
            next_obs=self.obs_space.zero(),
            undone=jnp.asarray(1.0, jnp.float32),
            invalid_mask=jnp.zeros((A,), jnp.bool_),
            next_invalid_mask=jnp.zeros((A,), jnp.bool_),
        )

    def init(self, key: Array) -> C51State:
        params = self.model.init(key, self.obs_space.zero()[None])
        return C51State(
            params=params,
            target_params=jax.tree.map(jnp.copy, params),
            opt_state=self._tx.init(params),
            memory=self._replay.init(self._example_transition()),
            train_count=jnp.asarray(0, jnp.int32),
        )

    def _q_values(self, params, obs) -> Array:
        logits = self.model.apply(params, jnp.asarray(obs, jnp.float32))
        probs = jax.nn.softmax(logits, axis=-1)
        return jnp.sum(probs * self._support, axis=-1)  # [B, A]

    def policy(self, state: C51State, obs, invalid_mask, ctx: PolicyContext, key) -> Array:
        eps = jnp.where(ctx.training, self._eps_sch(ctx.step), self.test_epsilon)
        q = self._q_values(state.params, obs)
        return funcs.epsilon_greedy(q, invalid_mask, eps, key)

    def action_values(self, state: C51State, obs):
        """Expected values of the return distributions (render overlay)."""
        return self._q_values(state.params, obs)

    def observe(self, state: C51State, t: Transition, mask) -> C51State:
        t, mask = self.flatten_transitions(t, mask)
        return state.replace(memory=self._replay.add_masked(state.memory, t, mask))

    def _loss(self, params, target_params, batch: Transition):
        n_obs = jnp.asarray(batch.next_obs, jnp.float32)
        # a' = argmax E[Z(s',a')] under the online net (c51.py:96-99 uses online)
        n_q = self._q_values(params, n_obs)
        n_q = jnp.where(batch.next_invalid_mask, jnp.finfo(jnp.float32).min, n_q)
        n_act = jnp.argmax(n_q, axis=-1)

        n_logits = self.model.apply(target_params, n_obs)
        n_probs = jax.nn.softmax(n_logits, axis=-1)
        n_dist = jnp.take_along_axis(
            n_probs, n_act[:, None, None].repeat(self.categorical_num_atoms, -1), axis=1
        )[:, 0]  # [B, atoms]

        # distributional Bellman: TZ = r + gamma * undone * z, projected back onto the
        # fixed support via the twohot scatter (replaces the reference's double loop)
        tz = batch.reward[:, None] + self.discount * batch.undone[:, None] * self._support
        tz = jnp.clip(tz, self.categorical_v_min, self.categorical_v_max)
        proj = funcs.twohot_encode(
            tz, self.categorical_num_atoms, self.categorical_v_min, self.categorical_v_max
        )  # [B, atoms(src), atoms(bins)]
        target_dist = jnp.einsum("ba,bac->bc", jax.lax.stop_gradient(n_dist), proj)

        logits = self.model.apply(params, jnp.asarray(batch.obs, jnp.float32))
        logp = jax.nn.log_softmax(
            jnp.take_along_axis(
                logits, batch.action[:, None, None].repeat(self.categorical_num_atoms, -1), axis=1
            )[:, 0],
            axis=-1,
        )
        loss = -jnp.mean(jnp.sum(jax.lax.stop_gradient(target_dist) * logp, axis=-1))
        return loss

    def train(self, state: C51State, key: Array, num_steps: int) -> Tuple[C51State, Dict[str, Array]]:
        grad_fn = jax.value_and_grad(self._loss)

        from ..memories.priority_buffer import PriorityReplayBuffer

        is_per = isinstance(self._replay, PriorityReplayBuffer)

        def one_update(st: C51State, k):
            if is_per:
                batch, _, _ = self._replay.sample(st.memory, k, self.batch_size, st.train_count)
            else:
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

    def params_of(self, state: C51State):
        return {"params": state.params, "target_params": state.target_params}

    def restore_params(self, state: C51State, p) -> C51State:
        return state.replace(params=p["params"], target_params=p["target_params"])
