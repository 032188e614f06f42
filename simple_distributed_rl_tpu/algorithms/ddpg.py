"""DDPG / TD3 (parity: srl/algorithms/ddpg/ — deterministic policy with gaussian
exploration noise, twin critics, delayed policy updates, target policy smoothing; the
reference folds TD3 into its DDPG config flags).
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
from ..spaces import Box
from .base import AlgoConfig, PolicyContext, Transition
from .common import masked_update, soft_target_update
from .dqn import MemoryConfig
from .sac import TwinQContinuous

Array = jax.Array


class DeterministicPolicy(nn.Module):
    adim: int
    obs_space: Any
    input_block: InputBlockConfig
    hidden: Tuple[int, ...]

    @nn.compact
    def __call__(self, x):
        x = self.input_block.create_block(self.obs_space)(x)
        h = MLPBlock(self.hidden)(x)
        return jnp.tanh(nn.Dense(self.adim)(h))  # [-1, 1]


@struct.dataclass
class DDPGState:
    policy_params: Any
    policy_target_params: Any
    q_params: Any
    q_target_params: Any
    policy_opt: Any
    q_opt: Any
    memory: Any
    train_count: Array


@dataclasses.dataclass
class DDPGConfig(AlgoConfig):
    batch_size: int = 64
    memory: MemoryConfig = dataclasses.field(default_factory=MemoryConfig)
    lr: float = 3e-4
    discount: float = 0.99
    soft_target_tau: float = 0.02
    #: exploration noise stddev on actions in [-1, 1] space
    noise_stddev: float = 0.1
    #: TD3: target policy smoothing noise + clip (parity: ddpg config)
    target_policy_noise_stddev: float = 0.2
    target_policy_clip_range: float = 0.5
    #: TD3: delayed policy update interval
    actor_update_interval: int = 2
    input_block: InputBlockConfig = dataclasses.field(default_factory=InputBlockConfig)
    hidden_sizes: Tuple[int, ...] = (64, 64)

    observation_type: RLBaseTypes = RLBaseTypes.BOX
    action_type: RLBaseTypes = RLBaseTypes.BOX

    def get_name(self) -> str:
        return "DDPG"

    def on_setup(self) -> None:
        aspace = self.action_space
        assert isinstance(aspace, Box), "DDPG needs a continuous action space"
        self.adim = aspace.flat_size
        self._a_low, self._a_high = float(aspace.low), float(aspace.high)
        self._replay = self.memory.create()
        self.policy_net = DeterministicPolicy(self.adim, self.obs_space, self.input_block, self.hidden_sizes)
        self.q_net = TwinQContinuous(self.obs_space, self.input_block, self.hidden_sizes)
        self._p_tx = optax.adam(self.lr)
        self._q_tx = optax.adam(self.lr)

    def _example_transition(self) -> Transition:
        A = self.num_actions
        return Transition(
            obs=self.obs_space.zero(),
            action=jnp.zeros((self.adim,), jnp.float32),
            reward=jnp.asarray(0.0, jnp.float32),
            next_obs=self.obs_space.zero(),
            undone=jnp.asarray(1.0, jnp.float32),
            invalid_mask=jnp.zeros((A,), jnp.bool_),
            next_invalid_mask=jnp.zeros((A,), jnp.bool_),
        )

    def init(self, key: Array) -> DDPGState:
        k1, k2 = jax.random.split(key)
        obs0 = self.obs_space.zero()[None]
        p_params = self.policy_net.init(k1, obs0)
        q_params = self.q_net.init(k2, obs0, jnp.zeros((1, self.adim)))
        return DDPGState(
            policy_params=p_params,
            policy_target_params=jax.tree.map(jnp.copy, p_params),
            q_params=q_params,
            q_target_params=jax.tree.map(jnp.copy, q_params),
            policy_opt=self._p_tx.init(p_params),
            q_opt=self._q_tx.init(q_params),
            memory=self._replay.init(self._example_transition()),
            train_count=jnp.asarray(0, jnp.int32),
        )

    def _scale(self, a):
        return self._a_low + (a + 1.0) * 0.5 * (self._a_high - self._a_low)

    def _unscale(self, a_env):
        return (a_env - self._a_low) / (self._a_high - self._a_low) * 2.0 - 1.0

    def policy(self, state: DDPGState, obs, invalid_mask, ctx: PolicyContext, key) -> Array:
        a = self.policy_net.apply(state.policy_params, jnp.asarray(obs, jnp.float32))
        noise = jax.random.normal(key, a.shape) * self.noise_stddev
        a = jnp.where(ctx.training, jnp.clip(a + noise, -1.0, 1.0), a)
        return self._scale(a)

    def observe(self, state: DDPGState, t: Transition, mask) -> DDPGState:
        t, mask = self.flatten_transitions(t, mask)
        t = t.replace(action=self._unscale(t.action))
        return state.replace(memory=self._replay.add_masked(state.memory, t, mask))

    def train(self, state: DDPGState, key: Array, num_steps: int) -> Tuple[DDPGState, Dict[str, Array]]:
        def one_update(st: DDPGState, k):
            k_s, k_n = jax.random.split(k)
            batch, _ = self._replay.sample_with_indices(st.memory, k_s, self.batch_size)
            obs = jnp.asarray(batch.obs, jnp.float32)
            n_obs = jnp.asarray(batch.next_obs, jnp.float32)

            # target policy smoothing (TD3)
            n_a = self.policy_net.apply(st.policy_target_params, n_obs)
            noise = jnp.clip(
                jax.random.normal(k_n, n_a.shape) * self.target_policy_noise_stddev,
                -self.target_policy_clip_range,
                self.target_policy_clip_range,
            )
            n_a = jnp.clip(n_a + noise, -1.0, 1.0)
            tq1, tq2 = self.q_net.apply(st.q_target_params, n_obs, n_a)
            target = jax.lax.stop_gradient(
                batch.reward + batch.undone * self.discount * jnp.minimum(tq1, tq2)
            )

            def q_loss_fn(qp):
                q1, q2 = self.q_net.apply(qp, obs, batch.action)
                return jnp.mean(jnp.square(q1 - target) + jnp.square(q2 - target))

            def p_loss_fn(pp):
                a = self.policy_net.apply(pp, obs)
                q1, _ = self.q_net.apply(st.q_params, obs, a)
                return -jnp.mean(q1)

            q_grads = jax.grad(q_loss_fn)(st.q_params)
            p_grads = jax.grad(p_loss_fn)(st.policy_params)
            if self.pmean_axis is not None:
                q_grads, p_grads = self.dp_pmean((q_grads, p_grads))

            q_up, q_opt = self._q_tx.update(q_grads, st.q_opt, st.q_params)
            q_params = optax.apply_updates(st.q_params, q_up)

            ready = self._replay.is_warmup_over(st.memory)
            # delayed actor updates (TD3)
            do_actor = jnp.logical_and(ready, (st.train_count % self.actor_update_interval) == 0)
            p_up, p_opt = self._p_tx.update(p_grads, st.policy_opt, st.policy_params)
            p_params = optax.apply_updates(st.policy_params, p_up)
            p_params = masked_update(do_actor, p_params, st.policy_params)
            p_opt = masked_update(do_actor, p_opt, st.policy_opt)

            q_params = masked_update(ready, q_params, st.q_params)
            q_opt = masked_update(ready, q_opt, st.q_opt)

            q_target = masked_update(
                ready,
                soft_target_update(st.q_target_params, q_params, self.soft_target_tau),
                st.q_target_params,
            )
            p_target = masked_update(
                do_actor,
                soft_target_update(st.policy_target_params, p_params, self.soft_target_tau),
                st.policy_target_params,
            )
            new_st = st.replace(
                policy_params=p_params,
                policy_target_params=p_target,
                q_params=q_params,
                q_target_params=q_target,
                policy_opt=p_opt,
                q_opt=q_opt,
                train_count=st.train_count + ready.astype(jnp.int32),
            )
            q1, _ = self.q_net.apply(q_params, obs, batch.action)
            return new_st, jnp.mean(q1)

        state, qs = jax.lax.scan(one_update, state, jax.random.split(key, num_steps))
        return state, {"q_mean": jnp.mean(qs), "train_count": state.train_count.astype(jnp.float32)}

    def params_of(self, state: DDPGState):
        return {
            "policy": state.policy_params,
            "policy_target": state.policy_target_params,
            "q": state.q_params,
            "q_target": state.q_target_params,
        }

    def restore_params(self, state: DDPGState, p) -> DDPGState:
        return state.replace(
            policy_params=p["policy"],
            policy_target_params=p["policy_target"],
            q_params=p["q"],
            q_target_params=p["q_target"],
        )
