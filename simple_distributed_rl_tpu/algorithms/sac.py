"""SAC — soft actor-critic, continuous and discrete (parity: srl/algorithms/sac/,
config srl/algorithms/sac/config.py:31,89: twin Q, entropy temperature auto-tune,
squashed-gaussian policy; discrete mode uses a categorical policy with expected-Q
soft targets).
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
from ..models.distributions import Categorical, SquashedNormal
from ..spaces import Box, Discrete
from .base import AlgoConfig, PolicyContext, Transition
from .common import masked_update, soft_target_update
from .dqn import MemoryConfig

Array = jax.Array


class GaussianPolicy(nn.Module):
    adim: int
    obs_space: Any
    input_block: InputBlockConfig
    hidden: Tuple[int, ...]

    @nn.compact
    def __call__(self, x):
        x = self.input_block.create_block(self.obs_space)(x)
        h = MLPBlock(self.hidden)(x)
        loc = nn.Dense(self.adim)(h)
        log_scale = nn.Dense(self.adim)(h)
        return loc, jnp.clip(log_scale, -10.0, 2.0)


class CategoricalPolicy(nn.Module):
    n: int
    obs_space: Any
    input_block: InputBlockConfig
    hidden: Tuple[int, ...]

    @nn.compact
    def __call__(self, x):
        x = self.input_block.create_block(self.obs_space)(x)
        h = MLPBlock(self.hidden)(x)
        return nn.Dense(self.n)(h)


class TwinQContinuous(nn.Module):
    obs_space: Any
    input_block: InputBlockConfig
    hidden: Tuple[int, ...]

    @nn.compact
    def __call__(self, x, a):
        x = self.input_block.create_block(self.obs_space)(x)
        xa = jnp.concatenate([x, a], axis=-1)
        q1 = nn.Dense(1)(MLPBlock(self.hidden)(xa))[..., 0]
        q2 = nn.Dense(1)(MLPBlock(self.hidden)(xa))[..., 0]
        return q1, q2


class TwinQDiscrete(nn.Module):
    n: int
    obs_space: Any
    input_block: InputBlockConfig
    hidden: Tuple[int, ...]

    @nn.compact
    def __call__(self, x):
        x = self.input_block.create_block(self.obs_space)(x)
        q1 = nn.Dense(self.n)(MLPBlock(self.hidden)(x))
        q2 = nn.Dense(self.n)(MLPBlock(self.hidden)(x))
        return q1, q2


@struct.dataclass
class SACState:
    policy_params: Any
    q_params: Any
    q_target_params: Any
    log_alpha: Array
    policy_opt: Any
    q_opt: Any
    alpha_opt: Any
    memory: Any
    train_count: Array


@dataclasses.dataclass
class SACConfig(AlgoConfig):
    batch_size: int = 64
    memory: MemoryConfig = dataclasses.field(default_factory=MemoryConfig)
    lr_policy: float = 3e-4
    lr_q: float = 3e-4
    lr_alpha: float = 3e-4
    discount: float = 0.99
    soft_target_tau: float = 0.005
    #: fixed alpha when entropy_alpha_auto is False (parity: sac config)
    entropy_alpha: float = 0.2
    entropy_alpha_auto: bool = True
    input_block: InputBlockConfig = dataclasses.field(default_factory=InputBlockConfig)
    hidden_sizes: Tuple[int, ...] = (64, 64)

    observation_type: RLBaseTypes = RLBaseTypes.BOX
    action_type: RLBaseTypes = RLBaseTypes.DISCRETE

    def get_name(self) -> str:
        return "SAC"

    def setup(self, env) -> None:
        if not isinstance(env.action_space, Discrete):
            self.action_type = RLBaseTypes.BOX
        super().setup(env)

    def on_setup(self) -> None:
        self.is_discrete = isinstance(self.action_space, Discrete)
        self._replay = self.memory.create()
        if self.is_discrete:
            n = self.action_space.n
            self.policy_net = CategoricalPolicy(n, self.obs_space, self.input_block, self.hidden_sizes)
            self.q_net = TwinQDiscrete(n, self.obs_space, self.input_block, self.hidden_sizes)
            self._target_entropy = -0.98 * jnp.log(1.0 / n)  # parity: discrete SAC heuristic
        else:
            aspace = self.action_space
            assert isinstance(aspace, Box)
            self.adim = aspace.flat_size
            self._a_low, self._a_high = float(aspace.low), float(aspace.high)
            self.policy_net = GaussianPolicy(self.adim, self.obs_space, self.input_block, self.hidden_sizes)
            self.q_net = TwinQContinuous(self.obs_space, self.input_block, self.hidden_sizes)
            self._target_entropy = -float(self.adim)
        self._p_tx = optax.adam(self.lr_policy)
        self._q_tx = optax.adam(self.lr_q)
        self._a_tx = optax.adam(self.lr_alpha)

    def _example_transition(self) -> Transition:
        A = self.num_actions
        a0 = jnp.asarray(0, jnp.int32) if self.is_discrete else jnp.zeros((self.adim,), jnp.float32)
        return Transition(
            obs=self.obs_space.zero(),
            action=a0,
            reward=jnp.asarray(0.0, jnp.float32),
            next_obs=self.obs_space.zero(),
            undone=jnp.asarray(1.0, jnp.float32),
            invalid_mask=jnp.zeros((A,), jnp.bool_),
            next_invalid_mask=jnp.zeros((A,), jnp.bool_),
        )

    def init(self, key: Array) -> SACState:
        k1, k2 = jax.random.split(key)
        obs0 = self.obs_space.zero()[None]
        p_params = self.policy_net.init(k1, obs0)
        if self.is_discrete:
            q_params = self.q_net.init(k2, obs0)
        else:
            q_params = self.q_net.init(k2, obs0, jnp.zeros((1, self.adim)))
        log_alpha = jnp.asarray(jnp.log(self.entropy_alpha), jnp.float32)
        return SACState(
            policy_params=p_params,
            q_params=q_params,
            q_target_params=jax.tree.map(jnp.copy, q_params),
            log_alpha=log_alpha,
            policy_opt=self._p_tx.init(p_params),
            q_opt=self._q_tx.init(q_params),
            alpha_opt=self._a_tx.init(log_alpha),
            memory=self._replay.init(self._example_transition()),
            train_count=jnp.asarray(0, jnp.int32),
        )

    def _scale(self, a):
        return self._a_low + (a + 1.0) * 0.5 * (self._a_high - self._a_low)

    def _unscale(self, a_env):
        return jnp.clip(
            (a_env - self._a_low) / (self._a_high - self._a_low) * 2.0 - 1.0,
            -1.0 + 1e-6,
            1.0 - 1e-6,
        )

    def policy(self, state: SACState, obs, invalid_mask, ctx: PolicyContext, key) -> Array:
        obs = jnp.asarray(obs, jnp.float32)
        out = self.policy_net.apply(state.policy_params, obs)
        if self.is_discrete:
            logits = jnp.where(invalid_mask, -jnp.inf, out)
            return jnp.where(
                ctx.training,
                jax.random.categorical(key, logits, axis=-1),
                jnp.argmax(logits, axis=-1),
            ).astype(jnp.int32)
        dist = SquashedNormal(*out)
        a = jnp.where(ctx.training, dist.sample(key), dist.mode())
        return self._scale(a)

    def observe(self, state: SACState, t: Transition, mask) -> SACState:
        t, mask = self.flatten_transitions(t, mask)
        return state.replace(memory=self._replay.add_masked(state.memory, t, mask))

    def train(self, state: SACState, key: Array, num_steps: int) -> Tuple[SACState, Dict[str, Array]]:
        def one_update(st: SACState, k):
            k_s, k_a, k_a2 = jax.random.split(k, 3)
            batch, _ = self._replay.sample_with_indices(st.memory, k_s, self.batch_size)
            alpha = jnp.exp(st.log_alpha) if self.entropy_alpha_auto else jnp.asarray(self.entropy_alpha)
            obs = jnp.asarray(batch.obs, jnp.float32)
            n_obs = jnp.asarray(batch.next_obs, jnp.float32)

            if self.is_discrete:
                # soft target: E_pi [min Q_t - alpha log pi]
                n_logits = self.policy_net.apply(st.policy_params, n_obs)
                n_logits = jnp.where(batch.next_invalid_mask, -jnp.inf, n_logits)
                n_pi = Categorical(n_logits)
                n_probs, n_logp = n_pi.probs, n_pi.log_probs()
                n_logp = jnp.where(jnp.isfinite(n_logp), n_logp, 0.0)
                tq1, tq2 = self.q_net.apply(st.q_target_params, n_obs)
                soft_v = jnp.sum(n_probs * (jnp.minimum(tq1, tq2) - alpha * n_logp), axis=-1)
                target = batch.reward + batch.undone * self.discount * soft_v
                target = jax.lax.stop_gradient(target)

                def q_loss_fn(qp):
                    q1, q2 = self.q_net.apply(qp, obs)
                    q1a = jnp.take_along_axis(q1, batch.action[:, None], -1)[:, 0]
                    q2a = jnp.take_along_axis(q2, batch.action[:, None], -1)[:, 0]
                    return jnp.mean(jnp.square(q1a - target) + jnp.square(q2a - target))

                def p_loss_fn(pp):
                    logits = self.policy_net.apply(pp, obs)
                    logits = jnp.where(batch.invalid_mask, -jnp.inf, logits)
                    pi = Categorical(logits)
                    probs, logp = pi.probs, pi.log_probs()
                    logp = jnp.where(jnp.isfinite(logp), logp, 0.0)
                    q1, q2 = self.q_net.apply(st.q_params, obs)
                    loss = jnp.mean(jnp.sum(probs * (alpha * logp - jnp.minimum(q1, q2)), axis=-1))
                    ent = -jnp.sum(probs * logp, axis=-1)
                    return loss, jnp.mean(ent)
            else:
                a_env = batch.action
                a = self._unscale(a_env)
                n_dist = SquashedNormal(*self.policy_net.apply(st.policy_params, n_obs))
                n_a, n_lp = n_dist.sample_and_log_prob(k_a)
                n_lp = jnp.sum(n_lp, axis=-1)
                tq1, tq2 = self.q_net.apply(st.q_target_params, n_obs, n_a)
                soft_v = jnp.minimum(tq1, tq2) - alpha * n_lp
                target = jax.lax.stop_gradient(
                    batch.reward + batch.undone * self.discount * soft_v
                )

                def q_loss_fn(qp):
                    q1, q2 = self.q_net.apply(qp, obs, a)
                    return jnp.mean(jnp.square(q1 - target) + jnp.square(q2 - target))

                def p_loss_fn(pp):
                    dist = SquashedNormal(*self.policy_net.apply(pp, obs))
                    a_new, lp = dist.sample_and_log_prob(k_a2)
                    lp = jnp.sum(lp, axis=-1)
                    q1, q2 = self.q_net.apply(st.q_params, obs, a_new)
                    return jnp.mean(alpha * lp - jnp.minimum(q1, q2)), -jnp.mean(lp)

            q_grads = jax.grad(q_loss_fn)(st.q_params)
            (p_grads, entropy) = jax.grad(p_loss_fn, has_aux=True)(st.policy_params)
            if self.pmean_axis is not None:
                q_grads, p_grads = self.dp_pmean((q_grads, p_grads))

            q_up, q_opt = self._q_tx.update(q_grads, st.q_opt, st.q_params)
            q_params = optax.apply_updates(st.q_params, q_up)
            p_up, p_opt = self._p_tx.update(p_grads, st.policy_opt, st.policy_params)
            p_params = optax.apply_updates(st.policy_params, p_up)

            # temperature auto-tune (parity: sac entropy auto adjustment)
            def a_loss_fn(la):
                return -la * jax.lax.stop_gradient(self._target_entropy - entropy)

            a_grad = jax.grad(a_loss_fn)(st.log_alpha)
            if self.pmean_axis is not None:
                a_grad = self.dp_pmean(a_grad)
            a_up, a_opt = self._a_tx.update(a_grad, st.alpha_opt, st.log_alpha)
            log_alpha = optax.apply_updates(st.log_alpha, a_up)
            if not self.entropy_alpha_auto:
                log_alpha, a_opt = st.log_alpha, st.alpha_opt

            ready = self._replay.is_warmup_over(st.memory)
            q_params = masked_update(ready, q_params, st.q_params)
            p_params = masked_update(ready, p_params, st.policy_params)
            q_opt = masked_update(ready, q_opt, st.q_opt)
            p_opt = masked_update(ready, p_opt, st.policy_opt)
            log_alpha = jnp.where(ready, log_alpha, st.log_alpha)
            q_target = soft_target_update(st.q_target_params, q_params, self.soft_target_tau)
            q_target = masked_update(ready, q_target, st.q_target_params)

            new_st = st.replace(
                policy_params=p_params,
                q_params=q_params,
                q_target_params=q_target,
                log_alpha=log_alpha,
                policy_opt=p_opt,
                q_opt=q_opt,
                alpha_opt=a_opt,
                train_count=st.train_count + ready.astype(jnp.int32),
            )
            return new_st, entropy

        state, ents = jax.lax.scan(one_update, state, jax.random.split(key, num_steps))
        return state, {
            "entropy": jnp.mean(ents),
            "alpha": jnp.exp(state.log_alpha),
            "train_count": state.train_count.astype(jnp.float32),
        }

    def params_of(self, state: SACState):
        return {
            "policy": state.policy_params,
            "q": state.q_params,
            "q_target": state.q_target_params,
            "log_alpha": state.log_alpha,
        }

    def restore_params(self, state: SACState, p) -> SACState:
        return state.replace(
            policy_params=p["policy"],
            q_params=p["q"],
            q_target_params=p["q_target"],
            log_alpha=p["log_alpha"],
        )
