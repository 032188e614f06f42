"""PPO (parity: srl/algorithms/ppo/ — GAE or MC baselines, clip / adaptive-KL
surrogate, value clipping, entropy bonus, discrete + continuous heads).

TPU re-design: the on-policy buffer (ppo/ppo.py:29-53) disappears — the engine's chunk
IS the rollout. ``observe`` stashes the chunk's chronological per-env sequences in the
algo state (fixed shapes); ``train`` computes values/log-probs under the pre-update
params, runs masked GAE (common.masked_gae), then E epochs of minibatch SGD over the
valid entries, all inside the same jitted chunk. Note the reference cannot run PPO
under its mp distribution (ppo/ppo.py:296-297); here the same data-parallel path as
every other algorithm applies (gradient pmean).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..define import RLBaseTypes
from ..models.blocks import InputBlockConfig, MLPBlock
from ..models.distributions import Categorical, Normal
from ..spaces import Box, Discrete
from .base import AlgoConfig, PolicyContext, Transition
from .common import masked_gae, to_env_sequences

Array = jax.Array


class ActorCritic(nn.Module):
    action_space: Any
    obs_space: Any
    input_block: InputBlockConfig
    hidden: Tuple[int, ...]

    @nn.compact
    def __call__(self, x):
        x = self.input_block.create_block(self.obs_space)(x)
        h = MLPBlock(self.hidden)(x)
        v = nn.Dense(1)(h)[..., 0]
        if isinstance(self.action_space, Discrete):
            logits = nn.Dense(self.action_space.n)(h)
            return logits, v
        d = self.action_space.flat_size
        loc = nn.Dense(d)(h)
        log_scale = self.param("log_scale", nn.initializers.zeros, (d,))
        return (loc, jnp.broadcast_to(log_scale, loc.shape)), v


@struct.dataclass
class PPOState:
    params: Any
    opt_state: Any
    rollout: Any  # stashed chunk (Transition sequences) or None placeholder
    rollout_mask: Array
    rollout_final: Array
    kl_coef: Array
    train_count: Array


@dataclasses.dataclass
class PPOConfig(AlgoConfig):
    lr: float = 3e-4
    discount: float = 0.99
    gae_lambda: float = 0.95
    #: "clip" or "kl" (parity: surrogate_type, ppo/config.py:43-103)
    surrogate_type: str = "clip"
    clip_range: float = 0.2
    adaptive_kl_target: float = 0.01
    #: "gae" | "mc" baseline (parity: experience_collection_method)
    baseline_type: str = "gae"
    value_coef: float = 0.5
    entropy_coef: float = 0.001
    enable_value_clip: bool = True
    enable_state_normalized: bool = False
    num_epochs: int = 4
    num_minibatches: int = 4
    max_grad_norm: float = 0.5
    input_block: InputBlockConfig = dataclasses.field(default_factory=InputBlockConfig)
    hidden_sizes: Tuple[int, ...] = (64, 64)

    observation_type: RLBaseTypes = RLBaseTypes.BOX
    action_type: RLBaseTypes = RLBaseTypes.DISCRETE

    def get_name(self) -> str:
        return "PPO"

    def setup(self, env) -> None:
        # continuous action spaces keep their native representation
        if not isinstance(env.action_space, Discrete):
            self.action_type = RLBaseTypes.BOX
        super().setup(env)

    def on_setup(self) -> None:
        self.is_discrete = isinstance(self.action_space, Discrete)
        self.model = ActorCritic(
            action_space=self.action_space,
            obs_space=self.obs_space,
            input_block=self.input_block,
            hidden=self.hidden_sizes,
        )
        self._tx = optax.chain(
            optax.clip_by_global_norm(self.max_grad_norm), optax.adam(self.lr)
        )
        if not self.is_discrete:
            aspace = self.action_space
            assert isinstance(aspace, Box)
            self._a_low = float(aspace.low)
            self._a_high = float(aspace.high)

    # --- rollout stash shapes are fixed per (chunk_steps, num_envs); created lazily
    def init(self, key: Array) -> PPOState:
        params = self.model.init(key, self.obs_space.zero()[None])
        return PPOState(
            params=params,
            opt_state=self._tx.init(params),
            rollout=None,
            rollout_mask=jnp.zeros((0, 0), jnp.bool_),
            rollout_final=jnp.zeros((0, 0), jnp.bool_),
            kl_coef=jnp.asarray(0.5, jnp.float32),
            train_count=jnp.asarray(0, jnp.int32),
        )

    def _dist(self, out):
        if self.is_discrete:
            return Categorical(out)
        loc, log_scale = out
        return Normal(loc, log_scale)

    def _scale_action(self, a):
        # model acts in tanh-space [-1, 1]; env actions live in [low, high]
        return self._a_low + (jnp.tanh(a) + 1.0) * 0.5 * (self._a_high - self._a_low)

    def action_values(self, state: "PPOState", obs):
        """Discrete policy probabilities for the render overlay (parity: PPO worker
        render printing pi/V, srl/algorithms/ppo/ppo.py render_terminal)."""
        if not self.is_discrete:
            return None
        out, _ = self.model.apply(state.params, jnp.asarray(obs, jnp.float32))
        return jax.nn.softmax(out, axis=-1)

    def policy(self, state: PPOState, obs, invalid_mask, ctx: PolicyContext, key) -> Array:
        out, _ = self.model.apply(state.params, jnp.asarray(obs, jnp.float32))
        if self.is_discrete:
            logits = jnp.where(invalid_mask, -jnp.inf, out)
            a = jnp.where(
                ctx.training,
                jax.random.categorical(key, logits, axis=-1),
                jnp.argmax(logits, axis=-1),
            ).astype(jnp.int32)
            return a
        dist = self._dist(out)
        raw = jnp.where(ctx.training, dist.sample(key), dist.mode())
        return self._scale_action(raw)

    def observe(self, state: PPOState, t: Transition, mask) -> PPOState:
        num_envs = mask.shape[1] // (1 + self.env.player_num)
        seq, valid, is_final = to_env_sequences(t, mask, num_envs)
        return state.replace(rollout=seq, rollout_mask=valid, rollout_final=is_final)

    def _unscale_action(self, a_env):
        # inverse of _scale_action, for log-prob computation in tanh-space
        u = (a_env - self._a_low) / (self._a_high - self._a_low) * 2.0 - 1.0
        u = jnp.clip(u, -1.0 + 1e-6, 1.0 - 1e-6)
        return jnp.arctanh(u)

    def _log_prob(self, out, action):
        if self.is_discrete:
            return Categorical(out).log_prob(action)
        dist = self._dist(out)
        raw = self._unscale_action(action)
        # tanh change of variables
        lp = dist.log_prob(raw) - jnp.log(1.0 - jnp.tanh(raw) ** 2 + 1e-6)
        return jnp.sum(lp, axis=-1)

    def _entropy(self, out):
        if self.is_discrete:
            return Categorical(out).entropy()
        return jnp.sum(self._dist(out).entropy(), axis=-1)

    def train(self, state: PPOState, key: Array, num_steps: int) -> Tuple[PPOState, Dict[str, Array]]:
        seq: Transition = state.rollout
        valid = state.rollout_mask
        B, L = valid.shape
        obs_flat = jnp.asarray(seq.obs, jnp.float32).reshape((B * L,) + seq.obs.shape[2:])
        nobs_flat = jnp.asarray(seq.next_obs, jnp.float32).reshape((B * L,) + seq.next_obs.shape[2:])

        # behavior-policy quantities under the pre-update params
        out_old, v_old = self.model.apply(state.params, obs_flat)
        _, v_next = self.model.apply(state.params, nobs_flat)
        act_flat = seq.action.reshape((B * L,) + seq.action.shape[2:])
        logp_old = jax.lax.stop_gradient(self._log_prob(out_old, act_flat))
        v_old = jax.lax.stop_gradient(v_old)
        v_next = jax.lax.stop_gradient(v_next)

        if self.baseline_type == "mc":
            # monte-carlo returns = GAE with lambda=1
            adv, ret = masked_gae(
                seq.reward, v_old.reshape(B, L), v_next.reshape(B, L), seq.undone,
                valid, self.discount, 1.0, state.rollout_final,
            )
        else:
            adv, ret = masked_gae(
                seq.reward, v_old.reshape(B, L), v_next.reshape(B, L), seq.undone,
                valid, self.discount, self.gae_lambda, state.rollout_final,
            )
        adv_flat = adv.reshape(-1)
        ret_flat = ret.reshape(-1)
        mask_flat = valid.reshape(-1).astype(jnp.float32)
        n_valid = jnp.maximum(mask_flat.sum(), 1.0)
        # advantage normalization over valid entries
        mean = jnp.sum(adv_flat * mask_flat) / n_valid
        var = jnp.sum(jnp.square(adv_flat - mean) * mask_flat) / n_valid
        adv_flat = (adv_flat - mean) * jax.lax.rsqrt(var + 1e-8)

        n = B * L
        mb_size = n // self.num_minibatches

        def loss_fn(params, idx, kl_coef):
            o = obs_flat[idx]
            a = act_flat[idx]
            m = mask_flat[idx]
            out, v = self.model.apply(params, o)
            logp = self._log_prob(out, a)
            ratio = jnp.exp(logp - logp_old[idx])
            ad = adv_flat[idx]
            if self.surrogate_type == "clip":
                pg = -jnp.minimum(
                    ratio * ad,
                    jnp.clip(ratio, 1 - self.clip_range, 1 + self.clip_range) * ad,
                )
                kl = (logp_old[idx] - logp)
            else:  # adaptive KL penalty
                kl = logp_old[idx] - logp
                pg = -(ratio * ad - kl_coef * kl)
            if self.enable_value_clip:
                v_clip = v_old[idx] + jnp.clip(
                    v - v_old[idx], -self.clip_range, self.clip_range
                )
                v_loss = jnp.maximum(
                    jnp.square(v - ret_flat[idx]), jnp.square(v_clip - ret_flat[idx])
                )
            else:
                v_loss = jnp.square(v - ret_flat[idx])
            ent = self._entropy(out)
            total = pg + self.value_coef * 0.5 * v_loss - self.entropy_coef * ent
            msum = jnp.maximum(m.sum(), 1.0)
            return jnp.sum(total * m) / msum, jnp.sum(kl * m) / msum

        grad_fn = jax.grad(loss_fn, has_aux=True)

        def one_epoch(carry, k):
            params, opt_state, kl_coef = carry
            perm = jax.random.permutation(k, n)

            def one_mb(c, i):
                params, opt_state, kl_coef = c
                idx = jax.lax.dynamic_slice_in_dim(perm, i * mb_size, mb_size)
                grads, kl = grad_fn(params, idx, kl_coef)
                if self.pmean_axis is not None:
                    grads = self.dp_pmean(grads)
                updates, opt_state = self._tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                # adaptive-KL coefficient update (parity: ppo adaptive mode)
                kl_coef = jnp.where(
                    kl > self.adaptive_kl_target * 1.5, kl_coef * 2.0,
                    jnp.where(kl < self.adaptive_kl_target / 1.5, kl_coef * 0.5, kl_coef),
                )
                kl_coef = jnp.clip(kl_coef, 1e-4, 1e4)
                return (params, opt_state, kl_coef), kl

            (params, opt_state, kl_coef), kls = jax.lax.scan(
                one_mb, (params, opt_state, kl_coef), jnp.arange(self.num_minibatches)
            )
            return (params, opt_state, kl_coef), jnp.mean(kls)

        (params, opt_state, kl_coef), kls = jax.lax.scan(
            one_epoch,
            (state.params, state.opt_state, state.kl_coef),
            jax.random.split(key, self.num_epochs),
        )
        # clear the stash so the carry's pytree structure matches the chunk input
        # (rollout lives only between observe and train inside one jitted chunk)
        new_state = state.replace(
            params=params,
            opt_state=opt_state,
            kl_coef=kl_coef,
            rollout=None,
            rollout_mask=jnp.zeros((0, 0), jnp.bool_),
            rollout_final=jnp.zeros((0, 0), jnp.bool_),
            train_count=state.train_count + self.num_epochs * self.num_minibatches,
        )
        return new_state, {
            "kl": jnp.mean(kls),
            "train_count": new_state.train_count.astype(jnp.float32),
        }

    @property
    def train_interval(self) -> int:
        return 1

    def params_of(self, state: PPOState):
        return state.params

    def restore_params(self, state: PPOState, p) -> PPOState:
        return state.replace(params=p)
