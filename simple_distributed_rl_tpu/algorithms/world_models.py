"""WorldModels (parity: srl/algorithms/world_models/ — Ha & Schmidhuber's V-M-C:
a VAE compresses observations to latents z, an MDN-RNN learns p(z'|z,a,h), and a tiny
linear controller acts on [z, h], trained by evolution strategies on episode returns
(the reference evolves with CMA-ES in a staged pipeline).

TPU re-design: all three stages run CONCURRENTLY in the vectorized engine — the env
axis doubles as the ES population (each env slot evaluates a perturbed controller;
antithetic OpenAI-ES update from episode returns replaces the host CMA loop), while
VAE and MDN-RNN train from sequence replay in the same jitted chunk."""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..define import RLBaseTypes
from ..memories.replay_buffer import ReplayBuffer
from ..models.blocks import InputBlockConfig, MLPBlock
from .base import AlgoConfig, StepView
from .common import masked_update

Array = jax.Array


class VAE(nn.Module):
    obs_space: Any
    input_block: InputBlockConfig
    z_dim: int

    def setup(self):
        self.enc_in = self.input_block.create_block(self.obs_space)
        self.enc_mlp = MLPBlock((64,))
        self.mu_head = nn.Dense(self.z_dim)
        self.logvar_head = nn.Dense(self.z_dim)
        self.dec_mlp = MLPBlock((64,))
        self.dec_out = nn.Dense(self.obs_space.flat_size)

    def __call__(self, obs, key):
        h = self.enc_mlp(self.enc_in(jnp.asarray(obs, jnp.float32)))
        mu = self.mu_head(h)
        logvar = self.logvar_head(h)
        z = mu + jnp.exp(0.5 * logvar) * jax.random.normal(key, mu.shape)
        recon = self.dec_out(self.dec_mlp(z))
        return z, mu, logvar, recon

    def encode(self, obs):
        h = self.enc_mlp(self.enc_in(jnp.asarray(obs, jnp.float32)))
        return self.mu_head(h)


class MDNRNN(nn.Module):
    z_dim: int
    num_actions: int
    rnn_units: int
    num_mixture: int

    @nn.compact
    def __call__(self, carry, z, a_onehot):
        x = jnp.concatenate([z, a_onehot], -1)
        carry, h = nn.OptimizedLSTMCell(self.rnn_units)(carry, x)
        k = self.num_mixture
        out = nn.Dense(k * (1 + 2 * self.z_dim))(h)
        logit_pi = out[..., :k]
        mu = out[..., k : k + k * self.z_dim].reshape(out.shape[:-1] + (k, self.z_dim))
        logstd = out[..., k + k * self.z_dim :].reshape(out.shape[:-1] + (k, self.z_dim))
        return carry, (logit_pi, mu, jnp.clip(logstd, -8.0, 2.0)), h


@struct.dataclass
class WMActorState:
    h_c: Array  # [B, rnn]
    h_h: Array
    prev_action: Array  # [B]
    noise_key: Array  # [B, 2] per-env ES perturbation seed
    ep_count: Array  # [B] episodes completed under the current perturbation


@struct.dataclass
class WMState:
    vae_params: Any
    rnn_params: Any
    ctrl_mu: Array  # [ctrl_dim] ES mean controller params
    vae_opt: Any
    rnn_opt: Any
    memory: Any
    train_count: Array


@struct.dataclass
class WMSeq:
    obs: Any  # [L, ...]
    action: Array  # [L]
    is_first: Array  # [L]


@dataclasses.dataclass
class WorldModelsConfig(AlgoConfig):
    z_dim: int = 16
    rnn_units: int = 64
    num_mixture: int = 5
    batch_size: int = 16
    batch_length: int = 16
    capacity: int = 2_000
    warmup_size: int = 50
    lr: float = 1e-3
    #: ES hyperparameters (replaces the reference's CMA-ES stage)
    es_sigma: float = 0.1
    es_lr: float = 0.05
    test_sigma: float = 0.0
    input_block: InputBlockConfig = dataclasses.field(default_factory=InputBlockConfig)

    observation_type: RLBaseTypes = RLBaseTypes.BOX
    action_type: RLBaseTypes = RLBaseTypes.DISCRETE

    has_actor_state: bool = True
    needs_step_view: bool = True
    policy_updates_state: bool = True
    needs_env_state: bool = True

    def get_name(self) -> str:
        return "WorldModels"

    @property
    def required_chunk_steps(self) -> int:
        return self.batch_length

    def on_setup(self) -> None:
        self.A = self.action_space.n
        self.vae = VAE(self.obs_space, self.input_block, self.z_dim)
        self.rnn = MDNRNN(self.z_dim, self.A, self.rnn_units, self.num_mixture)
        self._replay = ReplayBuffer(self.capacity, self.warmup_size)
        self._tx = optax.adam(self.lr)
        self.ctrl_dim = (self.z_dim + self.rnn_units + 1) * self.A

    def _ctrl_apply(self, theta, z, h):
        W = theta[: -self.A].reshape(self.z_dim + self.rnn_units, self.A)
        b = theta[-self.A :]
        return jnp.concatenate([z, h], -1) @ W + b

    def _example_seq(self) -> WMSeq:
        L = self.batch_length
        obs0 = self.obs_space.zero()
        return WMSeq(
            obs=jnp.zeros((L,) + obs0.shape, obs0.dtype),
            action=jnp.zeros((L,), jnp.int32),
            is_first=jnp.zeros((L,), bool),
        )

    def init(self, key: Array) -> WMState:
        k1, k2, k3 = jax.random.split(key, 3)
        obs0 = self.obs_space.zero()[None]
        vae_params = self.vae.init(k1, obs0, k1)
        carry0 = (jnp.zeros((1, self.rnn_units)), jnp.zeros((1, self.rnn_units)))
        rnn_params = self.rnn.init(
            k2, carry0, jnp.zeros((1, self.z_dim)), jnp.zeros((1, self.A))
        )
        return WMState(
            vae_params=vae_params,
            rnn_params=rnn_params,
            ctrl_mu=jnp.zeros((self.ctrl_dim,)),
            vae_opt=self._tx.init(vae_params),
            rnn_opt=self._tx.init(rnn_params),
            memory=self._replay.init(self._example_seq()),
            train_count=jnp.asarray(0, jnp.int32),
        )

    def init_actor_state(self, key, num_envs) -> WMActorState:
        return WMActorState(
            h_c=jnp.zeros((num_envs, self.rnn_units)),
            h_h=jnp.zeros((num_envs, self.rnn_units)),
            prev_action=jnp.zeros((num_envs,), jnp.int32),
            noise_key=jax.random.split(key, num_envs),
            ep_count=jnp.zeros((num_envs,), jnp.int32),
        )

    def actor_snapshot(self, actor):
        return None

    # ------------------------------------------------------------------
    def policy_step(self, state: WMState, actor, obs, invalid_mask, ctx, key, episode_start):
        B = invalid_mask.shape[0]
        m = episode_start[:, None].astype(jnp.float32)
        carry = (actor.h_c * (1 - m), actor.h_h * (1 - m))
        prev_a = jnp.where(episode_start, 0, actor.prev_action)

        # --- ES bookkeeping: at episode starts, fold the finished episode's return
        # into an antithetic ES gradient estimate for the mean controller
        # the FINISHED episode's return (episode_reward is already reset to 0 at the
        # episode-start call; last_episode_reward holds the completed total)
        ep_ret = (
            ctx.autoreset_state.last_episode_reward[:, 0]
            if ctx.autoreset_state is not None else jnp.zeros((B,))
        )
        sigma = jnp.where(ctx.training, self.es_sigma, self.test_sigma)
        eps = jax.vmap(lambda k: jax.random.normal(k, (self.ctrl_dim,)))(actor.noise_key)
        # antithetic pairing: even env slots +eps, odd slots -eps
        sign = jnp.where(jnp.arange(B) % 2 == 0, 1.0, -1.0)
        perturb = sign[:, None] * eps
        finished = jnp.logical_and(episode_start, ctx.training)
        # return-standardized ES gradient over the FINISHED envs only
        n_fin = jnp.maximum(finished.sum(), 1).astype(jnp.float32)
        fin_f = finished.astype(jnp.float32)
        mean_ret = jnp.sum(ep_ret * fin_f) / n_fin
        var_ret = jnp.sum(jnp.square(ep_ret - mean_ret) * fin_f) / n_fin
        ret_c = (ep_ret - mean_ret) * jax.lax.rsqrt(var_ret + 1e-6)
        grad_contrib = jnp.sum(
            jnp.where(finished[:, None], ret_c[:, None] * perturb, 0.0), axis=0
        )
        ctrl_mu = state.ctrl_mu + self.es_lr / n_fin * grad_contrib
        ctrl_mu = jnp.where(finished.sum() >= 2, ctrl_mu, state.ctrl_mu)
        # refresh the perturbation of finished envs
        new_keys = jax.vmap(lambda k: jax.random.split(k)[0])(actor.noise_key)
        noise_key = jnp.where(finished[:, None], new_keys, actor.noise_key)

        # --- V: encode obs; M: advance the RNN with the previous action
        z = self.vae.apply(state.vae_params, obs, method=VAE.encode)
        carry, _, h = self.rnn.apply(
            state.rnn_params, carry, z, jax.nn.one_hot(prev_a, self.A)
        )

        # --- C: per-env perturbed linear controller
        theta = state.ctrl_mu[None, :] + sigma * perturb
        logits = jax.vmap(self._ctrl_apply)(theta, z, h)
        logits = jnp.where(invalid_mask, -jnp.inf, logits)
        action = jnp.argmax(logits, -1).astype(jnp.int32)

        new_actor = WMActorState(
            h_c=carry[0], h_h=carry[1], prev_action=action,
            noise_key=noise_key, ep_count=actor.ep_count + finished.astype(jnp.int32),
        )
        return action, new_actor, state.replace(ctrl_mu=ctrl_mu)

    # ------------------------------------------------------------------
    def observe_chunk(self, state: WMState, transitions, mask, sv: StepView) -> WMState:
        items = WMSeq(
            obs=jnp.moveaxis(sv.obs, 0, 1),
            action=jnp.moveaxis(sv.action, 0, 1),
            is_first=jnp.moveaxis(sv.episode_start, 0, 1),
        )
        return state.replace(memory=self._replay.add(state.memory, items))

    def train(self, state: WMState, key: Array, num_steps: int) -> Tuple[WMState, Dict[str, Array]]:
        def one_update(st: WMState, k):
            k1, k2, k3 = jax.random.split(k, 3)
            batch, _ = self._replay.sample_with_indices(st.memory, k1, self.batch_size)
            obs = jnp.asarray(batch.obs, jnp.float32)  # [bs, L, ...]
            bs, L = obs.shape[:2]
            obs_f = obs.reshape((bs * L,) + obs.shape[2:])

            # --- VAE loss
            def vae_loss_fn(p):
                z, mu, logvar, recon = self.vae.apply(p, obs_f, k2)
                l_rec = jnp.mean(
                    jnp.sum(jnp.square(recon - obs_f.reshape(bs * L, -1)), -1)
                )
                l_kl = -0.5 * jnp.mean(
                    jnp.sum(1 + logvar - jnp.square(mu) - jnp.exp(logvar), -1)
                )
                return l_rec + 0.1 * l_kl, z

            (l_vae, z_f), g_vae = jax.value_and_grad(vae_loss_fn, has_aux=True)(st.vae_params)

            # --- MDN-RNN loss: NLL of z_{t+1} under the mixture
            z_seq = jax.lax.stop_gradient(z_f.reshape(bs, L, self.z_dim))

            def rnn_loss_fn(p):
                carry = (jnp.zeros((bs, self.rnn_units)), jnp.zeros((bs, self.rnn_units)))

                def step(carry, x):
                    z, a, first = x
                    mm = first[:, None].astype(jnp.float32)
                    carry = (carry[0] * (1 - mm), carry[1] * (1 - mm))
                    carry, mdn, _ = self.rnn.apply(p, carry, z, jax.nn.one_hot(a, self.A))
                    return carry, mdn

                xs = (
                    jnp.moveaxis(z_seq[:, :-1], 0, 1),
                    jnp.moveaxis(batch.action[:, :-1], 0, 1),
                    jnp.moveaxis(batch.is_first[:, :-1], 0, 1),
                )
                _, (logit_pi, mu, logstd) = jax.lax.scan(step, carry, xs)
                target = jnp.moveaxis(z_seq[:, 1:], 0, 1)[:, :, None, :]  # [L-1, bs, 1, z]
                comp_ll = -0.5 * jnp.sum(
                    jnp.square((target - mu) / jnp.exp(logstd)) + 2 * logstd
                    + jnp.log(2 * jnp.pi),
                    -1,
                )  # [L-1, bs, K]
                ll = jax.nn.logsumexp(jax.nn.log_softmax(logit_pi, -1) + comp_ll, -1)
                return -jnp.mean(ll)

            l_rnn, g_rnn = jax.value_and_grad(rnn_loss_fn)(st.rnn_params)

            if self.pmean_axis is not None:
                g_vae = self.dp_pmean(g_vae)
                g_rnn = self.dp_pmean(g_rnn)

            up_v, vae_opt = self._tx.update(g_vae, st.vae_opt, st.vae_params)
            vae_params = optax.apply_updates(st.vae_params, up_v)
            up_r, rnn_opt = self._tx.update(g_rnn, st.rnn_opt, st.rnn_params)
            rnn_params = optax.apply_updates(st.rnn_params, up_r)

            ready = self._replay.is_warmup_over(st.memory)
            vae_params = masked_update(ready, vae_params, st.vae_params)
            rnn_params = masked_update(ready, rnn_params, st.rnn_params)
            vae_opt = masked_update(ready, vae_opt, st.vae_opt)
            rnn_opt = masked_update(ready, rnn_opt, st.rnn_opt)
            return (
                st.replace(
                    vae_params=vae_params, rnn_params=rnn_params,
                    vae_opt=vae_opt, rnn_opt=rnn_opt,
                    train_count=st.train_count + ready.astype(jnp.int32),
                ),
                (l_vae, l_rnn),
            )

        state, (lv, lr_) = jax.lax.scan(one_update, state, jax.random.split(key, num_steps))
        return state, {
            "vae_loss": jnp.mean(lv),
            "rnn_loss": jnp.mean(lr_),
            "train_count": state.train_count.astype(jnp.float32),
        }

    def params_of(self, state: WMState):
        return {"vae": state.vae_params, "rnn": state.rnn_params, "ctrl": state.ctrl_mu}

    def restore_params(self, state: WMState, p) -> WMState:
        return state.replace(vae_params=p["vae"], rnn_params=p["rnn"], ctrl_mu=p["ctrl"])
