"""PlaNet (parity: srl/algorithms/planet/ — the same RSSM world model, but acting by
online planning in latent space (cross-entropy method / random shooting over action
sequences with predicted rewards) instead of a learned policy).

Shares the DreamerV3 RSSM/heads and world-model loss; only the actor and training
differ: planning rolls the prior forward for every candidate sequence of every env in
ONE batched scan (B*K imagined trajectories on the MXU)."""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..utils import rl_functions as funcs
from .base import StepView
from .common import masked_update
from .dreamer_v3 import DreamerActorState, DreamerSeq, DreamerState, DreamerV3Config, RSSM
import optax

Array = jax.Array


@dataclasses.dataclass
class PlaNetConfig(DreamerV3Config):
    #: planning: candidates per env, CEM iterations, elite fraction
    num_candidates: int = 64
    cem_iterations: int = 2
    elite_fraction: float = 0.25
    plan_horizon: int = 8
    #: exploration noise on planned actions
    epsilon: float = 0.1

    def get_name(self) -> str:
        return "PlaNet"

    def policy_step(self, state: DreamerState, actor, obs, invalid_mask, ctx, key, episode_start):
        B, A = invalid_mask.shape
        m = episode_start[:, None].astype(jnp.float32)
        h = actor.h * (1 - m)
        z = actor.z * (1 - m)
        prev_a = jnp.where(episode_start, 0, actor.prev_action)

        k1, k2, k3, k4 = jax.random.split(key, 4)
        a_onehot = jax.nn.one_hot(prev_a, self.A) * (1 - m)
        h, _, _ = self.rssm.apply(
            state.wm_params["rssm"], h, z, a_onehot, k1, method=RSSM.step_prior
        )
        z, _ = self.rssm.apply(
            state.wm_params["rssm"], h, obs, k2, method=RSSM.step_posterior
        )

        # --- CEM planning over discrete action sequences ----------------------
        K, H = self.num_candidates, self.plan_horizon
        n_elite = max(1, int(K * self.elite_fraction))
        probs = jnp.full((B, H, A), 1.0 / A)

        def rollout_return(h0, z0, actions, k):
            """actions [B, K, H] -> predicted discounted return [B, K]."""
            hr = jnp.repeat(h0, K, axis=0)  # [B*K, deter]
            zr = jnp.repeat(z0, K, axis=0)
            acts = actions.reshape(B * K, H)

            def step(carry, x):
                h, z, disc, ret = carry
                a, kk = x
                h, z, _ = self.rssm.apply(
                    state.wm_params["rssm"], h, z, jax.nn.one_hot(a, A), kk,
                    method=RSSM.step_prior,
                )
                _, r_logits, c_logit = self.heads.apply(
                    state.wm_params["heads"], self._feat(h, z)
                )
                r = self._decode_bins(r_logits)
                cont = jax.nn.sigmoid(c_logit)
                ret = ret + disc * r
                disc = disc * self.discount * cont
                return (h, z, disc, ret), None

            keys = jax.random.split(k, H)
            (_, _, _, ret), _ = jax.lax.scan(
                step,
                (hr, zr, jnp.ones((B * K,)), jnp.zeros((B * K,))),
                (jnp.moveaxis(acts, 1, 0), keys),
            )
            return ret.reshape(B, K)

        def cem_iter(carry, k):
            probs = carry
            ka, kb = jax.random.split(k)
            logits = jnp.log(jnp.maximum(probs, 1e-8))  # [B, H, A]
            actions = jax.random.categorical(
                ka, logits[:, None].repeat(K, 1), axis=-1
            )  # [B, K, H]
            rets = rollout_return(h, z, actions, kb)  # [B, K]
            elite_idx = jax.lax.top_k(rets, n_elite)[1]  # [B, n_elite]
            elite = jnp.take_along_axis(actions, elite_idx[..., None], axis=1)  # [B, n_elite, H]
            onehot = jax.nn.one_hot(elite, A)  # [B, n_elite, H, A]
            new_probs = onehot.mean(axis=1)  # [B, H, A]
            return 0.5 * probs + 0.5 * new_probs, None

        probs, _ = jax.lax.scan(cem_iter, probs, jax.random.split(k3, self.cem_iterations))

        first = jnp.where(invalid_mask, 0.0, probs[:, 0])
        greedy = jnp.argmax(first, axis=-1).astype(jnp.int32)
        rand_logits = jnp.where(  # width = ENCODED action space, mask broadcasts up
            invalid_mask, -jnp.inf, jnp.zeros((invalid_mask.shape[0], self.num_actions))
        )
        a_rand = jax.random.categorical(k4, rand_logits, -1).astype(jnp.int32)
        explore = jnp.logical_and(
            ctx.training, jax.random.uniform(k4, (B,)) < self.epsilon
        )
        action = jnp.where(explore, a_rand, greedy)
        return action, DreamerActorState(h=h, z=z, prev_action=action)

    def train(self, state: DreamerState, key: Array, num_steps: int) -> Tuple[DreamerState, Dict[str, Array]]:
        """World-model training only (planning needs no policy learning)."""

        def one_update(st: DreamerState, k):
            k1, k2 = jax.random.split(k)
            batch, _ = self._replay.sample_with_indices(st.memory, k1, self.batch_size)
            (wm_loss, _), wm_grads = jax.value_and_grad(self._wm_loss, has_aux=True)(
                st.wm_params, batch, k2
            )
            if self.pmean_axis is not None:
                wm_grads = self.dp_pmean(wm_grads)
            wm_up, wm_opt = self._wm_tx.update(wm_grads, st.wm_opt, st.wm_params)
            wm_params = optax.apply_updates(st.wm_params, wm_up)
            ready = self._replay.is_warmup_over(st.memory)
            wm_params = masked_update(ready, wm_params, st.wm_params)
            wm_opt = masked_update(ready, wm_opt, st.wm_opt)
            return (
                st.replace(
                    wm_params=wm_params,
                    wm_opt=wm_opt,
                    train_count=st.train_count + ready.astype(jnp.int32),
                ),
                wm_loss,
            )

        state, losses = jax.lax.scan(one_update, state, jax.random.split(key, num_steps))
        return state, {"wm_loss": jnp.mean(losses), "train_count": state.train_count.astype(jnp.float32)}
