"""StochasticMuZero (parity: srl/algorithms/stochastic_muzero/ — MuZero with a
stochastic world model: action edges lead to AFTERSTATES, chance outcomes are
discrete codes learned by a VQ-style encoder from the next observation, and the
dynamics consume (afterstate, chance code)).

Compact TPU re-design on this framework's MuZero scaffolding: the tree keeps latent
decision nodes; traversing an edge applies afterstate dynamics then SAMPLES a chance
code from the learned prior sigma(afterstate) (sampled-chance search — fresh
stochasticity per simulation instead of explicit chance-node statistics, documented
simplification). Training unrolls with the codes the encoder OBSERVED, with a chance
prior cross-entropy and straight-through code commitment."""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..utils import rl_functions as funcs
from .common import masked_update
from .muzero import MuZeroConfig, MZItem, MZState, PredNet, ReprNet, UNSET
from ..models.blocks import MLPBlock

Array = jax.Array


class AfterstateDyn(nn.Module):
    latent_dim: int
    num_actions: int

    @nn.compact
    def __call__(self, latent, a_onehot):
        h = MLPBlock((128,))(jnp.concatenate([latent, a_onehot], -1))
        out = nn.Dense(self.latent_dim)(h)
        mn, mx = out.min(-1, keepdims=True), out.max(-1, keepdims=True)
        return (out - mn) / jnp.maximum(mx - mn, 1e-6)


class ChanceDyn(nn.Module):
    latent_dim: int
    num_codes: int
    reward_bins: int

    @nn.compact
    def __call__(self, afterstate, code_onehot):
        h = MLPBlock((128,))(jnp.concatenate([afterstate, code_onehot], -1))
        nxt = nn.Dense(self.latent_dim)(h)
        mn, mx = nxt.min(-1, keepdims=True), nxt.max(-1, keepdims=True)
        nxt = (nxt - mn) / jnp.maximum(mx - mn, 1e-6)
        reward_logits = nn.Dense(self.reward_bins)(MLPBlock((64,))(h))
        return nxt, reward_logits


class ChancePrior(nn.Module):
    num_codes: int

    @nn.compact
    def __call__(self, afterstate):
        return nn.Dense(self.num_codes)(MLPBlock((64,))(afterstate))


class ChanceEncoder(nn.Module):
    """obs -> discrete chance code (VQ-style argmax with straight-through)."""

    obs_space: Any
    input_block: Any
    num_codes: int

    @nn.compact
    def __call__(self, obs):
        from ..models.blocks import InputBlockConfig

        x = self.input_block.create_block(self.obs_space)(jnp.asarray(obs, jnp.float32))
        logits = nn.Dense(self.num_codes)(MLPBlock((64,))(x))
        code = jax.nn.one_hot(jnp.argmax(logits, -1), self.num_codes)
        code = code + jax.nn.softmax(logits, -1) - jax.lax.stop_gradient(
            jax.nn.softmax(logits, -1)
        )
        return code, logits


@struct.dataclass
class SMZItem:
    base: MZItem
    next_obs: Any  # [K, ...] next observations for the chance encoder


@dataclasses.dataclass
class StochasticMuZeroConfig(MuZeroConfig):
    num_codes: int = 8

    def get_name(self) -> str:
        return "StochasticMuZero"

    def on_setup(self) -> None:
        super().on_setup()
        self.after_dyn = AfterstateDyn(self.latent_dim, self.A)
        self.chance_dyn = ChanceDyn(self.latent_dim, self.num_codes, self.value_bins)
        self.chance_prior = ChancePrior(self.num_codes)
        self.chance_enc = ChanceEncoder(self.obs_space, self.input_block, self.num_codes)

    def _example_item(self) -> SMZItem:
        obs0 = self.obs_space.zero()
        return SMZItem(
            base=super()._example_item(),
            next_obs=jnp.zeros((self.unroll_steps,) + obs0.shape, obs0.dtype),
        )

    def init(self, key: Array) -> MZState:
        ks = jax.random.split(key, 6)
        obs0 = self.obs_space.zero()[None]
        latent0 = jnp.zeros((1, self.latent_dim))
        params = {
            "repr": self.repr_net.init(ks[0], obs0),
            "after": self.after_dyn.init(ks[1], latent0, jnp.zeros((1, self.A))),
            "chance": self.chance_dyn.init(ks[2], latent0, jnp.zeros((1, self.num_codes))),
            "prior": self.chance_prior.init(ks[3], latent0),
            "enc": self.chance_enc.init(ks[4], obs0),
            "pred": self.pred_net.init(ks[5], latent0),
        }
        return MZState(
            params=params,
            opt_state=self._tx.init(params),
            memory=self._replay.init(self._example_item()),
            q_min=jnp.asarray(jnp.inf),
            q_max=jnp.asarray(-jnp.inf),
            train_count=jnp.asarray(0, jnp.int32),
        )

    def _dynamics_step(self, params, latent, action, key):
        """action edge: afterstate -> sampled chance code -> next latent + reward."""
        a_onehot = jax.nn.one_hot(action, self.A)
        after = self.after_dyn.apply(params["after"], latent, a_onehot)
        c_logits = self.chance_prior.apply(params["prior"], after)
        code = jax.random.categorical(key, c_logits, -1)
        nxt, r_logits = self.chance_dyn.apply(
            params["chance"], after, jax.nn.one_hot(code, self.num_codes)
        )
        return nxt, self._decode_bins(r_logits)

    # override the deterministic MuZero search step with the stochastic dynamics
    def _search(self, params, obs, invalid_mask, q_min, q_max, key, is_training):
        B, A, M, D = invalid_mask.shape[0], self.A, self.M, self.latent_dim

        k_noise, key = jax.random.split(key)
        latent0 = self.repr_net.apply(params["repr"], obs)
        logits0, v_logits0 = self.pred_net.apply(params["pred"], latent0)
        v0 = self._decode_bins(v_logits0)
        prior0 = jax.nn.softmax(jnp.where(invalid_mask, -jnp.inf, logits0), -1)
        noise = jax.random.dirichlet(k_noise, jnp.full((A,), self.root_dirichlet_alpha), (B,))
        e = jnp.where(is_training, self.root_exploration_fraction, 0.0)
        prior0 = (1 - e) * prior0 + e * noise
        prior0 = jnp.where(invalid_mask, 0.0, prior0)
        prior0 = prior0 / jnp.maximum(prior0.sum(-1, keepdims=True), 1e-12)

        node_latent = jnp.zeros((B, M, D)).at[:, 0].set(latent0)
        node_reward = jnp.zeros((B, M))
        child_prior = jnp.zeros((B, M, A)).at[:, 0].set(prior0)
        child_index = jnp.full((B, M, A), UNSET, jnp.int32)
        visits = jnp.zeros((B, M))
        value_sum = jnp.zeros((B, M))
        root_invalid = invalid_mask

        def one_sim(carry, sim_i):
            (node_latent, node_reward, child_prior, child_index, visits, value_sum,
             qmin, qmax, key) = carry
            new_idx = sim_i + 1

            def descend(cp, ci, vis, vsum, rinv, k):
                path = jnp.full((M,), UNSET, jnp.int32)
                acts = jnp.zeros((M,), jnp.int32)

                def cond(c):
                    return jnp.logical_not(c[2])

                def body(c):
                    cur, depth, stop, path, acts, k = c
                    k, kk = jax.random.split(k)
                    n_par = vis[cur]
                    cfac = jnp.log((1 + n_par + self.c_base) / self.c_base) + self.c_init
                    child = ci[cur]
                    n = jnp.where(child >= 0, vis[jnp.maximum(child, 0)], 0.0)
                    q = jnp.where(
                        child >= 0,
                        vsum[jnp.maximum(child, 0)] / jnp.maximum(n, 1.0),
                        0.0,
                    )
                    q = jnp.where(qmin < qmax, (q - qmin) / jnp.maximum(qmax - qmin, 1e-12), q)
                    score = q + cfac * cp[cur] * jnp.sqrt(n_par) / (1.0 + n)
                    score = jnp.where(jnp.logical_and(cur == 0, rinv), -jnp.inf, score)
                    a = funcs.random_max_index(score[None], jnp.zeros((1, A), bool), kk)[0]
                    path = path.at[depth].set(cur)
                    acts = acts.at[depth].set(a)
                    nxt = ci[cur, a]
                    stop = nxt == UNSET
                    cur = jnp.where(stop, cur, nxt)
                    return cur, depth + 1, stop, path, acts, k

                cur, depth, _, path, acts, k = jax.lax.while_loop(
                    cond, body,
                    (jnp.asarray(0), jnp.asarray(0), jnp.asarray(False), path, acts, k),
                )
                return path, acts, depth, path[depth - 1], acts[depth - 1]

            key, k_desc, k_chance = jax.random.split(key, 3)
            path, acts, depth, parent, action = jax.vmap(descend)(
                child_prior, child_index, visits, value_sum, root_invalid,
                jax.random.split(k_desc, B),
            )

            idxB = jnp.arange(B)
            parent_latent = node_latent[idxB, parent]
            latent2, reward = jax.vmap(
                lambda l, a, k: self._dynamics_step(params, l[None], a[None], k)
            )(parent_latent, action, jax.random.split(k_chance, B))
            latent2 = latent2[:, 0]
            reward = reward[:, 0]
            logits, v_logits = self.pred_net.apply(params["pred"], latent2)
            v_leaf = self._decode_bins(v_logits)
            prior = jax.nn.softmax(logits, -1)

            node_latent = node_latent.at[idxB, new_idx].set(latent2)
            node_reward = node_reward.at[idxB, new_idx].set(reward)
            child_prior = child_prior.at[idxB, new_idx].set(prior)
            child_index = child_index.at[idxB, parent, action].set(new_idx)

            def backup(path, depth, vis, vs, nrew, leaf_v):
                val = nrew[new_idx] + self.discount * leaf_v
                vis = vis.at[new_idx].add(1.0)
                vs = vs.at[new_idx].add(val)

                def body(i, c):
                    val, vis, vs = c
                    node = path[depth - 1 - i]
                    newval = nrew[node] + self.discount * val
                    vis = vis.at[node].add(1.0)
                    vs = vs.at[node].add(newval)
                    return newval, vis, vs

                _, vis, vs = jax.lax.fori_loop(0, depth, body, (val, vis, vs))
                return vis, vs

            visits, value_sum = jax.vmap(backup)(
                path, depth, visits, value_sum, node_reward, v_leaf
            )
            q_all = value_sum / jnp.maximum(visits, 1.0)
            qmin = jnp.minimum(qmin, jnp.min(jnp.where(visits > 0, q_all, jnp.inf)))
            qmax = jnp.maximum(qmax, jnp.max(jnp.where(visits > 0, q_all, -jnp.inf)))
            return (node_latent, node_reward, child_prior, child_index, visits,
                    value_sum, qmin, qmax, key), None

        carry = (node_latent, node_reward, child_prior, child_index, visits,
                 value_sum, q_min, q_max, key)
        carry, _ = jax.lax.scan(one_sim, carry, jnp.arange(self.num_simulations))
        (_, _, _, child_index, visits, _, q_min, q_max, _) = carry
        idxB = jnp.arange(B)[:, None]
        rc = child_index[:, 0]
        counts = jnp.where(rc >= 0, visits[idxB, jnp.maximum(rc, 0)], 0.0)
        return counts, v0, q_min, q_max

    # --- training: observed next-obs drive the chance encoder ------------------
    def observe_chunk(self, state: MZState, transitions, mask, sv) -> MZState:
        items, valid, z = self._build_windows(sv)
        K = self.unroll_steps
        # next-obs windows: obs at t+1 .. t+K (chunk-shifted; tails masked by valid)
        nxt = []
        for j in range(1, K + 1):
            pad = jnp.repeat(sv.obs[-1:], j, axis=0)
            nxt.append(jnp.concatenate([sv.obs[j:], pad], axis=0))
        next_obs = jnp.stack(nxt, axis=2)  # [T, B, K, ...]
        smz = SMZItem(base=items, next_obs=next_obs)
        flat = jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), smz)
        memory = self._replay.add_masked(state.memory, flat, valid.reshape(-1))
        zz = jnp.where(valid, z, jnp.inf)
        q_min = jnp.minimum(state.q_min, zz.min())
        zz = jnp.where(valid, z, -jnp.inf)
        q_max = jnp.maximum(state.q_max, zz.max())
        return state.replace(memory=memory, q_min=q_min, q_max=q_max)

    def train(self, state: MZState, key: Array, num_steps: int) -> Tuple[MZState, Dict[str, Array]]:
        K = self.unroll_steps

        def loss_fn(params, batch: SMZItem, k):
            b = batch.base
            latent = self.repr_net.apply(params["repr"], jnp.asarray(b.obs, jnp.float32))
            total = 0.0
            for kk in range(K + 1):
                p_logits, v_logits = self.pred_net.apply(params["pred"], latent)
                lp = jax.nn.log_softmax(p_logits, -1)
                l_pi = -jnp.mean(jnp.sum(b.policies[:, kk] * lp, -1))
                v_target = funcs.twohot_encode(
                    b.z[:, kk], self.value_bins, self.v_min, self.v_max
                )
                l_v = -jnp.mean(jnp.sum(v_target * jax.nn.log_softmax(v_logits, -1), -1))
                step_loss = l_pi + l_v
                if kk < K:
                    a_onehot = jax.nn.one_hot(b.actions[:, kk], self.A)
                    after = self.after_dyn.apply(params["after"], latent, a_onehot)
                    c_logits = self.chance_prior.apply(params["prior"], after)
                    # straight-through code from the observed next obs — gradients
                    # flow into the encoder through the dynamics
                    code, enc_logits = self.chance_enc.apply(
                        params["enc"], batch.next_obs[:, kk]
                    )
                    l_chance = jnp.mean(
                        optax.softmax_cross_entropy(
                            c_logits, jax.lax.stop_gradient(code)
                        )
                    )
                    latent, r_logits = self.chance_dyn.apply(params["chance"], after, code)
                    r_target = funcs.twohot_encode(
                        b.rewards[:, kk], self.value_bins, self.v_min, self.v_max
                    )
                    l_r = -jnp.mean(jnp.sum(r_target * jax.nn.log_softmax(r_logits, -1), -1))
                    step_loss = step_loss + l_r + l_chance
                    latent = latent * 0.5 + jax.lax.stop_gradient(latent) * 0.5
                total = total + step_loss / (K + 1)
            return total

        def one_update(st: MZState, k):
            k1, k2 = jax.random.split(k)
            batch, _ = self._replay.sample_with_indices(st.memory, k1, self.batch_size)
            loss, grads = jax.value_and_grad(loss_fn)(st.params, batch, k2)
            if self.pmean_axis is not None:
                grads = self.dp_pmean(grads)
            updates, opt_state = self._tx.update(grads, st.opt_state, st.params)
            new_params = optax.apply_updates(st.params, updates)
            ready = self._replay.is_warmup_over(st.memory)
            params = masked_update(ready, new_params, st.params)
            opt_state = masked_update(ready, opt_state, st.opt_state)
            return (
                st.replace(
                    params=params, opt_state=opt_state,
                    train_count=st.train_count + ready.astype(jnp.int32),
                ),
                loss,
            )

        state, losses = jax.lax.scan(one_update, state, jax.random.split(key, num_steps))
        return state, {"loss": jnp.mean(losses), "train_count": state.train_count.astype(jnp.float32)}
