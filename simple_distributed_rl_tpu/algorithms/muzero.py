"""MuZero (parity: srl/algorithms/muzero/ — PUCT search over a LEARNED model:
representation h(obs) -> latent, dynamics g(latent, a) -> (latent', reward),
prediction f(latent) -> (policy, value); categorical (twohot) value/reward heads,
min-max Q normalization, dirichlet root noise, visit-count policy targets, K-step
unrolled training with gradient scaling).

TPU re-design: the search never touches the env — nodes are latent vectors in fixed
[B, M, D] arrays, so each simulation is [vectorized PUCT descend] -> [ONE batched
dynamics+prediction eval] -> [vectorized backup], fully on the MXU. Training windows
(obs_t, actions/policies/rewards/returns for K unroll steps) are sliced chunk-wide
from the step view with absorbing-state padding past episode ends, replacing the
reference's per-worker trajectory bookkeeping.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from flax import struct

from ..define import RLBaseTypes
from ..memories.replay_buffer import ReplayBuffer
from ..models.blocks import InputBlockConfig, MLPBlock
from ..utils import rl_functions as funcs
from .base import AlgoConfig, StepView
from .common import masked_update
import optax

Array = jax.Array

UNSET = -1


class ReprNet(nn.Module):
    obs_space: Any
    input_block: InputBlockConfig
    latent_dim: int

    @nn.compact
    def __call__(self, obs):
        x = self.input_block.create_block(self.obs_space)(jnp.asarray(obs, jnp.float32))
        x = MLPBlock((128,))(x)
        x = nn.Dense(self.latent_dim)(x)
        # min-max normalize the latent (muzero appendix G)
        mn = x.min(-1, keepdims=True)
        mx = x.max(-1, keepdims=True)
        return (x - mn) / jnp.maximum(mx - mn, 1e-6)


class DynamicsNet(nn.Module):
    latent_dim: int
    num_actions: int
    reward_bins: int

    @nn.compact
    def __call__(self, latent, a_onehot):
        x = jnp.concatenate([latent, a_onehot], axis=-1)
        h = MLPBlock((128,))(x)
        nxt = nn.Dense(self.latent_dim)(h)
        mn = nxt.min(-1, keepdims=True)
        mx = nxt.max(-1, keepdims=True)
        nxt = (nxt - mn) / jnp.maximum(mx - mn, 1e-6)
        reward_logits = nn.Dense(self.reward_bins)(MLPBlock((64,))(h))
        return nxt, reward_logits


class PredNet(nn.Module):
    num_actions: int
    value_bins: int

    @nn.compact
    def __call__(self, latent):
        h = MLPBlock((128,))(latent)
        policy = nn.Dense(self.num_actions, kernel_init=nn.initializers.zeros)(h)
        value_logits = nn.Dense(self.value_bins)(MLPBlock((64,))(h))
        return policy, value_logits


@struct.dataclass
class MZActorState:
    sampling_step: Array  # [B]
    last_pi: Array  # [B, A]


@struct.dataclass
class MZState:
    params: Any  # {repr, dynamics, pred}
    opt_state: Any
    memory: Any
    q_min: Array
    q_max: Array
    train_count: Array


@struct.dataclass
class MZItem:
    """One training window: root obs + K-step targets."""

    obs: Any  # [...]: observation at t
    actions: Array  # [K] actions t .. t+K-1
    policies: Array  # [K+1, A] search policies t .. t+K
    rewards: Array  # [K] observed rewards t .. t+K-1
    z: Array  # [K+1] value targets t .. t+K


@dataclasses.dataclass
class MuZeroConfig(AlgoConfig):
    num_simulations: int = 20
    discount: float = 0.999
    unroll_steps: int = 3
    sampling_steps: int = 2
    root_dirichlet_alpha: float = 0.3
    root_exploration_fraction: float = 0.25
    c_base: float = 19652.0
    c_init: float = 1.25
    batch_size: int = 64
    capacity: int = 100_000
    warmup_size: int = 500
    lr: float = 0.001
    latent_dim: int = 32
    v_min: float = -2.0
    v_max: float = 2.0
    value_bins: int = 21
    input_block: InputBlockConfig = dataclasses.field(default_factory=InputBlockConfig)

    observation_type: RLBaseTypes = RLBaseTypes.BOX
    action_type: RLBaseTypes = RLBaseTypes.DISCRETE

    has_actor_state: bool = True
    needs_step_view: bool = True

    def get_name(self) -> str:
        return "MuZero"

    def on_setup(self) -> None:
        self.A = self.action_space.n
        self.M = self.num_simulations + 1
        self.repr_net = ReprNet(self.obs_space, self.input_block, self.latent_dim)
        self.dyn_net = DynamicsNet(self.latent_dim, self.A, self.value_bins)
        self.pred_net = PredNet(self.A, self.value_bins)
        self._replay = ReplayBuffer(self.capacity, self.warmup_size)
        self._tx = optax.adam(self.lr)

    def _decode_bins(self, logits):
        return funcs.twohot_decode(
            jax.nn.softmax(logits, axis=-1), self.value_bins, self.v_min, self.v_max
        )

    def _example_item(self) -> MZItem:
        K, A = self.unroll_steps, self.A
        return MZItem(
            obs=self.obs_space.zero(),
            actions=jnp.zeros((K,), jnp.int32),
            policies=jnp.full((K + 1, A), 1.0 / A),
            rewards=jnp.zeros((K,)),
            z=jnp.zeros((K + 1,)),
        )

    def init(self, key: Array) -> MZState:
        k1, k2, k3 = jax.random.split(key, 3)
        obs0 = self.obs_space.zero()[None]
        latent0 = jnp.zeros((1, self.latent_dim))
        params = {
            "repr": self.repr_net.init(k1, obs0),
            "dyn": self.dyn_net.init(k2, latent0, jnp.zeros((1, self.A))),
            "pred": self.pred_net.init(k3, latent0),
        }
        return MZState(
            params=params,
            opt_state=self._tx.init(params),
            memory=self._replay.init(self._example_item()),
            q_min=jnp.asarray(jnp.inf),
            q_max=jnp.asarray(-jnp.inf),
            train_count=jnp.asarray(0, jnp.int32),
        )

    def init_actor_state(self, key, num_envs) -> MZActorState:
        return MZActorState(
            sampling_step=jnp.zeros((num_envs,), jnp.int32),
            last_pi=jnp.full((num_envs, self.A), 1.0 / self.A),
        )

    def actor_snapshot(self, actor: MZActorState):
        return {"pi": actor.last_pi}

    # ------------------------------------------------------------------
    def _search(self, params, obs, invalid_mask, q_min, q_max, key, is_training):
        """Latent-space PUCT (muzero pseudocode). Nodes: latent [B, M, D]."""
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
        # invalid actions only constrain the ROOT (the learned model has no legality
        # notion below the root — muzero paper)
        root_invalid = invalid_mask
        child_prior = jnp.zeros((B, M, A)).at[:, 0].set(prior0)
        child_index = jnp.full((B, M, A), UNSET, jnp.int32)
        visits = jnp.zeros((B, M))
        value_sum = jnp.zeros((B, M))

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

            key, k_desc = jax.random.split(key)
            path, acts, depth, parent, action = jax.vmap(descend)(
                child_prior, child_index, visits, value_sum, root_invalid,
                jax.random.split(k_desc, B),
            )

            idxB = jnp.arange(B)
            parent_latent = node_latent[idxB, parent]
            a_onehot = jax.nn.one_hot(action, A)
            latent2, r_logits = self.dyn_net.apply(params["dyn"], parent_latent, a_onehot)
            reward = self._decode_bins(r_logits)
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

    # ------------------------------------------------------------------
    def policy_step(self, state: MZState, actor: MZActorState, obs, invalid_mask, ctx, key, episode_start):
        key, k_search, k_pick = jax.random.split(key, 3)
        counts, v0, _, _ = self._search(
            state.params, obs, invalid_mask, state.q_min, state.q_max, k_search, ctx.training
        )
        pi = counts / jnp.maximum(counts.sum(-1, keepdims=True), 1.0)
        sampling_step = jnp.where(episode_start, 0, actor.sampling_step)
        logits = jnp.where(counts > 0, jnp.log(jnp.maximum(counts, 1e-12)), -jnp.inf)
        a_prop = jax.random.categorical(k_pick, logits, -1).astype(jnp.int32)
        a_max = funcs.random_max_index(counts, jnp.zeros_like(invalid_mask), k_pick)
        explore = jnp.logical_and(ctx.training, sampling_step < self.sampling_steps)
        action = jnp.where(explore, a_prop, a_max)
        return action, MZActorState(sampling_step=sampling_step + 1, last_pi=pi)

    # ------------------------------------------------------------------
    def _build_windows(self, sv: StepView):
        """Chunk-wide window construction shared with the stochastic variant.
        Returns (MZItem [T, B, ...], valid [T, B], z [T, B])."""
        return self.__windows(sv)

    def observe_chunk(self, state: MZState, transitions, mask, sv: StepView) -> MZState:
        items, valid, z = self._build_windows(sv)
        flat = jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), items)
        memory = self._replay.add_masked(state.memory, flat, valid.reshape(-1))
        zz = jnp.where(valid, z, jnp.inf)
        q_min = jnp.minimum(state.q_min, zz.min())
        zz = jnp.where(valid, z, -jnp.inf)
        q_max = jnp.maximum(state.q_max, zz.max())
        return state.replace(memory=memory, q_min=q_min, q_max=q_max)

    def __windows(self, sv: StepView):
        T, B = sv.reward.shape
        K = self.unroll_steps
        done = jnp.logical_or(sv.terminated, sv.truncated)

        # MC return-to-go in-chunk
        def back(carry, x):
            r, d = x
            ret = r + self.discount * jnp.where(d, 0.0, carry)
            return ret, ret

        _, rets = jax.lax.scan(back, jnp.zeros((B,)), (sv.reward[::-1], done[::-1]))
        z = rets[::-1]

        def fwd(carry, d):
            seen = jnp.logical_or(carry, d)
            return seen, seen

        _, completed = jax.lax.scan(fwd, jnp.zeros((B,), bool), done[::-1])
        completed = completed[::-1]
        was_reset = jnp.concatenate([jnp.zeros_like(done[:1]), done[:-1]], axis=0)

        # absorbing padding: once done occurs inside the window, later policies are
        # uniform, rewards/z zero, actions arbitrary (muzero absorbing-state training)
        def shifted(x, j, fill=0.0):
            if j == 0:
                return x
            pad = jnp.full_like(x[:j], fill)
            return jnp.concatenate([x[j:], pad], axis=0)

        # inside_done[t, j]: a done occurred at steps t .. t+j-1 (window absorbed)
        absorbed = jnp.zeros((T, B), bool)
        pis, zs, rews, acts_l = [sv.actor_snapshot["pi"]], [z], [], []
        absorbed_j = jnp.zeros((T, B), bool)
        for j in range(K):
            d_j = shifted(done, j, fill=False) if j > 0 else done
            rews.append(jnp.where(absorbed_j, 0.0, shifted(sv.reward, j)))
            acts_l.append(jnp.where(absorbed_j, 0, shifted(sv.action, j)).astype(jnp.int32))
            absorbed_j = jnp.logical_or(absorbed_j, shifted(done, j, fill=True))
            pi_next = shifted(sv.actor_snapshot["pi"], j + 1)
            pis.append(
                jnp.where(absorbed_j[..., None], 1.0 / self.A, pi_next)
            )
            zs.append(jnp.where(absorbed_j, 0.0, shifted(z, j + 1)))

        items = MZItem(
            obs=sv.obs,
            actions=jnp.stack(acts_l, axis=2),  # [T, B, K]
            policies=jnp.stack(pis, axis=2),  # [T, B, K+1, A]
            rewards=jnp.stack(rews, axis=2),  # [T, B, K]
            z=jnp.stack(zs, axis=2),  # [T, B, K+1]
        )
        # valid windows: base step is a real decision with a known return, and the
        # window does not run off the chunk tail un-absorbed
        tail_ok = jnp.arange(T)[:, None] < (T - K)
        valid = completed & jnp.logical_not(was_reset) & tail_ok
        return items, valid, z

    # ------------------------------------------------------------------
    def train(self, state: MZState, key: Array, num_steps: int) -> Tuple[MZState, Dict[str, Array]]:
        K = self.unroll_steps

        def loss_fn(params, batch: MZItem):
            latent = self.repr_net.apply(params["repr"], jnp.asarray(batch.obs, jnp.float32))
            total = 0.0
            for k in range(K + 1):
                p_logits, v_logits = self.pred_net.apply(params["pred"], latent)
                lp = jax.nn.log_softmax(p_logits, -1)
                l_pi = -jnp.mean(jnp.sum(batch.policies[:, k] * lp, -1))
                v_target = funcs.twohot_encode(
                    batch.z[:, k], self.value_bins, self.v_min, self.v_max
                )
                l_v = -jnp.mean(jnp.sum(v_target * jax.nn.log_softmax(v_logits, -1), -1))
                step_loss = l_pi + l_v
                if k < K:
                    a_onehot = jax.nn.one_hot(batch.actions[:, k], self.A)
                    latent, r_logits = self.dyn_net.apply(params["dyn"], latent, a_onehot)
                    r_target = funcs.twohot_encode(
                        batch.rewards[:, k], self.value_bins, self.v_min, self.v_max
                    )
                    l_r = -jnp.mean(jnp.sum(r_target * jax.nn.log_softmax(r_logits, -1), -1))
                    step_loss = step_loss + l_r
                    # scale gradient through the latent (muzero appendix G)
                    latent = latent * 0.5 + jax.lax.stop_gradient(latent) * 0.5
                total = total + step_loss / (K + 1)
            return total

        def one_update(st: MZState, k):
            batch, _ = self._replay.sample_with_indices(st.memory, k, self.batch_size)
            loss, grads = jax.value_and_grad(loss_fn)(st.params, batch)
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

    def params_of(self, state: MZState):
        return {"params": state.params, "q_min": state.q_min, "q_max": state.q_max}

    def restore_params(self, state: MZState, p) -> MZState:
        return state.replace(params=p["params"], q_min=p["q_min"], q_max=p["q_max"])
