"""EfficientZeroV2 (parity: srl/algorithms/efficient_zero_v2/ — MuZero with
sample-efficiency upgrades, EfficientZero arXiv:2111.00210 / EZ-V2
arXiv:2403.00564):

- LSTM value-prefix dynamics: the dynamics net carries an LSTM hidden along the
  unroll and predicts the cumulative discounted reward since the root
  ("value prefix") instead of per-step reward (model.py dynamics_net,
  trainer.py:118-150),
- SimSiam self-supervised consistency: projector + prediction head pull the
  unrolled latent toward the representation of the actually observed next state
  (trainer.py consist_loss_func:24-33,124-129),
- top-k candidate expansion: nodes expand only num_top_actions children — at the
  root half from the policy's top-k and half uniformly random, elsewhere the
  policy's top-k (mcts.py Node.expand:31-51),
- soft-MinMax Q normalization with globally tracked q_min/q_max and the mean-Q
  value for unvisited children (mcts.py _select_node:139-165),
- Gumbel-style learning policy: completed-Q softmax
  pi = softmax((c_visit + max_visit) * c_scale * completed_q)
  (worker.py:62-84),
- visit-count temperature action sampling with a stepped tau schedule
  (worker.py:46-58, config policy_tau_scheduler).

TPU re-design: built on this framework's batched jittable latent PUCT (muzero.py
_search) — fixed [B, M] node arena, while_loop descent, fori backup — extended
with per-node LSTM state arenas and a per-node allowed-children mask for top-k
expansion. Value targets are the in-chunk MC return (the reference flushes whole
episodes, worker.py:104-160; same redesign as MuZero here). The value-prefix
target for unroll depth k is sum_{j<=k} gamma^j r_{t+j} per the EfficientZero
paper; the reference reuses the full MC return in the reward bins
(worker.py:137-150) — a quirk not reproduced. The reference's MC backup
(leaf v unused, q_sum += value_prefix, mcts.py:120-137) is re-expressed as the
standard PUCT backup over implied per-edge rewards r = vp_node - gamma*...
prefix difference, keeping Q estimates well-defined at any depth.

Continuous action spaces use the reference's sampled-candidate search
(mcts.py Node.expand continuous branch / _calc_rsample_logprob:52-75): every node
holds C = num_top_actions candidate actions drawn from its squashed-gaussian
policy head — at the root half at the policy's variance and half at variance+0.1
(p_dist.increase_variance(0.1)) — with priors from the squashed log-density
(normalized across candidates here so PUCT scores stay bounded; the reference
uses raw exp(logprob)). The candidate vectors live in a [B, M, C, adim] arena
beside the child-index arena; descent/backup are shared with the discrete path.
The policy loss is the negative squashed-gaussian log-likelihood of the taken
action (trainer.py:113,135), env actions stored at env scale and atanh'd back.
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
from ..memories.replay_buffer import ReplayBuffer
from ..spaces import Box, Discrete
from ..models.blocks import InputBlockConfig, MLPBlock
from ..utils import rl_functions as funcs
from .base import AlgoConfig, StepView
from .common import masked_update

Array = jax.Array
UNSET = -1


class EZReprNet(nn.Module):
    obs_space: Any
    input_block: InputBlockConfig
    latent_dim: int

    @nn.compact
    def __call__(self, obs):
        x = self.input_block.create_block(self.obs_space)(jnp.asarray(obs, jnp.float32))
        x = MLPBlock((128,))(x)
        x = nn.Dense(self.latent_dim)(x)
        mn = x.min(-1, keepdims=True)
        mx = x.max(-1, keepdims=True)
        return (x - mn) / jnp.maximum(mx - mn, 1e-6)


class EZDynamicsNet(nn.Module):
    """latent + action + LSTM hidden -> next latent, value-prefix logits, hidden
    (model.py dynamics_net: the LSTM accumulates the reward prefix along the
    unroll)."""

    latent_dim: int
    num_actions: int
    reward_bins: int
    lstm_units: int

    @nn.compact
    def __call__(self, latent, a_onehot, carry):
        x = jnp.concatenate([latent, a_onehot], axis=-1)
        h = MLPBlock((128,))(x)
        nxt = nn.Dense(self.latent_dim)(h)
        mn = nxt.min(-1, keepdims=True)
        mx = nxt.max(-1, keepdims=True)
        nxt = (nxt - mn) / jnp.maximum(mx - mn, 1e-6)
        carry, z = nn.OptimizedLSTMCell(self.lstm_units)(carry, h)
        vp_logits = nn.Dense(self.reward_bins)(MLPBlock((64,))(z))
        return nxt, vp_logits, carry


class EZPredNet(nn.Module):
    num_actions: int
    value_bins: int

    @nn.compact
    def __call__(self, latent):
        h = MLPBlock((128,))(latent)
        policy = nn.Dense(self.num_actions, kernel_init=nn.initializers.zeros)(h)
        value_logits = nn.Dense(self.value_bins)(MLPBlock((64,))(h))
        return policy, value_logits


class EZPredNetCont(nn.Module):
    """Continuous-action prediction head: squashed-gaussian policy params +
    value bins (model.py:270 NormalDistBlock branch)."""

    adim: int
    value_bins: int

    @nn.compact
    def __call__(self, latent):
        h = MLPBlock((128,))(latent)
        loc = nn.Dense(self.adim, kernel_init=nn.initializers.zeros)(h)
        log_scale = jnp.clip(nn.Dense(self.adim)(h), -5.0, 2.0)
        value_logits = nn.Dense(self.value_bins)(MLPBlock((64,))(h))
        return (loc, log_scale), value_logits


class EZProjector(nn.Module):
    """SimSiam projection + prediction head (model.py projector_net)."""

    hid: int
    out: int
    head_hid: int
    head_out: int

    def setup(self):
        self.proj = MLPBlock((self.hid, self.out))
        self.head = MLPBlock((self.head_hid, self.head_out))

    def __call__(self, latent):  # prediction branch
        return self.head(self.proj(latent))

    def projection(self, latent):  # target branch (no head)
        return self.proj(latent)


@struct.dataclass
class EZActorState:
    last_pi: Array  # [B, A] gumbel completed-Q policy (the learning target)


@struct.dataclass
class EZState:
    params: Any  # {repr, dyn, pred, proj}
    opt_state: Any
    memory: Any
    q_min: Array
    q_max: Array
    train_count: Array


@struct.dataclass
class EZItem:
    """One training window: K+1 observations + K actions + targets."""

    obs: Any  # [K+1, ...]
    actions: Array  # [K]
    policies: Array  # [K+1, A]
    value_prefix: Array  # [K] discounted cumulative reward from the base step
    z: Array  # [K+1] MC value targets
    absorbed: Array  # [K+1] f32: 1 past episode end (losses masked)


@dataclasses.dataclass
class EfficientZeroV2Config(AlgoConfig):
    """Config (parity: efficient_zero_v2/config.py:27-153; MLP-sized defaults —
    use set_atari_config for the resnet-scale image preset)."""

    num_simulations: int = 50
    num_top_actions: int = 4
    c_base: float = 19652.0
    c_init: float = 1.25
    root_dirichlet_alpha: float = 0.3
    root_exploration_fraction: float = 0.25
    soft_minmax_q_e: float = 0.01
    enable_gumbel_search: bool = True
    c_visit: int = 50
    c_scale: float = 0.1
    discount: float = 0.997
    batch_size: int = 64
    capacity: int = 100_000
    warmup_size: int = 500
    lr: float = 1e-3
    latent_dim: int = 32
    lstm_units: int = 32
    v_min: float = -20.0
    v_max: float = 20.0
    value_bins: int = 100
    projection_hid: int = 64
    projection_out: int = 64
    projection_head_hid: int = 32
    projection_head_out: int = 64
    max_grad_norm: float = 5.0
    consistency_loss_coeff: float = 1.0
    policy_loss_coeff: float = 1.0
    value_loss_coeff: float = 1.0
    reward_loss_coeff: float = 1.0
    unroll_steps: int = 5
    test_policy_tau: float = 0.1
    #: stepped tau schedule (config policy_tau_scheduler: 1.0 for 50k steps, 0.5
    #: for 25k, then 0.25)
    policy_tau_points: Tuple[Tuple[int, float], ...] = ((50_000, 1.0), (75_000, 0.5))
    policy_tau_final: float = 0.25
    input_block: InputBlockConfig = dataclasses.field(default_factory=InputBlockConfig)

    observation_type: RLBaseTypes = RLBaseTypes.BOX
    action_type: RLBaseTypes = RLBaseTypes.DISCRETE

    has_actor_state: bool = True
    needs_step_view: bool = True

    def get_name(self) -> str:
        return "EfficientZeroV2"

    def setup(self, env) -> None:
        # continuous action spaces keep their native representation
        if not isinstance(env.action_space, Discrete):
            self.action_type = RLBaseTypes.BOX
        super().setup(env)

    def set_small_params(self):
        """(parity: config.py set_small_params)"""
        self.batch_size = 32
        self.warmup_size = 1000
        self.capacity = 100_000
        self.latent_dim = 32
        self.value_bins = 100
        self.v_min, self.v_max = -20.0, 20.0
        return self

    def on_setup(self) -> None:
        assert self.num_top_actions % 2 == 0
        self.is_discrete = isinstance(self.action_space, Discrete)
        self.M = self.num_simulations + 1
        self.repr_net = EZReprNet(self.obs_space, self.input_block, self.latent_dim)
        if self.is_discrete:
            self.A = self.action_space.n
            self.topk = min(self.num_top_actions, self.A)
            # S = width of the per-node child arena (the action alphabet)
            self.S = self.A
            self.adim = 0
            self.pred_net = EZPredNet(self.A, self.value_bins)
        else:
            aspace = self.action_space
            assert isinstance(aspace, Box)
            self.adim = aspace.flat_size
            self._a_low, self._a_high = float(aspace.low), float(aspace.high)
            # S = sampled-candidate slots per node (mcts.py continuous expand)
            self.S = self.num_top_actions
            self.A = self.S  # child-arena width alias used by the search
            self.pred_net = EZPredNetCont(self.adim, self.value_bins)
        act_width = self.A if self.is_discrete else self.adim
        self.dyn_net = EZDynamicsNet(self.latent_dim, act_width, self.value_bins, self.lstm_units)
        self.proj_net = EZProjector(
            self.projection_hid, self.projection_out,
            self.projection_head_hid, self.projection_head_out,
        )
        self._replay = ReplayBuffer(self.capacity, self.warmup_size)
        self._tx = optax.chain(
            optax.clip_by_global_norm(self.max_grad_norm), optax.adam(self.lr)
        )

    def _decode_bins(self, logits):
        return funcs.twohot_decode(
            jax.nn.softmax(logits, axis=-1), self.value_bins, self.v_min, self.v_max
        )

    def _tau(self, step, training):
        tau = jnp.full_like(jnp.asarray(step, jnp.float32), self.policy_tau_final)
        for limit, val in reversed(self.policy_tau_points):
            tau = jnp.where(step < limit, val, tau)
        return jnp.where(training, tau, self.test_policy_tau)

    def _scale(self, a):
        return self._a_low + (a + 1.0) * 0.5 * (self._a_high - self._a_low)

    def _unscale(self, a_env):
        return jnp.clip(
            (a_env - self._a_low) / (self._a_high - self._a_low) * 2.0 - 1.0,
            -1.0 + 1e-6,
            1.0 - 1e-6,
        )

    @staticmethod
    def _sgp_logp(u, loc, log_scale):
        """Squashed-gaussian log-density of pre-tanh sample u (log_prob_sgp,
        mcts.py:73-75), summed over action dims."""
        var = jnp.exp(2.0 * log_scale)
        logn = -0.5 * ((u - loc) ** 2 / jnp.maximum(var, 1e-8)
                       + 2.0 * log_scale + jnp.log(2.0 * jnp.pi))
        corr = jnp.log(1.0 - jnp.tanh(u) ** 2 + 1e-6)
        return jnp.sum(logn - corr, axis=-1)

    def _sample_candidates(self, loc, log_scale, key, is_root):
        """[.., C, adim] pre-tanh candidates + normalized priors (Node.expand
        continuous branch: root = C/2 at sigma + C/2 at sqrt(var+0.1))."""
        C = self.S
        std = jnp.exp(log_scale)
        widened = jnp.sqrt(std**2 + 0.1)  # p_dist.increase_variance(0.1)
        eps = jax.random.normal(key, loc.shape[:-1] + (C, self.adim))
        std_c = jnp.where(
            is_root,
            jnp.concatenate([
                jnp.broadcast_to(std[..., None, :], loc.shape[:-1] + (C // 2, self.adim)),
                jnp.broadcast_to(widened[..., None, :], loc.shape[:-1] + (C - C // 2, self.adim)),
            ], axis=-2),
            jnp.broadcast_to(std[..., None, :], loc.shape[:-1] + (C, self.adim)),
        )
        u = loc[..., None, :] + std_c * eps
        logp = self._sgp_logp(u, loc[..., None, :], log_scale[..., None, :])
        prior = jax.nn.softmax(logp, axis=-1)
        return u, prior

    def _example_item(self) -> EZItem:
        K, A = self.unroll_steps, self.A
        o0 = self.obs_space.zero()
        if self.is_discrete:
            actions0 = jnp.zeros((K,), jnp.int32)
            policies0 = jnp.full((K + 1, A), 1.0 / A)
        else:
            actions0 = jnp.zeros((K, self.adim), jnp.float32)
            policies0 = jnp.zeros((K + 1, 1))
        return EZItem(
            obs=jnp.zeros((K + 1,) + o0.shape, o0.dtype),
            actions=actions0,
            policies=policies0,
            value_prefix=jnp.zeros((K,)),
            z=jnp.zeros((K + 1,)),
            absorbed=jnp.zeros((K + 1,)),
        )

    def init(self, key: Array) -> EZState:
        ks = jax.random.split(key, 4)
        obs0 = self.obs_space.zero()[None]
        latent0 = jnp.zeros((1, self.latent_dim))
        carry0 = self._zero_carry(1)
        act0 = jnp.zeros((1, self.A if self.is_discrete else self.adim))
        params = {
            "repr": self.repr_net.init(ks[0], obs0),
            "dyn": self.dyn_net.init(ks[1], latent0, act0, carry0),
            "pred": self.pred_net.init(ks[2], latent0),
            "proj": self.proj_net.init(ks[3], latent0),
        }
        return EZState(
            params=params,
            opt_state=self._tx.init(params),
            memory=self._replay.init(self._example_item()),
            q_min=jnp.asarray(jnp.inf),
            q_max=jnp.asarray(-jnp.inf),
            train_count=jnp.asarray(0, jnp.int32),
        )

    def _zero_carry(self, batch: int):
        return (
            jnp.zeros((batch, self.lstm_units)),
            jnp.zeros((batch, self.lstm_units)),
        )

    def init_actor_state(self, key, num_envs) -> EZActorState:
        if self.is_discrete:
            return EZActorState(last_pi=jnp.full((num_envs, self.A), 1.0 / self.A))
        # continuous: no policy CE target (reference step_policy=None, worker.py:89)
        return EZActorState(last_pi=jnp.zeros((num_envs, 1)))

    def actor_snapshot(self, actor: EZActorState):
        return {"pi": actor.last_pi}

    # ------------------------------------------------------------------
    def _expand_mask(self, prior, is_root, key):
        """Top-k allowed-children mask (mcts.py Node.expand). Root: topk/2 by
        prior + topk/2 uniform from the rest; else: topk by prior."""
        A, k = self.A, self.topk
        if k >= A:
            return jnp.ones(prior.shape, bool)
        top_idx = jax.lax.top_k(prior, k)[1]  # [..., k]
        mask_top = jnp.zeros(prior.shape, bool)
        mask_top = jnp.put_along_axis(mask_top, top_idx, True, axis=-1, inplace=False)
        # root: half by prior, half random among the rest
        half_idx = jax.lax.top_k(prior, k // 2)[1]
        mask_half = jnp.zeros(prior.shape, bool)
        mask_half = jnp.put_along_axis(mask_half, half_idx, True, axis=-1, inplace=False)
        g = jax.random.gumbel(key, prior.shape)
        g = jnp.where(mask_half, -jnp.inf, g)
        rand_idx = jax.lax.top_k(g, k // 2)[1]
        mask_root = jnp.put_along_axis(mask_half, rand_idx, True, axis=-1, inplace=False)
        return jnp.where(is_root, mask_root, mask_top)

    def _search(self, params, obs, invalid_mask, q_min, q_max, key, is_training):
        """Batched latent PUCT with LSTM value-prefix nodes and top-k expansion."""
        B, A, M, D, U = invalid_mask.shape[0], self.A, self.M, self.latent_dim, self.lstm_units

        k_noise, k_root, key = jax.random.split(key, 3)
        latent0 = self.repr_net.apply(params["repr"], obs)
        p_out0, v_logits0 = self.pred_net.apply(params["pred"], latent0)
        v0 = self._decode_bins(v_logits0)
        if self.is_discrete:
            prior0 = jax.nn.softmax(jnp.where(invalid_mask, -jnp.inf, p_out0), -1)
            noise = jax.random.dirichlet(k_noise, jnp.full((A,), self.root_dirichlet_alpha), (B,))
            e = jnp.where(is_training, self.root_exploration_fraction, 0.0)
            prior0 = (1 - e) * prior0 + e * noise
            prior0 = jnp.where(invalid_mask, 0.0, prior0)
            prior0 = prior0 / jnp.maximum(prior0.sum(-1, keepdims=True), 1e-12)

            allowed0 = self._expand_mask(prior0, jnp.asarray(True), k_root)
            allowed0 = jnp.logical_and(allowed0, jnp.logical_not(invalid_mask))
            cand0 = jnp.zeros((B, 1, 1))  # unused dummy arena row
        else:
            # sampled-candidate root: C/2 at sigma, C/2 widened (+0.1 variance);
            # exploration comes from the sampling itself, no dirichlet mixing
            cand0, prior0 = self._sample_candidates(*p_out0, k_root, jnp.asarray(True))
            allowed0 = jnp.ones((B, A), bool)

        # per-node sampled candidate actions (continuous only): [B, M, C, adim]
        if self.is_discrete:
            child_action = jnp.zeros((B, 1, 1, 1))
        else:
            child_action = jnp.zeros((B, M, A, self.adim)).at[:, 0].set(cand0)

        node_latent = jnp.zeros((B, M, D)).at[:, 0].set(latent0)
        node_c = jnp.zeros((B, M, U))
        node_h = jnp.zeros((B, M, U))
        node_reward = jnp.zeros((B, M))  # implied per-edge reward (vp difference)
        node_vp = jnp.zeros((B, M))  # value prefix at the node
        child_prior = jnp.zeros((B, M, A)).at[:, 0].set(prior0)
        child_allowed = jnp.zeros((B, M, A), bool).at[:, 0].set(allowed0)
        child_index = jnp.full((B, M, A), UNSET, jnp.int32)
        visits = jnp.zeros((B, M))
        value_sum = jnp.zeros((B, M))

        def one_sim(carry, sim_i):
            (node_latent, node_c, node_h, node_reward, node_vp, child_prior,
             child_allowed, child_index, child_action, visits, value_sum,
             qmin, qmax, key) = carry
            new_idx = sim_i + 1

            def descend(cp, ca, ci, vis, vsum, k):
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
                    # mean-Q for unvisited children (mcts.py:143-147)
                    visited = jnp.logical_and(child >= 0, n > 0)
                    par_q = vsum[cur] / jnp.maximum(vis[cur], 1.0)
                    mean_q = (jnp.sum(jnp.where(visited, q, 0.0)) + par_q) / (
                        jnp.sum(visited) + 1.0
                    )
                    q = jnp.where(visited, q, mean_q)
                    # soft-MinMax normalization (mcts.py:157-159)
                    q = jnp.where(
                        qmin < qmax,
                        (q - qmin) / jnp.maximum(qmax - qmin, self.soft_minmax_q_e),
                        q,
                    )
                    score = q + cfac * cp[cur] * jnp.sqrt(n_par) / (1.0 + n)
                    score = jnp.where(ca[cur], score, -jnp.inf)
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

            key, k_desc, k_exp = jax.random.split(key, 3)
            path, acts, depth, parent, action = jax.vmap(descend)(
                child_prior, child_allowed, child_index, visits, value_sum,
                jax.random.split(k_desc, B),
            )

            idxB = jnp.arange(B)
            parent_latent = node_latent[idxB, parent]
            parent_carry = (node_c[idxB, parent], node_h[idxB, parent])
            if self.is_discrete:
                a_in = jax.nn.one_hot(action, A)
            else:
                a_in = jnp.tanh(child_action[idxB, parent, action])
            latent2, vp_logits, carry2 = self.dyn_net.apply(
                params["dyn"], parent_latent, a_in, parent_carry
            )
            vp = self._decode_bins(vp_logits)
            # implied per-edge reward from the prefix difference
            reward = vp - self.discount * node_vp[idxB, parent]
            p_out, v_logits = self.pred_net.apply(params["pred"], latent2)
            v_leaf = self._decode_bins(v_logits)
            if self.is_discrete:
                prior = jax.nn.softmax(p_out, -1)
                allowed = self._expand_mask(prior, jnp.asarray(False), k_exp)
            else:
                cand, prior = self._sample_candidates(*p_out, k_exp, jnp.asarray(False))
                allowed = jnp.ones((B, A), bool)
                child_action = child_action.at[idxB, new_idx].set(cand)

            node_latent = node_latent.at[idxB, new_idx].set(latent2)
            node_c = node_c.at[idxB, new_idx].set(carry2[0])
            node_h = node_h.at[idxB, new_idx].set(carry2[1])
            node_reward = node_reward.at[idxB, new_idx].set(reward)
            node_vp = node_vp.at[idxB, new_idx].set(vp)
            child_prior = child_prior.at[idxB, new_idx].set(prior)
            child_allowed = child_allowed.at[idxB, new_idx].set(allowed)
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
            return (node_latent, node_c, node_h, node_reward, node_vp, child_prior,
                    child_allowed, child_index, child_action, visits, value_sum,
                    qmin, qmax, key), None

        carry = (node_latent, node_c, node_h, node_reward, node_vp, child_prior,
                 child_allowed, child_index, child_action, visits, value_sum,
                 q_min, q_max, key)
        carry, _ = jax.lax.scan(one_sim, carry, jnp.arange(self.num_simulations))
        (_, _, _, _, _, child_prior, _, child_index, child_action, visits,
         value_sum, q_min, q_max, _) = carry

        idxB = jnp.arange(B)[:, None]
        rc = child_index[:, 0]
        counts = jnp.where(rc >= 0, visits[idxB, jnp.maximum(rc, 0)], 0.0)
        q_root = jnp.where(
            rc >= 0, value_sum[idxB, jnp.maximum(rc, 0)], 0.0
        ) / jnp.maximum(counts, 1.0)
        root_cand = None if self.is_discrete else child_action[:, 0]
        return counts, q_root, child_prior[:, 0], v0, q_min, q_max, root_cand

    # ------------------------------------------------------------------
    def policy_step(self, state: EZState, actor: EZActorState, obs, invalid_mask, ctx, key, episode_start):
        key, k_search, k_pick = jax.random.split(key, 3)
        if not self.is_discrete:
            B_ = jax.tree.leaves(obs)[0].shape[0]
            invalid_mask = jnp.zeros((B_, self.A), bool)
        counts, q_root, prior_root, v0, _, _, root_cand = self._search(
            state.params, obs, invalid_mask, state.q_min, state.q_max, k_search, ctx.training
        )

        # visit-count temperature action (worker.py:46-58)
        tau = self._tau(ctx.step, ctx.training)
        logits = jnp.where(
            counts > 0, jnp.log(jnp.maximum(counts, 1e-12)) / jnp.maximum(tau, 1e-6), -jnp.inf
        )
        action = jax.random.categorical(k_pick, logits, -1).astype(jnp.int32)

        if not self.is_discrete:
            # env action = rescaled tanh of the chosen candidate (worker.py:91-93)
            u = root_cand[jnp.arange(B_), action]
            env_a = self._scale(jnp.tanh(u))
            return env_a, EZActorState(last_pi=jnp.zeros((B_, 1)))

        # gumbel completed-Q learning policy (worker.py:62-84)
        if self.enable_gumbel_search:
            visited = counts > 0
            v_hat = jnp.sum(jnp.where(visited, prior_root * q_root, 0.0), -1)
            completed_q = jnp.where(visited, q_root, v_hat[:, None])
            max_visit = jnp.max(counts, -1)
            sigma = (self.c_visit + max_visit[:, None]) * self.c_scale * completed_q
            pi = jax.nn.softmax(jnp.where(invalid_mask, -jnp.inf, sigma), -1)
        else:
            pi = counts / jnp.maximum(counts.sum(-1, keepdims=True), 1.0)

        return action, EZActorState(last_pi=pi)

    # ------------------------------------------------------------------
    def observe_chunk(self, state: EZState, transitions, mask, sv: StepView) -> EZState:
        T, B = sv.reward.shape
        K = self.unroll_steps
        done = jnp.logical_or(sv.terminated, sv.truncated)

        # in-chunk MC return-to-go + completion flags
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

        def shifted(x, j, fill=0.0):
            if j == 0:
                return x
            pad = jnp.full_like(x[:j], fill)
            return jnp.concatenate([x[j:], pad], axis=0)

        pis = [sv.actor_snapshot["pi"]]
        zs = [z]
        obs_l = [sv.obs]
        acts_l, vps = [], []
        absorbed = [jnp.zeros((T, B))]
        absorbed_j = jnp.zeros((T, B), bool)
        vp_acc = jnp.zeros((T, B))
        for j in range(K):
            vp_acc = vp_acc + jnp.where(absorbed_j, 0.0, (self.discount**j) * shifted(sv.reward, j))
            vps.append(vp_acc)
            if self.is_discrete:
                acts_l.append(jnp.where(absorbed_j, 0, shifted(sv.action, j)).astype(jnp.int32))
            else:
                mid = 0.5 * (self._a_low + self._a_high)
                acts_l.append(jnp.where(
                    absorbed_j[..., None], mid, shifted(sv.action.astype(jnp.float32), j)
                ))
            absorbed_j = jnp.logical_or(absorbed_j, shifted(done, j, fill=True))
            obs_l.append(jax.tree.map(lambda x: shifted(x, j + 1), sv.obs))
            fill_pi = 1.0 / self.A if self.is_discrete else 0.0
            pis.append(jnp.where(absorbed_j[..., None], fill_pi, shifted(sv.actor_snapshot["pi"], j + 1)))
            zs.append(jnp.where(absorbed_j, 0.0, shifted(z, j + 1)))
            absorbed.append(absorbed_j.astype(jnp.float32))

        items = EZItem(
            obs=jnp.stack(obs_l, axis=2),  # [T, B, K+1, ...]
            actions=jnp.stack(acts_l, axis=2),
            policies=jnp.stack(pis, axis=2),
            value_prefix=jnp.stack(vps, axis=2),
            z=jnp.stack(zs, axis=2),
            absorbed=jnp.stack(absorbed, axis=2),
        )
        tail_ok = jnp.arange(T)[:, None] < (T - K)
        valid = completed & jnp.logical_not(was_reset) & tail_ok
        flat = jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), items)
        memory = self._replay.add_masked(state.memory, flat, valid.reshape(-1))
        zz = jnp.where(valid, z, jnp.inf)
        q_min = jnp.minimum(state.q_min, zz.min())
        zz = jnp.where(valid, z, -jnp.inf)
        q_max = jnp.maximum(state.q_max, zz.max())
        return state.replace(memory=memory, q_min=q_min, q_max=q_max)

    # ------------------------------------------------------------------
    def train(self, state: EZState, key: Array, num_steps: int) -> Tuple[EZState, Dict[str, Array]]:
        K = self.unroll_steps

        def loss_fn(params, batch: EZItem):
            bs = batch.actions.shape[0]
            obs0 = batch.obs[:, 0]
            latent = self.repr_net.apply(params["repr"], jnp.asarray(obs0, jnp.float32))
            carry = self._zero_carry(bs)
            gscale = 1.0 / K
            v_loss = p_loss = r_loss = c_loss = 0.0
            for k in range(K + 1):
                w = jnp.maximum(1.0 - batch.absorbed[:, k], 0.0)
                scale = 1.0 if k == 0 else gscale
                p_out, v_logits = self.pred_net.apply(params["pred"], latent)
                if self.is_discrete:
                    lp = jax.nn.log_softmax(p_out, -1)
                    l_pi = -jnp.sum(batch.policies[:, k] * lp, -1)
                    if k < K:
                        # + action log-likelihood term (trainer.py:110-113)
                        l_pi = l_pi - jnp.take_along_axis(lp, batch.actions[:, k, None], -1)[:, 0]
                else:
                    # continuous: NLL of the taken action under the squashed
                    # gaussian (trainer.py:113,135; no CE target exists)
                    if k < K:
                        u = jnp.arctanh(self._unscale(batch.actions[:, k]))
                        l_pi = -self._sgp_logp(u, *p_out)
                    else:
                        l_pi = jnp.zeros((bs,))
                v_target = funcs.twohot_encode(batch.z[:, k], self.value_bins, self.v_min, self.v_max)
                l_v = -jnp.sum(v_target * jax.nn.log_softmax(v_logits, -1), -1)
                p_loss = p_loss + self._gs(jnp.mean(l_pi * w), scale)
                v_loss = v_loss + self._gs(jnp.mean(l_v * w), scale)
                if k < K:
                    if self.is_discrete:
                        a_in = jax.nn.one_hot(batch.actions[:, k], self.A)
                    else:
                        a_in = self._unscale(batch.actions[:, k])
                    latent, vp_logits, carry = self.dyn_net.apply(params["dyn"], latent, a_in, carry)
                    wn = jnp.maximum(1.0 - batch.absorbed[:, k + 1], 0.0)
                    vp_target = funcs.twohot_encode(
                        batch.value_prefix[:, k], self.value_bins, self.v_min, self.v_max
                    )
                    l_r = -jnp.sum(vp_target * jax.nn.log_softmax(vp_logits, -1), -1)
                    r_loss = r_loss + self._gs(jnp.mean(l_r * wn), gscale)
                    # SimSiam consistency vs repr of the real next obs
                    if self.consistency_loss_coeff > 0:
                        n_latent = self.repr_net.apply(
                            params["repr"], jnp.asarray(batch.obs[:, k + 1], jnp.float32)
                        )
                        tgt = jax.lax.stop_gradient(
                            self.proj_net.apply(params["proj"], n_latent, method=EZProjector.projection)
                        )
                        prd = self.proj_net.apply(params["proj"], latent)
                        f1 = prd / jnp.maximum(jnp.linalg.norm(prd, axis=-1, keepdims=True), 1e-5)
                        f2 = tgt / jnp.maximum(jnp.linalg.norm(tgt, axis=-1, keepdims=True), 1e-5)
                        l_c = -jnp.sum(f1 * f2, -1)
                        c_loss = c_loss + self._gs(jnp.mean(l_c * wn), gscale)
                    latent = latent * 0.5 + jax.lax.stop_gradient(latent) * 0.5
            v_loss = v_loss / (K + 1)
            p_loss = p_loss / (K + 1)
            r_loss = r_loss / K
            c_loss = c_loss / K
            total = (
                self.value_loss_coeff * v_loss
                + self.policy_loss_coeff * p_loss
                + self.reward_loss_coeff * r_loss
                + self.consistency_loss_coeff * c_loss
            )
            return total, {"value_loss": v_loss, "policy_loss": p_loss,
                           "reward_loss": r_loss, "cons_loss": c_loss}

        def one_update(st: EZState, k):
            batch, _ = self._replay.sample_with_indices(st.memory, k, self.batch_size)
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(st.params, batch)
            if self.pmean_axis is not None:
                grads, aux = self.dp_pmean((grads, aux))
            updates, opt_state = self._tx.update(grads, st.opt_state, st.params)
            new_params = optax.apply_updates(st.params, updates)
            ready = self._replay.is_warmup_over(st.memory)
            params = masked_update(ready, new_params, st.params)
            opt_state = masked_update(ready, opt_state, st.opt_state)
            aux["loss"] = loss
            return (
                st.replace(
                    params=params, opt_state=opt_state,
                    train_count=st.train_count + ready.astype(jnp.int32),
                ),
                aux,
            )

        state, auxs = jax.lax.scan(one_update, state, jax.random.split(key, num_steps))
        metrics = {k: jnp.mean(v) for k, v in auxs.items()}
        metrics["train_count"] = state.train_count.astype(jnp.float32)
        return state, metrics

    @staticmethod
    def _gs(x, scale):
        """scale_gradient (trainer.py:13-15)."""
        return x * scale + jax.lax.stop_gradient(x) * (1.0 - scale)

    def params_of(self, state: EZState):
        return {"params": state.params, "q_min": state.q_min, "q_max": state.q_max}

    def restore_params(self, state: EZState, p) -> EZState:
        return state.replace(params=p["params"], q_min=p["q_min"], q_max=p["q_max"])
