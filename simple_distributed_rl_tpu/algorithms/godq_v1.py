"""GoDQ_v1 (parity: srl/algorithms/godq_v1/ — the reference's flagship "modern DQN"):
a sample-efficient DQN with

- encoder -> dueling Q head whose advantage stream is a learned Normal DISTRIBUTION
  sampled during training and collapsed to its mean at eval
  (godq_v1/torch_model_nets.py:178-225, config enable_q_distribution),
- linear-symlog Q rescale (torch_trainer.py:171-177; rl/functions.py:50-59),
- a Monte-Carlo "alignment" loss pulling Q(s,a) toward the discounted return
  (torch_trainer.py:186-190; the worker tracks up to max_discount_steps rewards,
  worker.py:141-166),
- BYOL self-prediction features whose prediction error is the intrinsic reward
  (torch_model_nets.py:53-124), feeding a second intrinsic Q head trained with
  target (max(nQi) + nVi)/2 (torch_trainer.py:210-223) and mixed into acting as
  softmax(q_ext) + int_rate * softmax(q_int) (worker.py:80-92); feat_type="" swaps
  BYOL for RND (torch_model_nets.py:128-168),
- optional NGU-style episodic novelty from an inverse-dynamics embedding
  (worker.py:171-210, torch_model_nets.py:228-252),
- shrink-and-perturb network resets every reset_net_interval trains
  (torch_trainer.py:18-31,105-109),
- an optional Go-Explore style archive of restorable snapshots keyed by episode
  step buckets with rank-based selection (godq_v1/archive.py).

TPU re-design:
- All nets are flax modules over the encoded BOX observation; BatchNorm1d is
  replaced with LayerNorm so every net stays a pure function of (params, x) — no
  mutable batch statistics to thread through jit.
- The RunningNorm (min/var EMA, torch_model_nets.py:12-50) lives in the algorithm
  state as three scalars and is updated inside the jitted train step.
- The alignment target: the reference flushes a 500-step tracking deque per worker.
  Here the per-env chronological chunk ([B, L] via common.to_env_sequences) is
  reverse-scanned into discounted rewards-to-go; windows still open at the chunk
  tail bootstrap with the online net's max-Q (a TD(lambda=1) tail instead of the
  reference's hard 500-step truncation).
- The archive is a dense [K buckets x M slots] snapshot stack (the functional env
  state pytree IS the restorable backup); the reference's two-level rank-based
  pick (steps ascending, then cells sorted by (reward, dist), archive.py:85-103)
  becomes one categorical whose logits factor exactly as
  log w_bucket - log sum_cells w_cell + log w_cell.
- Shrink-and-perturb and the BYOL target soft-sync are masked lockstep updates on
  the parameter pytree (no Python-side iteration over modules).
- The RND predictor trains at lr/5 via optax.multi_transform (the reference's
  second optimizer, torch_trainer.py:66-67).

The reference's optional diffusion observation model (enable_diffusion,
godq_v1/torch_diffusion.py) is this framework's standalone DIAMOND algorithm.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Literal, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn
from flax import struct

from ..define import RLBaseTypes
from ..memories.replay_buffer import ReplayBuffer
from ..models.blocks import InputBlockConfig
from ..utils import rl_functions as funcs
from .base import AlgoConfig, Transition
from .common import masked_update, to_env_sequences

Array = jax.Array

MODE_Q, MODE_INT, MODE_GO = 0, 1, 2


# ----------------------------------------------------------------------------
# flax modules (parity: godq_v1/torch_model_nets.py — LayerNorm replaces
# BatchNorm1d to keep the nets stateless under jit)
# ----------------------------------------------------------------------------
class GoDQEncoder(nn.Module):
    units: int
    obs_space: Any
    input_block: InputBlockConfig

    @nn.compact
    def __call__(self, x):
        x = self.input_block.create_block(self.obs_space)(x)
        x = nn.silu(nn.LayerNorm()(nn.Dense(self.units)(x)))
        return nn.Dense(self.units)(x)


class GoDQQHead(nn.Module):
    """Dueling head; advantage is a Normal distribution when ``distribution``
    (parity: QNetwork, torch_model_nets.py:178-225). Returns (v, adv_mean,
    adv_std); combine with :func:`dueling_q`."""

    num_actions: int
    units: int
    distribution: bool = True

    @nn.compact
    def __call__(self, x):
        x = nn.silu(nn.Dense(self.units)(x))
        v = nn.Dense(1)(nn.silu(nn.Dense(self.units)(x)))
        h = nn.silu(nn.Dense(self.units)(x))
        adv_mean = nn.Dense(self.num_actions)(h)
        if self.distribution:
            log_std = jnp.clip(nn.Dense(self.num_actions)(h), -10.0, 2.0)
            adv_std = jnp.exp(log_std)
        else:
            adv_std = jnp.zeros_like(adv_mean)
        return v, adv_mean, adv_std


def dueling_q(v, adv_mean, adv_std, key=None):
    """q = v + adv - mean(adv); adv ~ N(mean, std) when a key is given (rsample),
    otherwise the distribution mean (torch_model_nets.py:196-216)."""
    adv = adv_mean if key is None else adv_mean + adv_std * jax.random.normal(key, adv_mean.shape)
    return (v + adv - jnp.mean(adv, axis=-1, keepdims=True), v[..., 0])


class BYOLProjection(nn.Module):
    units: int

    @nn.compact
    def __call__(self, x):
        x = nn.silu(nn.LayerNorm()(nn.Dense(self.units)(x)))
        x = nn.silu(nn.LayerNorm()(nn.Dense(self.units)(x)))
        return nn.LayerNorm()(nn.Dense(self.units)(x))


class BYOLTransition(nn.Module):
    """(oe, a) -> predicted next oe (torch_model_nets.py:62-103)."""

    units: int
    oe_size: int
    num_actions: int

    @nn.compact
    def __call__(self, oe, action):
        ae = nn.Embed(self.num_actions, self.units)(action)
        x = jnp.concatenate([oe, ae], axis=-1)
        x = nn.silu(nn.LayerNorm()(nn.Dense(self.units)(x)))
        return nn.silu(nn.LayerNorm()(nn.Dense(self.oe_size)(x)))


class BYOLPredictor(nn.Module):
    units: int

    @nn.compact
    def __call__(self, x):
        x = nn.silu(nn.LayerNorm()(nn.Dense(self.units)(x)))
        return nn.Dense(self.units)(x)


class RNDNet(nn.Module):
    units: int

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.LayerNorm()(nn.Dense(self.units)(x)))
        x = nn.relu(nn.Dense(self.units)(x))
        return nn.Dense(self.units)(x)


class EmbInBlock(nn.Module):
    units: int

    @nn.compact
    def __call__(self, x):
        x = nn.silu(nn.LayerNorm()(nn.Dense(self.units)(x)))
        return nn.Dense(self.units)(x)


class EmbOutBlock(nn.Module):
    units: int
    num_actions: int

    @nn.compact
    def __call__(self, x):
        x = nn.silu(nn.LayerNorm()(nn.Dense(self.units)(x)))
        return nn.Dense(self.num_actions)(x)


def byol_loss(p, z):
    """Normalized L2 = 2 - 2 cos (torch_model_nets.py:117-124)."""
    p = p / jnp.maximum(jnp.linalg.norm(p, axis=-1, keepdims=True), 1e-8)
    z = z / jnp.maximum(jnp.linalg.norm(z, axis=-1, keepdims=True), 1e-8)
    return 2.0 - 2.0 * jnp.sum(p * z, axis=-1)


# ----------------------------------------------------------------------------
@struct.dataclass
class GoDQItem:
    obs: Any
    action: Array
    reward: Array
    next_obs: Any
    undone: Array
    total_reward: Array  # discounted reward-to-go (the alignment target)


@struct.dataclass
class GoDQActorState:
    mode: Array  # [B]
    go_action: Array  # [B]
    begin_pending: Array  # [B]
    epi_mem: Any  # [B, cap, units] or () when episodic disabled
    epi_cnt: Array  # [B]


@struct.dataclass
class GoDQState:
    params: Any  # optimized nets
    aux_params: Any  # byol_target / rnd_target (not optimized)
    opt_state: Any
    memory: Any
    train_count: Array
    reset_count: Array
    # RunningNorm of the intrinsic reward (torch_model_nets.py:12-50)
    norm_min: Array
    norm_var: Array
    norm_init: Array  # bool
    # archive (dense [K*M+1]; row K*M is the masked-write scratch slot)
    occupied: Any
    a_reward: Any
    a_dist: Any
    snap_env: Any
    snap_ts: Any
    restore_count: Array
    # pending observe window (mc_pend_rows > 0): the previous chunk's per-env
    # rows, held back one chunk so their reward-to-go is computed over BOTH
    # chunks (bootstrap weight falls from gamma^k to gamma^(L+k)); () when off
    pend: Any = ()


@dataclasses.dataclass
class GoDQv1Config(AlgoConfig):
    """Config (parity: godq_v1/config.py:56-156; defaults match)."""

    test_epsilon: float = 0.0
    test_policy: Literal["q", "int"] = "q"
    epsilon: float = 0.01
    #: >0 enables the two-chunk reward-to-go window: each chunk's rows are
    #: emitted one chunk LATE, with their alignment target computed over this
    #: chunk AND the next (closer to the reference's 500-step pure-MC tracking
    #: flush, worker.py:141-166, at short engine chunks). Set to the per-env
    #: rows per chunk = chunk_steps * (1 + player_num); rows of the final chunk
    #: of a run are never emitted (one chunk of data held in flight).
    mc_pend_rows: int = 0
    # archive
    enable_archive: bool = False
    archive_steps: int = 200
    archive_max_size: int = 10
    archive_rate: float = 0.5
    archive_rankbase_alpha: float = 1.0
    archive_max_buckets: int = 32  # dense re-expression of the step-keyed dict
    # feat
    feat_type: Literal["", "BYOL"] = "BYOL"
    # q
    replay_ratio: int = 1
    reset_net_interval: int = 5000
    discount: float = 0.999
    align_loss_coeff: float = 0.05
    enable_q_distribution: bool = True
    enable_q_rescale: bool = True
    # byol
    byol_model_update_rate: float = 0.1
    byol_model_update_interval: int = 10
    # int
    enable_int_q: bool = True
    int_rate: float = 0.5
    int_discount: float = 0.95
    int_align_loss_coeff: float = 0.1
    int_norm_momentum: float = 0.9
    int_reward_clip: float = 2.0
    int_reward_rnd_scale: float = 10.0
    int_reward_byol_scale: float = 1.0
    # episodic
    enable_int_episodic: bool = False
    episodic_count_max: int = 100
    episodic_epsilon: float = 0.001
    episodic_cluster_distance: float = 0.008
    #: per-env ring size (the reference's 30k deque is per single worker,
    #: worker.py:36; vectorized over thousands of envs a smaller ring per env
    #: keeps HBM bounded)
    episodic_memory_capacity: int = 512
    # model/train
    base_units: int = 512
    max_grad_norm: float = 10.0
    batch_size: int = 64
    lr: float = 1e-4
    memory_capacity: int = 100_000
    memory_warmup_size: int = 1_000
    input_block: InputBlockConfig = dataclasses.field(default_factory=InputBlockConfig)

    observation_type: RLBaseTypes = RLBaseTypes.BOX
    action_type: RLBaseTypes = RLBaseTypes.DISCRETE
    has_actor_state: bool = True
    policy_updates_state: bool = True

    def get_name(self) -> str:
        return "GoDQ_v1"

    def set_model(self, units: int):
        self.base_units = units
        return self

    def setup(self, env) -> None:
        self.needs_env_state = self.enable_archive
        self.uses_archive_restore = self.enable_archive
        super().setup(env)

    def on_setup(self) -> None:
        assert self.replay_ratio > 0 and self.base_units >= 8
        self._replay = ReplayBuffer(self.memory_capacity, self.memory_warmup_size)
        U = self.base_units
        A = self.num_actions
        self.encoder = GoDQEncoder(U, self.obs_space, self.input_block)
        self.q_head = GoDQQHead(A, U, self.enable_q_distribution)
        self.byol_trans = BYOLTransition(U, U, A)
        self.byol_proj = BYOLProjection(U)
        self.byol_pred = BYOLPredictor(U)
        self.rnd_net = RNDNet(U)
        self.emb_in = EmbInBlock(U)
        self.emb_out = EmbOutBlock(U, A)
        main_tx = (
            optax.adamw(self.lr, weight_decay=0.1)
            if self.replay_ratio > 1
            else optax.radam(self.lr)
        )
        # RND predictor trains at lr/5 (torch_trainer.py:66-67)
        def label_fn(params):
            return {
                k: jax.tree.map(lambda _: "rnd" if k == "rnd_pred" else "main", v)
                for k, v in params.items()
            }

        self._tx = optax.multi_transform(
            {"main": main_tx, "rnd": optax.adam(self.lr / 5.0)}, label_fn
        )
        self.KM = self.archive_max_buckets * self.archive_max_size + 1
        if self.enable_archive:
            from ..envs.core import AutoResetEnv

            _, ts0 = AutoResetEnv(self.env).reset(jax.random.PRNGKey(0))
            o = self.obs_encoder.encode(ts0.obs)
            if self.stack_to_obs is not None:
                win = jnp.stack([jnp.zeros_like(o)] * (self.window_length - 1) + [o])
                o = self.stack_to_obs(win)
            self._start_obs_cache = jnp.asarray(o).reshape(-1).astype(jnp.float32)

    # ------------------------------------------------------------------
    def init(self, key: Array) -> GoDQState:
        ks = jax.random.split(key, 10)
        obs0 = self.obs_space.zero()[None]
        a0 = jnp.zeros((1,), jnp.int32)
        enc = self.encoder.init(ks[0], obs0)
        oe0 = self.encoder.apply(enc, obs0)
        params = {"encoder": enc, "q": self.q_head.init(ks[1], oe0)}
        aux = {}
        if self.feat_type == "BYOL":
            params["byol_trans"] = self.byol_trans.init(ks[2], oe0, a0)
            params["byol_proj"] = self.byol_proj.init(ks[3], oe0)
            params["byol_pred"] = self.byol_pred.init(
                ks[4], self.byol_proj.apply(params["byol_proj"], oe0)
            )
            aux["byol_target"] = jax.tree.map(jnp.copy, params["byol_proj"])
        if self.enable_int_q:
            params["q_int"] = self.q_head.init(ks[5], oe0)
            if self.feat_type == "":
                params["rnd_pred"] = self.rnd_net.init(ks[6], oe0)
                aux["rnd_target"] = self.rnd_net.init(ks[7], oe0)
            if self.enable_int_episodic:
                emb_in = self.emb_in.init(ks[8], oe0)
                e0 = self.emb_in.apply(emb_in, oe0)
                params["emb_in"] = emb_in
                params["emb_out"] = self.emb_out.init(
                    ks[9], jnp.concatenate([e0, e0], axis=-1)
                )

        ex = GoDQItem(
            obs=self.obs_space.zero(),
            action=jnp.asarray(0, jnp.int32),
            reward=jnp.asarray(0.0),
            next_obs=self.obs_space.zero(),
            undone=jnp.asarray(1.0),
            total_reward=jnp.asarray(0.0),
        )
        # archive snapshot stacks (scratch row at KM-1)
        if self.enable_archive:
            from ..envs.core import AutoResetEnv

            ar0, ats0 = AutoResetEnv(self.env).reset(jax.random.PRNGKey(0))
            z = lambda x: jnp.zeros((self.KM,) + jnp.shape(x), jnp.asarray(x).dtype)
            snap_env = jax.tree.map(z, ar0)
            snap_ts = jax.tree.map(z, ats0)
            occ = jnp.zeros((self.KM,), bool)
            a_r = jnp.full((self.KM,), -jnp.inf)
            a_d = jnp.full((self.KM,), -jnp.inf)
        else:
            snap_env = snap_ts = ()
            occ = a_r = a_d = ()
        if self.mc_pend_rows > 0:
            B = getattr(self, "num_envs_hint", None)
            assert B is not None, "mc_pend_rows needs the engine's num_envs hint"
            P = self.mc_pend_rows
            z0 = self.obs_space.zero()
            zo = jnp.zeros((B, P) + z0.shape, z0.dtype)
            pend = {
                "obs": zo,
                "next_obs": zo,
                "action": jnp.zeros((B, P), jnp.int32),
                "reward": jnp.zeros((B, P)),
                "undone": jnp.zeros((B, P)),
                "valid": jnp.zeros((B, P), bool),
                "final": jnp.zeros((B, P), bool),
            }
        else:
            pend = ()
        return GoDQState(
            pend=pend,
            params=params,
            aux_params=aux,
            opt_state=self._tx.init(params),
            memory=self._replay.init(ex),
            train_count=jnp.asarray(0, jnp.int32),
            reset_count=jnp.asarray(0, jnp.int32),
            norm_min=jnp.asarray(0.0),
            norm_var=jnp.asarray(1.0),
            norm_init=jnp.asarray(False),
            occupied=occ,
            a_reward=a_r,
            a_dist=a_d,
            snap_env=snap_env,
            snap_ts=snap_ts,
            restore_count=jnp.asarray(0, jnp.int32),
        )

    def init_actor_state(self, key, num_envs) -> GoDQActorState:
        B = num_envs
        if self.enable_int_q and self.enable_int_episodic:
            epi_mem = jnp.zeros((B, self.episodic_memory_capacity, self.base_units))
        else:
            epi_mem = ()
        return GoDQActorState(
            mode=jnp.zeros((B,), jnp.int32),
            go_action=jnp.zeros((B,), jnp.int32),
            begin_pending=jnp.zeros((B,), bool),
            epi_mem=epi_mem,
            epi_cnt=jnp.zeros((B,), jnp.int32),
        )

    # ------------------------------------------------------------------
    def _norm(self, state: GoDQState, x: Array) -> Array:
        std = jnp.sqrt(jnp.maximum(state.norm_var, 0.0))
        return (x - state.norm_min) / jnp.maximum(std, 1e-10)

    def _episodic_reward(self, params, oe, mem, cnt):
        """NGU pseudo-count bonus over the per-env embedding ring (worker.py:171-210)."""
        cont = self.emb_in.apply(params["emb_in"], oe)  # [B, U]
        cap = self.episodic_memory_capacity
        d = jnp.linalg.norm(mem - cont[:, None, :], axis=-1)  # [B, cap]
        filled = jnp.arange(cap)[None, :] < jnp.minimum(cnt, cap)[:, None]
        d = jnp.where(filled, d, jnp.inf)
        k = min(self.episodic_count_max, cap)
        dk = -jax.lax.top_k(-d, k)[0]
        finite = jnp.isfinite(dk)
        nf = jnp.maximum(finite.sum(-1), 1)
        mean = jnp.where(finite, dk, 0.0).sum(-1) / nf
        dn = jnp.where(mean[:, None] > 0, dk / jnp.maximum(mean[:, None], 1e-12), dk)
        dn = jnp.where(finite, jnp.maximum(dn - self.episodic_cluster_distance, 0.0), jnp.inf)
        dirac = jnp.where(
            jnp.isfinite(dn), self.episodic_epsilon / (dn + self.episodic_epsilon), 0.0
        )
        N = dirac.sum(-1)
        r = 1.0 / jnp.sqrt(N + 1.0)
        return jnp.where(cnt == 0, 1.0, r), cont

    def policy_step(self, state: GoDQState, actor, obs, invalid_mask, ctx, key, episode_start):
        B = invalid_mask.shape[0]
        keys = jax.random.split(key, 8)
        # restored episodes resume at snapshot step_num > 0, so episode_start misses
        # them; the previous call's terminal ts (begin_pending) is the begin signal
        # (same coupling as GoDQN). Without the archive ctx.timestep is None and
        # episode_start alone is exact.
        begin = jnp.logical_or(actor.begin_pending, episode_start)

        # --- per-episode mode (worker.py on_reset:36-50)
        train_mode = jnp.where(
            state.train_count == 0,
            MODE_GO,
            MODE_INT if self.enable_int_q else MODE_Q,
        )
        eval_mode = MODE_INT if (self.test_policy == "int" and self.enable_int_q) else MODE_Q
        new_mode = jnp.where(ctx.training, train_mode, eval_mode)
        mode = jnp.where(begin, new_mode, actor.mode)

        rand_logits = jnp.where(  # width = ENCODED action space, mask broadcasts up
            invalid_mask, -jnp.inf, jnp.zeros((invalid_mask.shape[0], self.num_actions))
        )
        fresh_go = jax.random.categorical(keys[0], rand_logits, -1).astype(jnp.int32)
        go_action = jnp.where(begin, fresh_go, actor.go_action)
        # go mode re-rolls the sticky action w.p. 0.1 (worker.py:63-66)
        reroll = jax.random.uniform(keys[1], (B,)) < 0.1
        a_re = jax.random.categorical(keys[2], rand_logits, -1).astype(jnp.int32)
        go_action = jnp.where(reroll, a_re, go_action)

        # --- forward (training acts on an advantage rsample, eval on the mean —
        # torch_model.py pred_q is_mean plumbing; under jit both are computed and
        # the live one selected)
        oe = self.encoder.apply(state.params["encoder"], obs)
        head = self.q_head.apply(state.params["q"], oe)
        if self.enable_q_distribution:
            q_s, _ = dueling_q(*head, key=keys[3])
            q_m, _ = dueling_q(*head, key=None)
            q = jnp.where(ctx.training, q_s, q_m)
        else:
            q, _ = dueling_q(*head, key=None)

        eps = jnp.where(ctx.training, self.epsilon, self.test_epsilon)

        # --- episodic novelty-scaled epsilon + ring insert (worker.py:68-78)
        epi_mem, epi_cnt = actor.epi_mem, actor.epi_cnt
        if self.enable_int_q and self.enable_int_episodic:
            epi_cnt = jnp.where(episode_start, 0, epi_cnt)
            epi_r, cont = self._episodic_reward(state.params, oe, epi_mem, epi_cnt)
            slot = epi_cnt % self.episodic_memory_capacity
            epi_mem = epi_mem.at[jnp.arange(B), slot].set(cont)
            epi_cnt = epi_cnt + 1
            eps_epi = jnp.clip(1.0 - jnp.sqrt(epi_r), 0.0, 0.2)
            eps = jnp.where(ctx.training, eps_epi, eps)

        # --- int mixing (worker.py:80-92)
        if self.enable_int_q:
            q_int, _ = dueling_q(*self.q_head.apply(state.params["q_int"], oe), key=None)
            mix = jax.nn.softmax(q - jnp.mean(q, -1, keepdims=True), -1) + self.int_rate * jax.nn.softmax(q_int, -1)
        else:
            mix = q
        a_int = funcs.epsilon_greedy(mix, invalid_mask, eps, keys[4])
        a_q = funcs.epsilon_greedy(q, invalid_mask, eps, keys[5])
        action = jnp.where(
            mode == MODE_GO, go_action, jnp.where(mode == MODE_INT, a_int, a_q)
        )

        # --- archive store (archive.py on_step:105-158)
        new_state = state
        if self.enable_archive:
            new_state = self._archive_store(state, obs, ctx)

        if ctx.timestep is not None:
            begin_pending = jnp.logical_or(ctx.timestep.terminated, ctx.timestep.truncated)
        else:
            begin_pending = jnp.zeros((B,), bool)
        new_actor = GoDQActorState(
            mode=mode,
            go_action=go_action,
            begin_pending=begin_pending,
            epi_mem=epi_mem,
            epi_cnt=epi_cnt,
        )
        return action, new_actor, new_state

    # ------------------------------------------------------------------
    def _archive_store(self, state: GoDQState, obs, ctx) -> GoDQState:
        """Store a snapshot every archive_steps env-steps into its step bucket,
        keeping the archive_max_size best (reward, dist) cells per bucket
        (archive.py:105-158). One batched masked scatter replaces the dict."""
        ts = ctx.timestep
        B = obs.shape[0]
        idx = jnp.arange(B)
        M, K = self.archive_max_size, self.archive_max_buckets
        step_num = ctx.autoreset_state.step_num
        live = jnp.logical_not(jnp.logical_or(ts.terminated, ts.truncated))
        ep_reward = ctx.autoreset_state.episode_reward[:, 0]
        flat_obs = obs.reshape((B, -1)).astype(jnp.float32)
        start_obs = self._start_obs_flat()
        dist = jnp.linalg.norm(flat_obs - start_obs[None, :], axis=-1)

        cand = (step_num > 0) & (step_num % self.archive_steps == 0) & live & ctx.training
        bucket = jnp.clip(step_num // self.archive_steps - 1, 0, K - 1)

        # winner per bucket within the batch (rare collisions -> scratch)
        first = jnp.zeros((K,), jnp.int32).at[bucket].max(jnp.where(cand, B - idx, 0))
        winner = cand & ((B - idx) == first[bucket])

        # slot: first free, else the lexicographic min (reward, dist) if we beat it
        occ = state.occupied[: K * M].reshape(K, M)
        rew = state.a_reward[: K * M].reshape(K, M)
        dst = state.a_dist[: K * M].reshape(K, M)
        b_occ, b_rew, b_dst = occ[bucket], rew[bucket], dst[bucket]  # [B, M]
        free_slot = jnp.argmax(jnp.logical_not(b_occ), axis=-1)
        has_free = jnp.any(jnp.logical_not(b_occ), axis=-1)
        # lexicographic argmin via composite key (rewards dominate; dist tiebreak)
        span = jnp.maximum(jnp.max(b_dst, -1) - jnp.min(b_dst, -1), 1e-6)
        comp = b_rew + 1e-4 * (b_dst / span[:, None])
        min_slot = jnp.argmin(comp, axis=-1)
        min_rew = jnp.take_along_axis(b_rew, min_slot[:, None], -1)[:, 0]
        min_dst = jnp.take_along_axis(b_dst, min_slot[:, None], -1)[:, 0]
        beats = (ep_reward > min_rew) | ((ep_reward == min_rew) & (dist > min_dst))
        slot = jnp.where(has_free, free_slot, min_slot)
        store = winner & (has_free | beats)
        flat = jnp.where(store, bucket * M + slot, self.KM - 1)

        occupied = state.occupied.at[flat].max(jnp.ones((B,), bool)).at[self.KM - 1].set(False)
        a_reward = state.a_reward.at[flat].set(ep_reward).at[self.KM - 1].set(-jnp.inf)
        a_dist = state.a_dist.at[flat].set(dist).at[self.KM - 1].set(-jnp.inf)
        snap_env = jax.tree.map(
            lambda b, v: b.at[flat].set(v), state.snap_env, ctx.autoreset_state
        )
        snap_ts = jax.tree.map(lambda b, v: b.at[flat].set(v), state.snap_ts, ts)
        return state.replace(
            occupied=occupied, a_reward=a_reward, a_dist=a_dist,
            snap_env=snap_env, snap_ts=snap_ts,
        )

    def _start_obs_flat(self) -> Array:
        """Encoded deterministic-start observation; the reference keys its archive
        by start_state_str (archive.py:64-67) which collapses to a single key for
        deterministic-reset envs — the assumption made here. Computed eagerly in
        on_setup (never inside a trace)."""
        return self._start_obs_cache

    def archive_restore(self, state: GoDQState, env_state, timestep, was_reset, key):
        """Rank-based two-level pick re-expressed as one categorical
        (archive.py:62-103): bucket weight 1+alpha*rank(step asc), cell weight
        1+alpha*rank((reward, dist) asc)."""
        B = was_reset.shape[0]
        K, M = self.archive_max_buckets, self.archive_max_size
        k_cell, k_go = jax.random.split(key)
        occ = state.occupied[: K * M].reshape(K, M)
        rew = state.a_reward[: K * M].reshape(K, M)
        dst = state.a_dist[: K * M].reshape(K, M)
        a = self.archive_rankbase_alpha

        b_occ = jnp.any(occ, axis=-1)
        b_rank = jnp.cumsum(b_occ) - 1
        w_b = jnp.where(b_occ, 1.0 + a * b_rank, 0.0)

        span = jnp.maximum(jnp.max(dst, -1) - jnp.min(dst, -1), 1e-6)
        comp = jnp.where(occ, rew + 1e-4 * (dst / span[:, None]), jnp.inf)
        order = jnp.argsort(jnp.argsort(comp, axis=-1), axis=-1)  # rank asc
        w_c = jnp.where(occ, 1.0 + a * order.astype(jnp.float32), 0.0)

        logits = (
            jnp.log(jnp.maximum(w_b, 1e-12))[:, None]
            - jnp.log(jnp.maximum(w_c.sum(-1), 1e-12))[:, None]
            + jnp.log(jnp.maximum(w_c, 1e-12))
        )
        logits = jnp.where(occ, logits, -jnp.inf).reshape(-1)
        any_cell = jnp.any(b_occ)
        logits = jnp.where(any_cell, logits, jnp.zeros((K * M,)))
        cells = jax.random.categorical(k_cell, logits, shape=(B,))
        want = jax.random.uniform(k_go, (B,)) < self.archive_rate
        restore = was_reset & any_cell & want

        def pick(snap, cur):
            chosen = jax.tree.map(lambda b: b[: K * M][cells], snap)
            sel = lambda c, x: jnp.where(restore.reshape((B,) + (1,) * (x.ndim - 1)), c, x)
            return jax.tree.map(sel, chosen, cur)

        return pick(state.snap_env, env_state), pick(state.snap_ts, timestep)

    # ------------------------------------------------------------------
    def observe(self, state: GoDQState, t: Transition, mask) -> GoDQState:
        """Compute discounted rewards-to-go over the chunk (reverse scan), then
        push GoDQItems into replay. Chunk-tail windows bootstrap with the online
        max-Q (redesign of the 500-step tracking flush, worker.py:141-166)."""
        num_envs = mask.shape[1] // (1 + self.env.player_num)
        seq, valid, is_final = to_env_sequences(t, mask, num_envs)
        Bv, L = valid.shape

        P = self.mc_pend_rows
        if P:
            # two-chunk window: prepend the held-back chunk; its rows get a
            # reward-to-go spanning BOTH chunks, then get emitted, and the new
            # chunk takes its place (padded to P with invalid rows — the
            # reverse scan passes through invalids untouched)
            assert L <= P, f"mc_pend_rows={P} < per-env rows per chunk {L}"
            pend = state.pend
            cat = lambda a, b: jnp.concatenate([a, b], axis=1)
            w_obs = cat(pend["obs"], seq.obs)
            w_nobs = cat(pend["next_obs"], seq.next_obs)
            w_act = cat(pend["action"], seq.action)
            w_rew = cat(pend["reward"], seq.reward)
            w_und = cat(pend["undone"], seq.undone)
            w_val = cat(pend["valid"], valid)
            w_fin = cat(pend["final"], is_final)
            W = P + L
        else:
            w_obs, w_nobs, w_act = seq.obs, seq.next_obs, seq.action
            w_rew, w_und, w_val, w_fin = seq.reward, seq.undone, valid, is_final
            W = L

        flat = lambda x: x.reshape((Bv * W,) + x.shape[2:])
        oe = self.encoder.apply(state.params["encoder"], flat(w_nobs))
        nq, _ = dueling_q(*self.q_head.apply(state.params["q"], oe), key=None)
        boot = jnp.max(nq, -1).reshape(Bv, W)
        if self.enable_q_rescale:
            boot = funcs.inverse_linear_symlog(boot)
        boot = jax.lax.stop_gradient(boot) * w_und

        def rev_step(carry, xs):
            r, v, fin, bt = xs
            R, started = carry
            future = jnp.where(fin, 0.0, jnp.where(started, R, bt))
            rtg = r + self.discount * future
            R = jnp.where(v, rtg, R)
            started = jnp.logical_or(started, v)
            return (R, started), jnp.where(v, rtg, 0.0)

        xs = (w_rew.T, w_val.T, w_fin.T, boot.T)  # scan over the window
        init = (jnp.zeros((Bv,)), jnp.zeros((Bv,), bool))
        _, rtg = jax.lax.scan(rev_step, init, xs, reverse=True)
        rtg = rtg.T  # [Bv, W]

        if P:
            emit = slice(0, P)  # the held-back rows, now with 2-chunk targets
            emit_valid = w_val[:, emit]
            pad = lambda x: jnp.concatenate(
                [x, jnp.zeros((Bv, P - L) + x.shape[2:], x.dtype)], axis=1)
            new_pend = {
                "obs": pad(seq.obs), "next_obs": pad(seq.next_obs),
                "action": pad(seq.action), "reward": pad(seq.reward),
                "undone": pad(seq.undone), "valid": pad(valid),
                "final": pad(is_final),
            }
        else:
            emit = slice(0, W)
            emit_valid = w_val
            new_pend = state.pend
        eflat = lambda x: x[:, emit].reshape(
            (Bv * (emit.stop - emit.start),) + x.shape[2:])
        items = GoDQItem(
            obs=eflat(w_obs), action=eflat(w_act), reward=eflat(w_rew),
            next_obs=eflat(w_nobs), undone=eflat(w_und), total_reward=eflat(rtg),
        )
        return state.replace(
            pend=new_pend,
            memory=self._replay.add_masked(state.memory, items, emit_valid.reshape(-1)),
        )

    # ------------------------------------------------------------------
    def train(self, state: GoDQState, key: Array, num_steps: int) -> Tuple[GoDQState, Dict[str, Array]]:
        def one_update(st: GoDQState, k):
            ks = jax.random.split(k, 4)
            batch = self._replay.sample(st.memory, ks[0], self.batch_size)

            # shrink-and-perturb reset (torch_trainer.py:18-31,105-109)
            do_reset = (self.reset_net_interval > 0) & (
                st.train_count % self.reset_net_interval == 1
            )
            leaves, treedef = jax.tree.flatten(st.params)
            rks = list(jax.random.split(ks[1], len(leaves)))
            reset_leaves = [
                jnp.where(
                    do_reset,
                    (1.0 - self.lr) * p + jnp.tanh(jax.random.normal(rk, p.shape) * 0.1) * (self.lr * p),
                    p,
                )
                for p, rk in zip(leaves, rks)
            ]
            params = jax.tree.unflatten(treedef, reset_leaves)
            st = st.replace(
                params=params,
                reset_count=st.reset_count + do_reset.astype(jnp.int32),
            )

            (loss, aux), grads = jax.value_and_grad(self._loss, has_aux=True)(
                st.params, st, batch, ks[2]
            )
            if self.pmean_axis is not None:
                grads, aux = self.dp_pmean((grads, aux))
            grads = self._clip(grads)
            updates, opt_state = self._tx.update(grads, st.opt_state, st.params)
            new_params = optax.apply_updates(st.params, updates)

            ready = self._replay.is_warmup_over(st.memory)
            params = masked_update(ready, new_params, st.params)
            opt_state = masked_update(ready, opt_state, st.opt_state)
            train_count = st.train_count + ready.astype(jnp.int32)

            # RunningNorm EMA update (torch_model_nets.py:29-40)
            int_raw = aux.pop("int_raw")
            m = jnp.min(int_raw)
            v = jnp.var(int_raw - m)
            momentum = self.int_norm_momentum
            norm_min = jnp.where(
                st.norm_init, (1 - momentum) * st.norm_min + momentum * m, m
            )
            norm_var = jnp.where(
                st.norm_init,
                (1 - momentum) * st.norm_var + momentum * v,
                jnp.minimum(v, 1.0),
            )
            upd_norm = ready & (self.enable_int_q or self.feat_type == "BYOL")
            norm_min = jnp.where(upd_norm, norm_min, st.norm_min)
            norm_var = jnp.where(upd_norm, norm_var, st.norm_var)
            norm_init = st.norm_init | upd_norm

            # BYOL target soft sync every interval (torch_trainer.py:115-118)
            aux_params = st.aux_params
            if self.feat_type == "BYOL":
                sync = ready & (train_count % self.byol_model_update_interval == 0)
                rate = self.byol_model_update_rate
                tgt = jax.tree.map(
                    lambda tp, op: jnp.where(sync, (1 - rate) * tp + rate * op, tp),
                    aux_params["byol_target"],
                    params["byol_proj"],
                )
                aux_params = {**aux_params, "byol_target": tgt}

            return (
                st.replace(
                    params=params, aux_params=aux_params, opt_state=opt_state,
                    train_count=train_count, norm_min=norm_min, norm_var=norm_var,
                    norm_init=norm_init,
                ),
                aux,
            )

        n = num_steps * self.replay_ratio
        state, auxs = jax.lax.scan(one_update, state, jax.random.split(key, n))
        metrics = {k: jnp.mean(v) for k, v in auxs.items()}
        metrics["train_count"] = state.train_count.astype(jnp.float32)
        metrics["reset_net"] = state.reset_count.astype(jnp.float32)
        if self.enable_archive:
            metrics["archive_cells"] = state.occupied.sum().astype(jnp.float32)
        return state, metrics

    def _clip(self, grads):
        g = optax.clip_by_global_norm(self.max_grad_norm)
        return g.update(grads, None)[0]

    def _loss(self, params, state: GoDQState, b: GoDQItem, key):
        Bc = self.batch_size
        aux: Dict[str, Array] = {}
        obs_s = jnp.concatenate([b.obs, b.next_obs], axis=0)
        oe_s = self.encoder.apply(params["encoder"], obs_s)
        oe, n_oe = oe_s[:Bc], oe_s[Bc:]
        k_q, k_qi = jax.random.split(key)

        rs = k_q if self.enable_q_distribution else None
        q_all, _ = dueling_q(*self.q_head.apply(params["q"], oe_s), key=rs)

        # --- extrinsic target (torch_trainer.py:170-190)
        n_q = jax.lax.stop_gradient(jnp.max(q_all[Bc:], axis=-1))
        if self.enable_q_rescale:
            n_q = funcs.inverse_linear_symlog(n_q)
        target = b.reward + b.undone * self.discount * n_q
        total_reward = b.total_reward
        if self.enable_q_rescale:
            target = funcs.linear_symlog(target)
            total_reward = funcs.linear_symlog(total_reward)
        qa = jnp.take_along_axis(q_all[:Bc], b.action[:, None], -1)[:, 0]
        loss_q = jnp.mean(optax.huber_loss(qa, jax.lax.stop_gradient(target)))
        loss_align = jnp.mean(jnp.square(total_reward - qa))
        loss = loss_q + self.align_loss_coeff * loss_align
        aux["loss_q"] = loss_q
        aux["loss_align"] = loss_align

        # --- intrinsic reward
        int_raw = jnp.zeros((Bc,))
        int_rew = jnp.zeros((Bc,))
        if self.feat_type == "BYOL":
            trans = self.byol_trans.apply(params["byol_trans"], oe, b.action)
            y_hat = self.byol_pred.apply(
                params["byol_pred"], self.byol_proj.apply(params["byol_proj"], trans)
            )
            y_tgt = self.byol_proj.apply(
                state.aux_params["byol_target"], jax.lax.stop_gradient(n_oe)
            )
            lvec = byol_loss(jax.lax.stop_gradient(y_tgt), y_hat)
            loss_byol = jnp.mean(lvec)
            loss = loss + loss_byol
            aux["loss_byol"] = loss_byol
            int_raw = jax.lax.stop_gradient(lvec) * self.int_reward_byol_scale
            int_rew = jnp.clip(
                self._norm(state, int_raw), -self.int_reward_clip, self.int_reward_clip
            )
        elif self.enable_int_q:  # RND
            tgt = jax.lax.stop_gradient(
                self.rnd_net.apply(state.aux_params["rnd_target"], jax.lax.stop_gradient(n_oe))
            )
            prd = self.rnd_net.apply(params["rnd_pred"], jax.lax.stop_gradient(n_oe))
            err = jnp.mean(jnp.abs(prd - tgt), axis=-1) * self.int_reward_rnd_scale
            loss_rnd = jnp.mean(err)
            loss = loss + loss_rnd
            aux["loss_rnd"] = loss_rnd
            int_raw = jax.lax.stop_gradient(err)
            int_rew = jnp.clip(
                self._norm(state, int_raw), -self.int_reward_clip, self.int_reward_clip
            )
        aux["int_raw"] = int_raw

        # --- intrinsic Q (torch_trainer.py:205-233)
        if self.enable_int_q:
            oe_sg = jax.lax.stop_gradient(oe_s)
            rs_i = k_qi if self.enable_q_distribution else None
            qi_all, vi_all = dueling_q(*self.q_head.apply(params["q_int"], oe_sg), key=rs_i)
            n_qi = jax.lax.stop_gradient(jnp.max(qi_all[Bc:], -1))
            n_vi = jax.lax.stop_gradient(vi_all[Bc:])
            target_i = int_rew + b.undone * self.int_discount * (n_qi + n_vi) / 2.0
            qia = jnp.take_along_axis(qi_all[:Bc], b.action[:, None], -1)[:, 0]
            loss_iq = jnp.mean(optax.huber_loss(qia, jax.lax.stop_gradient(target_i)))
            loss_ia = jnp.mean(jnp.square(int_rew - qia))
            loss = loss + loss_iq + self.int_align_loss_coeff * loss_ia
            aux["loss_int_q"] = loss_iq
            aux["int_reward"] = jnp.mean(int_rew)

            if self.enable_int_episodic:
                e1 = self.emb_in.apply(params["emb_in"], jax.lax.stop_gradient(oe))
                e2 = self.emb_in.apply(params["emb_in"], jax.lax.stop_gradient(n_oe))
                logits = self.emb_out.apply(
                    params["emb_out"], jnp.concatenate([e1, e2], -1)
                )
                loss_emb = jnp.mean(
                    optax.softmax_cross_entropy_with_integer_labels(logits, b.action)
                )
                loss = loss + loss_emb
                aux["loss_emb"] = loss_emb

        aux["loss"] = loss
        return loss, aux

    # ------------------------------------------------------------------
    def params_of(self, state: GoDQState):
        return {"params": state.params, "aux_params": state.aux_params}

    def restore_params(self, state: GoDQState, p) -> GoDQState:
        return state.replace(params=p["params"], aux_params=p["aux_params"])
