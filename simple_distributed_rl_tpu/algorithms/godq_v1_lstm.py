"""GoDQ_v1_LSTM (parity: srl/algorithms/godq_v1_lstm/ — the recurrent GoDQ_v1):
the encoder embeds (observation, previous action) and feeds an LSTM whose cell
state is clipped to +-lstm_c_clip (torch_model.py:31-56); the extrinsic and
intrinsic dueling-distribution Q heads, linear-symlog rescale, Monte-Carlo
alignment loss, BYOL intrinsic reward and shrink-and-perturb resets are all
GoDQ_v1's, applied on the LSTM feature z (torch_trainer.py:150-260). There is no
target network: bootstrap targets come from the SAME unrolled net one step ahead
(torch_trainer.py:191-203). The reference trains on sequential episode windows
with a persistent streaming hidden carried across train calls
(torch_trainer.py:162-173, memory.py sample_sequential).

TPU re-design (shared with this framework's R2D2): the vectorized engine IS the
actor — LSTM hidden + previous action live in engine-threaded per-env actor
state; each rollout chunk of ``burnin + sequence_length`` lockstep steps stores
one sequence per env with the entering hidden snapshot; training replays burn-in
with the stored (stale) hidden then BPTTs the training segment — replacing the
reference's streaming-hidden iteration, which would serialize training on the
replay insertion order. The alignment target is the in-chunk discounted
reward-to-go, with entries whose episode does not close inside the chunk masked
out of the alignment loss (exact-MC semantics; the reference instead flushes
whole episodes, godq_v1_lstm/worker.py:141-158). The archive is TODO-disabled in
the reference (worker.py:64-67,125-139) and therefore absent here too.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Literal, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..define import RLBaseTypes
from ..memories.replay_buffer import ReplayBuffer
from ..models.blocks import InputBlockConfig
from ..utils import rl_functions as funcs
from .base import AlgoConfig, StepView, Transition
from .common import masked_update
from .godq_v1 import (
    MODE_GO,
    MODE_INT,
    MODE_Q,
    BYOLPredictor,
    BYOLProjection,
    BYOLTransition,
    EmbInBlock,
    EmbOutBlock,
    GoDQQHead,
    RNDNet,
    byol_loss,
    dueling_q,
)

Array = jax.Array


class GoDQLstmEncoder(nn.Module):
    """(obs, prev_action) -> LSTM -> z, cell state clipped
    (torch_model.py:16-56)."""

    units: int
    obs_space: Any
    input_block: InputBlockConfig
    num_actions: int
    c_clip: float

    @nn.compact
    def __call__(self, carry, obs, prev_action):
        e = self.input_block.create_block(self.obs_space)(jnp.asarray(obs, jnp.float32))
        e = nn.silu(nn.LayerNorm()(nn.Dense(self.units)(e)))
        ae = nn.Embed(self.num_actions, self.units)(prev_action)
        x = nn.Dense(self.units)(jnp.concatenate([e, ae], axis=-1))
        carry, z = nn.OptimizedLSTMCell(self.units)(carry, x)
        c, h = carry
        carry = (jnp.clip(c, -self.c_clip, self.c_clip), h)
        return carry, z


@struct.dataclass
class GoDQLstmSeq:
    obs: Any  # [T, ...]
    prev_action: Array  # [T]
    action: Array  # [T]
    reward: Array  # [T]
    terminated: Array  # [T] f32
    episode_start: Array  # [T] bool
    invalid_mask: Array  # [T, A]
    rtg: Array  # [T] in-chunk discounted reward-to-go
    rtg_valid: Array  # [T] f32: episode closed within the chunk
    init_h: Array
    init_c: Array


@struct.dataclass
class GoDQLstmActor:
    carry_c: Array
    carry_h: Array
    prev_action: Array  # [B]
    mode: Array
    go_action: Array
    epi_mem: Any
    epi_cnt: Array


@struct.dataclass
class GoDQLstmState:
    params: Any
    aux_params: Any
    opt_state: Any
    memory: Any
    train_count: Array
    reset_count: Array
    norm_min: Array
    norm_var: Array
    norm_init: Array


@dataclasses.dataclass
class GoDQv1LstmConfig(AlgoConfig):
    """Config (parity: godq_v1_lstm/config.py; defaults inherit GoDQ_v1's with the
    LSTM overrides int_discount=0.9, lstm_c_clip=10)."""

    test_epsilon: float = 0.0
    test_policy: Literal["q", "int"] = "q"
    epsilon: float = 0.01
    lstm_c_clip: float = 10.0
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
    int_discount: float = 0.9
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
    episodic_memory_capacity: int = 512
    # sequence replay
    burnin: int = 5
    sequence_length: int = 10
    # model/train
    base_units: int = 512
    max_grad_norm: float = 10.0
    batch_size: int = 64
    lr: float = 1e-4
    memory_capacity: int = 10_000  # sequences
    memory_warmup_size: int = 100
    input_block: InputBlockConfig = dataclasses.field(default_factory=InputBlockConfig)

    observation_type: RLBaseTypes = RLBaseTypes.BOX
    action_type: RLBaseTypes = RLBaseTypes.DISCRETE
    has_actor_state: bool = True
    needs_step_view: bool = True

    def get_name(self) -> str:
        return "GoDQ_v1_LSTM"

    @property
    def required_chunk_steps(self) -> int:
        return self.burnin + self.sequence_length

    def on_setup(self) -> None:
        assert self.replay_ratio > 0
        U, A = self.base_units, self.num_actions
        self._replay = ReplayBuffer(self.memory_capacity, self.memory_warmup_size)
        self.encoder = GoDQLstmEncoder(
            U, self.obs_space, self.input_block, A, self.lstm_c_clip
        )
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

        def label_fn(params):
            return {
                k: jax.tree.map(lambda _: "rnd" if k == "rnd_pred" else "main", v)
                for k, v in params.items()
            }

        self._tx = optax.multi_transform(
            {"main": main_tx, "rnd": optax.adam(self.lr / 5.0)}, label_fn
        )

    def _zero_carry(self, batch: int):
        return (
            jnp.zeros((batch, self.base_units), jnp.float32),
            jnp.zeros((batch, self.base_units), jnp.float32),
        )

    def init(self, key: Array) -> GoDQLstmState:
        ks = jax.random.split(key, 10)
        obs0 = self.obs_space.zero()[None]
        a0 = jnp.zeros((1,), jnp.int32)
        enc = self.encoder.init(ks[0], self._zero_carry(1), obs0, a0)
        _, z0 = self.encoder.apply(enc, self._zero_carry(1), obs0, a0)
        params = {"encoder": enc, "q": self.q_head.init(ks[1], z0)}
        aux = {}
        if self.feat_type == "BYOL":
            params["byol_trans"] = self.byol_trans.init(ks[2], z0, a0)
            params["byol_proj"] = self.byol_proj.init(ks[3], z0)
            params["byol_pred"] = self.byol_pred.init(
                ks[4], self.byol_proj.apply(params["byol_proj"], z0)
            )
            aux["byol_target"] = jax.tree.map(jnp.copy, params["byol_proj"])
        if self.enable_int_q:
            params["q_int"] = self.q_head.init(ks[5], z0)
            if self.feat_type == "":
                params["rnd_pred"] = self.rnd_net.init(ks[6], z0)
                aux["rnd_target"] = self.rnd_net.init(ks[7], z0)
            if self.enable_int_episodic:
                emb_in = self.emb_in.init(ks[8], z0)
                e0 = self.emb_in.apply(emb_in, z0)
                params["emb_in"] = emb_in
                params["emb_out"] = self.emb_out.init(
                    ks[9], jnp.concatenate([e0, e0], axis=-1)
                )

        T, A = self.required_chunk_steps, self.num_actions
        o0 = self.obs_space.zero()
        ex = GoDQLstmSeq(
            obs=jnp.zeros((T,) + o0.shape, o0.dtype),
            prev_action=jnp.zeros((T,), jnp.int32),
            action=jnp.zeros((T,), jnp.int32),
            reward=jnp.zeros((T,), jnp.float32),
            terminated=jnp.zeros((T,), jnp.float32),
            episode_start=jnp.zeros((T,), jnp.bool_),
            invalid_mask=jnp.zeros((T, A), jnp.bool_),
            rtg=jnp.zeros((T,), jnp.float32),
            rtg_valid=jnp.zeros((T,), jnp.float32),
            init_h=jnp.zeros((self.base_units,), jnp.float32),
            init_c=jnp.zeros((self.base_units,), jnp.float32),
        )
        return GoDQLstmState(
            params=params,
            aux_params=aux,
            opt_state=self._tx.init(params),
            memory=self._replay.init(ex),
            train_count=jnp.asarray(0, jnp.int32),
            reset_count=jnp.asarray(0, jnp.int32),
            norm_min=jnp.asarray(0.0),
            norm_var=jnp.asarray(1.0),
            norm_init=jnp.asarray(False),
        )

    # --- actor ------------------------------------------------------------
    def init_actor_state(self, key, num_envs):
        B = num_envs
        if self.enable_int_q and self.enable_int_episodic:
            epi_mem = jnp.zeros((B, self.episodic_memory_capacity, self.base_units))
        else:
            epi_mem = ()
        return GoDQLstmActor(
            carry_c=jnp.zeros((B, self.base_units)),
            carry_h=jnp.zeros((B, self.base_units)),
            prev_action=jnp.zeros((B,), jnp.int32),
            mode=jnp.zeros((B,), jnp.int32),
            go_action=jnp.zeros((B,), jnp.int32),
            epi_mem=epi_mem,
            epi_cnt=jnp.zeros((B,), jnp.int32),
        )

    def actor_snapshot(self, actor: GoDQLstmActor):
        return (actor.carry_c, actor.carry_h, actor.prev_action)

    def _norm(self, state, x):
        std = jnp.sqrt(jnp.maximum(state.norm_var, 0.0))
        return (x - state.norm_min) / jnp.maximum(std, 1e-10)

    def _episodic_reward(self, params, z, mem, cnt):
        cont = self.emb_in.apply(params["emb_in"], z)
        cap = self.episodic_memory_capacity
        d = jnp.linalg.norm(mem - cont[:, None, :], axis=-1)
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
        r = 1.0 / jnp.sqrt(dirac.sum(-1) + 1.0)
        return jnp.where(cnt == 0, 1.0, r), cont

    def policy_step(self, state: GoDQLstmState, actor: GoDQLstmActor, obs, invalid_mask, ctx, key, episode_start):
        B = invalid_mask.shape[0]
        keys = jax.random.split(key, 6)

        # reset hidden + prev action at episode starts (worker.py on_reset:28-62)
        m = episode_start[:, None].astype(jnp.float32)
        carry = (actor.carry_c * (1.0 - m), actor.carry_h * (1.0 - m))
        prev_a = jnp.where(episode_start, 0, actor.prev_action)
        carry, z = self.encoder.apply(state.params["encoder"], carry, obs, prev_a)

        # per-episode mode
        train_mode = jnp.where(
            state.train_count == 0, MODE_GO, MODE_INT if self.enable_int_q else MODE_Q
        )
        eval_mode = MODE_INT if (self.test_policy == "int" and self.enable_int_q) else MODE_Q
        new_mode = jnp.where(ctx.training, train_mode, eval_mode)
        mode = jnp.where(episode_start, new_mode, actor.mode)

        rand_logits = jnp.where(  # width = ENCODED action space, mask broadcasts up
            invalid_mask, -jnp.inf, jnp.zeros((invalid_mask.shape[0], self.num_actions))
        )
        fresh_go = jax.random.categorical(keys[0], rand_logits, -1).astype(jnp.int32)
        go_action = jnp.where(episode_start, fresh_go, actor.go_action)
        reroll = jax.random.uniform(keys[1], (B,)) < 0.1
        a_re = jax.random.categorical(keys[2], rand_logits, -1).astype(jnp.int32)
        go_action = jnp.where(reroll, a_re, go_action)

        head = self.q_head.apply(state.params["q"], z)
        if self.enable_q_distribution:
            q_s, _ = dueling_q(*head, key=keys[3])
            q_m, _ = dueling_q(*head, key=None)
            q = jnp.where(ctx.training, q_s, q_m)
        else:
            q, _ = dueling_q(*head, key=None)

        eps = jnp.where(ctx.training, self.epsilon, self.test_epsilon)
        epi_mem, epi_cnt = actor.epi_mem, actor.epi_cnt
        if self.enable_int_q and self.enable_int_episodic:
            epi_cnt = jnp.where(episode_start, 0, epi_cnt)
            epi_r, cont = self._episodic_reward(state.params, z, epi_mem, epi_cnt)
            slot = epi_cnt % self.episodic_memory_capacity
            epi_mem = epi_mem.at[jnp.arange(B), slot].set(cont)
            epi_cnt = epi_cnt + 1
            eps = jnp.where(ctx.training, jnp.clip(1.0 - jnp.sqrt(epi_r), 0.0, 0.2), eps)

        if self.enable_int_q:
            q_int, _ = dueling_q(*self.q_head.apply(state.params["q_int"], z), key=None)
            mix = jax.nn.softmax(q - jnp.mean(q, -1, keepdims=True), -1) + self.int_rate * jax.nn.softmax(q_int, -1)
        else:
            mix = q
        a_int = funcs.epsilon_greedy(mix, invalid_mask, eps, keys[4])
        a_q = funcs.epsilon_greedy(q, invalid_mask, eps, keys[5])
        action = jnp.where(
            mode == MODE_GO, go_action, jnp.where(mode == MODE_INT, a_int, a_q)
        )

        new_actor = GoDQLstmActor(
            carry_c=carry[0], carry_h=carry[1], prev_action=action,
            mode=mode, go_action=go_action, epi_mem=epi_mem, epi_cnt=epi_cnt,
        )
        return action, new_actor

    # --- memory -----------------------------------------------------------
    def observe_chunk(self, state: GoDQLstmState, transitions: Transition, mask, sv: StepView) -> GoDQLstmState:
        c0, h0, pa = sv.actor_snapshot  # [T, B, ...]
        T = sv.reward.shape[0]
        done = jnp.logical_or(sv.terminated, sv.truncated)  # [T, B]

        # in-chunk discounted reward-to-go + closed-episode validity (reverse scan)
        def rev(carry, xs):
            r, d = xs
            R, closed = carry
            R = r + self.discount * jnp.where(d, 0.0, R)
            closed = jnp.logical_or(d, closed)
            return (R, closed), (R, closed)

        init = (jnp.zeros(sv.reward.shape[1:]), jnp.zeros(done.shape[1:], bool))
        _, (rtg, closed) = jax.lax.scan(rev, init, (sv.reward, done), reverse=True)

        tb = lambda x: jnp.moveaxis(x, 0, 1)
        items = GoDQLstmSeq(
            obs=tb(sv.obs),
            prev_action=tb(pa),
            action=tb(sv.action),
            reward=tb(sv.reward),
            terminated=tb(sv.terminated).astype(jnp.float32),
            episode_start=tb(sv.episode_start),
            invalid_mask=tb(sv.invalid_mask),
            rtg=tb(rtg),
            rtg_valid=tb(closed).astype(jnp.float32),
            init_h=h0[0],
            init_c=c0[0],
        )
        return state.replace(memory=self._replay.add(state.memory, items))

    # --- trainer ----------------------------------------------------------
    def _unroll(self, params, carry, batch: GoDQLstmSeq, sl, stop_grad=False):
        obs = jnp.moveaxis(jnp.asarray(batch.obs[:, sl], jnp.float32), 0, 1)
        pa = jnp.moveaxis(batch.prev_action[:, sl], 0, 1)
        es = jnp.moveaxis(batch.episode_start[:, sl], 0, 1)

        def step(carry, x):
            o, a, e = x
            m = e[:, None].astype(jnp.float32)
            carry = (carry[0] * (1.0 - m), carry[1] * (1.0 - m))
            carry, z = self.encoder.apply(params["encoder"], carry, o, a)
            if stop_grad:
                carry = jax.lax.stop_gradient(carry)
            return carry, z

        carry, zs = jax.lax.scan(step, carry, (obs, pa, es))
        return carry, jnp.moveaxis(zs, 0, 1)  # [bs, T, U]

    def _loss(self, params, state: GoDQLstmState, batch: GoDQLstmSeq, key):
        aux: Dict[str, Array] = {}
        carry0 = (batch.init_c, batch.init_h)
        if self.burnin > 0:
            carry_on, _ = self._unroll(params, carry0, batch, slice(0, self.burnin), stop_grad=True)
            carry_on = jax.lax.stop_gradient(carry_on)
        else:
            carry_on = carry0
        sl = slice(self.burnin, self.burnin + self.sequence_length)
        _, z = self._unroll(params, carry_on, batch, sl)  # [bs, T, U]
        bs, T, U = z.shape
        act = batch.action[:, sl]
        rew = batch.reward[:, sl]
        term = batch.terminated[:, sl]
        es = batch.episode_start[:, sl]
        rtg = batch.rtg[:, sl]
        rtg_valid = batch.rtg_valid[:, sl]

        k_q, k_qi = jax.random.split(key)
        flat = lambda x: x.reshape((bs * T,) + x.shape[2:])
        unflat = lambda x: x.reshape((bs, T) + x.shape[1:])
        head = self.q_head.apply(params["q"], flat(z))
        rs = k_q if self.enable_q_distribution else None
        q_all, _ = dueling_q(*head, key=rs)
        q_all = unflat(q_all)  # [bs, T, A]

        # successor validity: step t bootstraps from t+1 unless t+1 starts an episode
        valid = 1.0 - es[:, 1:].astype(jnp.float32)  # [bs, T-1]

        n_q = jax.lax.stop_gradient(jnp.max(q_all[:, 1:], -1))
        if self.enable_q_rescale:
            n_q = funcs.inverse_linear_symlog(n_q)
        undone = 1.0 - term[:, :-1]
        target = rew[:, :-1] + undone * self.discount * n_q
        rtg_t = rtg[:, :-1]
        if self.enable_q_rescale:
            target = funcs.linear_symlog(target)
            rtg_t = funcs.linear_symlog(rtg_t)
        qa = jnp.take_along_axis(q_all[:, :-1], act[:, :-1, None], -1)[..., 0]
        nvalid = jnp.maximum(valid.sum(), 1.0)
        loss_q = jnp.sum(optax.huber_loss(qa, jax.lax.stop_gradient(target)) * valid) / nvalid
        av = valid * rtg_valid[:, :-1]
        loss_align = jnp.sum(jnp.square(rtg_t - qa) * av) / jnp.maximum(av.sum(), 1.0)
        loss = loss_q + self.align_loss_coeff * loss_align
        aux["loss_q"] = loss_q
        aux["loss_align"] = loss_align

        # --- intrinsic reward on z space (torch_trainer.py:216-231)
        int_raw = jnp.zeros((bs, T - 1))
        int_rew = jnp.zeros((bs, T - 1))
        z_t = z[:, :-1].reshape((bs * (T - 1), U))
        z_n = z[:, 1:].reshape((bs * (T - 1), U))
        a_t = act[:, :-1].reshape(-1)
        if self.feat_type == "BYOL":
            trans = self.byol_trans.apply(params["byol_trans"], z_t, a_t)
            y_hat = self.byol_pred.apply(
                params["byol_pred"], self.byol_proj.apply(params["byol_proj"], trans)
            )
            y_tgt = self.byol_proj.apply(
                state.aux_params["byol_target"], jax.lax.stop_gradient(z_n)
            )
            lvec = byol_loss(jax.lax.stop_gradient(y_tgt), y_hat).reshape(bs, T - 1)
            loss_byol = jnp.sum(lvec * valid) / nvalid
            loss = loss + loss_byol
            aux["loss_byol"] = loss_byol
            int_raw = jax.lax.stop_gradient(lvec) * self.int_reward_byol_scale
            int_rew = jnp.clip(self._norm(state, int_raw), -self.int_reward_clip, self.int_reward_clip)
        elif self.enable_int_q:
            tgt = jax.lax.stop_gradient(
                self.rnd_net.apply(state.aux_params["rnd_target"], jax.lax.stop_gradient(z_n))
            )
            prd = self.rnd_net.apply(params["rnd_pred"], jax.lax.stop_gradient(z_n))
            err = (jnp.mean(jnp.abs(prd - tgt), -1) * self.int_reward_rnd_scale).reshape(bs, T - 1)
            loss_rnd = jnp.sum(err * valid) / nvalid
            loss = loss + loss_rnd
            aux["loss_rnd"] = loss_rnd
            int_raw = jax.lax.stop_gradient(err)
            int_rew = jnp.clip(self._norm(state, int_raw), -self.int_reward_clip, self.int_reward_clip)
        aux["int_raw"] = int_raw

        if self.enable_int_q:
            z_sg = jax.lax.stop_gradient(flat(z))
            rs_i = k_qi if self.enable_q_distribution else None
            qi_all, vi_all = dueling_q(*self.q_head.apply(params["q_int"], z_sg), key=rs_i)
            qi_all, vi_all = unflat(qi_all), vi_all.reshape(bs, T)
            n_qi = jax.lax.stop_gradient(jnp.max(qi_all[:, 1:], -1))
            n_vi = jax.lax.stop_gradient(vi_all[:, 1:])
            target_i = int_rew + undone * self.int_discount * (n_qi + n_vi) / 2.0
            qia = jnp.take_along_axis(qi_all[:, :-1], act[:, :-1, None], -1)[..., 0]
            loss_iq = jnp.sum(optax.huber_loss(qia, jax.lax.stop_gradient(target_i)) * valid) / nvalid
            loss_ia = jnp.sum(jnp.square(int_rew - qia) * valid) / nvalid
            loss = loss + loss_iq + self.int_align_loss_coeff * loss_ia
            aux["loss_int_q"] = loss_iq
            aux["int_reward"] = jnp.sum(int_rew * valid) / nvalid

            if self.enable_int_episodic:
                e1 = self.emb_in.apply(params["emb_in"], jax.lax.stop_gradient(z_t))
                e2 = self.emb_in.apply(params["emb_in"], jax.lax.stop_gradient(z_n))
                logits = self.emb_out.apply(params["emb_out"], jnp.concatenate([e1, e2], -1))
                ce = optax.softmax_cross_entropy_with_integer_labels(logits, a_t).reshape(bs, T - 1)
                loss_emb = jnp.sum(ce * valid) / nvalid
                loss = loss + loss_emb
                aux["loss_emb"] = loss_emb

        aux["loss"] = loss
        return loss, aux

    def train(self, state: GoDQLstmState, key: Array, num_steps: int) -> Tuple[GoDQLstmState, Dict[str, Array]]:
        def one_update(st: GoDQLstmState, k):
            ks = jax.random.split(k, 3)
            batch = self._replay.sample(st.memory, ks[0], self.batch_size)

            do_reset = (self.reset_net_interval > 0) & (
                st.train_count % self.reset_net_interval == 1
            )
            leaves, treedef = jax.tree.flatten(st.params)
            rks = list(jax.random.split(ks[1], len(leaves)))
            params = jax.tree.unflatten(
                treedef,
                [
                    jnp.where(
                        do_reset,
                        (1.0 - self.lr) * p
                        + jnp.tanh(jax.random.normal(rk, p.shape) * 0.1) * (self.lr * p),
                        p,
                    )
                    for p, rk in zip(leaves, rks)
                ],
            )
            st = st.replace(
                params=params, reset_count=st.reset_count + do_reset.astype(jnp.int32)
            )

            (loss, aux), grads = jax.value_and_grad(self._loss, has_aux=True)(
                st.params, st, batch, ks[2]
            )
            if self.pmean_axis is not None:
                grads, aux = self.dp_pmean((grads, aux))
            grads = optax.clip_by_global_norm(self.max_grad_norm).update(grads, None)[0]
            updates, opt_state = self._tx.update(grads, st.opt_state, st.params)
            new_params = optax.apply_updates(st.params, updates)

            ready = self._replay.is_warmup_over(st.memory)
            params = masked_update(ready, new_params, st.params)
            opt_state = masked_update(ready, opt_state, st.opt_state)
            train_count = st.train_count + ready.astype(jnp.int32)

            int_raw = aux.pop("int_raw")
            m = jnp.min(int_raw)
            v = jnp.var(int_raw - m)
            mom = self.int_norm_momentum
            norm_min = jnp.where(st.norm_init, (1 - mom) * st.norm_min + mom * m, m)
            norm_var = jnp.where(
                st.norm_init, (1 - mom) * st.norm_var + mom * v, jnp.minimum(v, 1.0)
            )
            upd = ready & (self.enable_int_q or self.feat_type == "BYOL")
            norm_min = jnp.where(upd, norm_min, st.norm_min)
            norm_var = jnp.where(upd, norm_var, st.norm_var)
            norm_init = st.norm_init | upd

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
        return state, metrics

    def params_of(self, state: GoDQLstmState):
        return {"params": state.params, "aux_params": state.aux_params}

    def restore_params(self, state: GoDQLstmState, p) -> GoDQLstmState:
        return state.replace(params=p["params"], aux_params=p["aux_params"])
