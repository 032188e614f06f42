"""Agent57 — the full version (parity: srl/algorithms/agent57/ — Agent57_light plus
the R2D2 machinery: UVFA-LSTM ext/int Q networks, sequence replay with stored
recurrent states and burn-in, per-arm discounts in the targets; actor_num=32 ladder,
sliding-window UCB meta-controller, episodic kNN x RND intrinsic rewards).

Built by composing this framework's R2D2 sequence path (engine-threaded LSTM carries,
one stored sequence per env per chunk) with the Agent57-light actor stack (UCB arms,
episodic embedding ring, RND). Each env slot is an actor.
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
from ..models.blocks import DuelingHead, InputBlockConfig, MLPBlock
from ..utils import rl_functions as funcs
from .agent57_light import EmbActionHead, EmbedNet, RNDNet
from .base import AlgoConfig, StepView
from .common import masked_update, periodic_target_sync

Array = jax.Array


class UVFALSTMQNet(nn.Module):
    """input block + UVFA conditioning -> LSTM -> dueling Q (parity:
    agent57/model_tf.py towers)."""

    num_actions: int
    num_actors: int
    obs_space: Any
    input_block: InputBlockConfig
    lstm_units: int
    hidden: Tuple[int, ...]
    # UVFA input toggles (parity: agent57 config input_ext_reward /
    # input_int_reward / input_action; the reference's Pendulum long test
    # disables all three, base_agent57.py:38-59)
    input_ext_reward: bool = True
    input_int_reward: bool = True
    input_action: bool = True

    @nn.compact
    def __call__(self, carry, obs, prev_r_ext, prev_r_int, prev_a_onehot, actor_onehot):
        x = self.input_block.create_block(self.obs_space)(jnp.asarray(obs, jnp.float32))
        feats = [x]
        if self.input_ext_reward:
            feats.append(prev_r_ext)
        if self.input_int_reward:
            feats.append(prev_r_int)
        if self.input_action:
            feats.append(prev_a_onehot)
        feats.append(actor_onehot)
        x = jnp.concatenate(feats, -1)
        x = MLPBlock(self.hidden)(x)
        carry, h = nn.OptimizedLSTMCell(self.lstm_units)(carry, x)
        q = DuelingHead(self.num_actions)(h)
        return carry, q


@struct.dataclass
class A57FullActorState:
    actor_idx: Array  # [B]
    prev_action: Array  # [B]
    prev_r_ext: Array  # [B]
    prev_r_int: Array  # [B]
    r_int_cur: Array  # [B]
    epi_mem: Array  # [B, cap, emb]
    epi_cnt: Array  # [B]
    ucb_count: Array  # [B, N]
    ucb_reward: Array  # [B, N]
    ext_c: Array  # [B, units] LSTM carries
    ext_h: Array
    int_c: Array
    int_h: Array


@struct.dataclass
class A57Seq:
    obs: Any  # [T, ...]
    action: Array  # [T]
    reward_ext: Array  # [T]
    reward_int: Array  # [T] intrinsic of the arrival state of step t
    terminated: Array  # [T]
    episode_start: Array  # [T]
    invalid_mask: Array  # [T, A]
    prev_a: Array  # [T] UVFA inputs used at each step
    prev_r_ext: Array  # [T]
    prev_r_int: Array  # [T]
    actor_idx: Array  # [T]
    init_ext_c: Array  # [units]
    init_ext_h: Array
    init_int_c: Array
    init_int_h: Array


@struct.dataclass
class A57FullState:
    params: Any  # {q_ext, q_int, emb, emb_act, rnd_pred, rnd_target}
    target_params: Any  # {q_ext, q_int}
    opt_state: Any
    memory: Any
    train_count: Array


@dataclasses.dataclass
class Agent57Config(AlgoConfig):
    test_epsilon: float = 0.0
    test_beta: float = 0.0
    batch_size: int = 16
    capacity: int = 5_000  # sequences
    warmup_size: int = 100
    lr_ext: float = 1e-4
    lr_int: float = 1e-4
    target_model_update_interval: int = 500
    enable_double_dqn: bool = True
    enable_rescale: bool = False
    enable_intrinsic_reward: bool = True
    actor_num: int = 32
    ucb_epsilon: float = 0.5
    ucb_beta: float = 1.0
    episodic_memory_capacity: int = 300
    episodic_count_max: int = 10
    episodic_epsilon: float = 1e-3
    episodic_cluster_distance: float = 8e-3
    episodic_pseudo_counts: float = 0.1
    lifelong_max: float = 5.0
    emb_dim: int = 32
    #: UVFA input toggles (parity: agent57 config)
    input_ext_reward: bool = True
    input_int_reward: bool = True
    input_action: bool = True
    burnin: int = 5
    sequence_length: int = 10
    lstm_units: int = 64
    input_block: InputBlockConfig = dataclasses.field(default_factory=InputBlockConfig)
    hidden_sizes: Tuple[int, ...] = (64,)

    observation_type: RLBaseTypes = RLBaseTypes.BOX
    action_type: RLBaseTypes = RLBaseTypes.DISCRETE

    has_actor_state: bool = True
    needs_step_view: bool = True
    needs_env_state: bool = True

    def get_name(self) -> str:
        return "Agent57"

    @property
    def required_chunk_steps(self) -> int:
        return self.burnin + self.sequence_length

    def on_setup(self) -> None:
        A, N = self.action_space.n, self.actor_num
        self.q_net = UVFALSTMQNet(
            A, N, self.obs_space, self.input_block, self.lstm_units, self.hidden_sizes,
            input_ext_reward=self.input_ext_reward,
            input_int_reward=self.input_int_reward,
            input_action=self.input_action,
        )
        self.emb_net = EmbedNet(self.obs_space, self.input_block, self.emb_dim)
        self.emb_act = EmbActionHead(A)
        self.rnd_net = RNDNet(self.obs_space, self.input_block)
        self._replay = ReplayBuffer(self.capacity, self.warmup_size)
        self._beta_list = jnp.asarray(funcs.agent57_beta_list(N))
        self._eps_list = jnp.asarray(funcs.agent57_epsilon_list(N))
        self._gamma_list = jnp.asarray(funcs.agent57_gamma_list(N))
        self._tx = optax.adam(self.lr_ext)

    # ------------------------------------------------------------------
    def _zero_carry(self, b):
        return (jnp.zeros((b, self.lstm_units)), jnp.zeros((b, self.lstm_units)))

    def _uvfa(self, obs, r_ext, r_int, a, arm):
        A, N = self.action_space.n, self.actor_num
        return (
            obs, r_ext[:, None], r_int[:, None],
            jax.nn.one_hot(a, A), jax.nn.one_hot(arm, N),
        )

    def _example_seq(self) -> A57Seq:
        T, A, U = self.required_chunk_steps, self.num_actions, self.lstm_units
        obs0 = self.obs_space.zero()
        return A57Seq(
            obs=jnp.zeros((T,) + obs0.shape, obs0.dtype),
            action=jnp.zeros((T,), jnp.int32),
            reward_ext=jnp.zeros((T,)),
            reward_int=jnp.zeros((T,)),
            terminated=jnp.zeros((T,)),
            episode_start=jnp.zeros((T,), bool),
            invalid_mask=jnp.zeros((T, A), bool),
            prev_a=jnp.zeros((T,), jnp.int32),
            prev_r_ext=jnp.zeros((T,)),
            prev_r_int=jnp.zeros((T,)),
            actor_idx=jnp.zeros((T,), jnp.int32),
            init_ext_c=jnp.zeros((U,)),
            init_ext_h=jnp.zeros((U,)),
            init_int_c=jnp.zeros((U,)),
            init_int_h=jnp.zeros((U,)),
        )

    def init(self, key: Array) -> A57FullState:
        ks = jax.random.split(key, 6)
        obs0 = self.obs_space.zero()[None]
        A, N = self.action_space.n, self.actor_num
        carry0 = self._zero_carry(1)
        uvfa0 = (obs0, jnp.zeros((1, 1)), jnp.zeros((1, 1)), jnp.zeros((1, A)), jnp.zeros((1, N)))
        params = {
            "q_ext": self.q_net.init(ks[0], carry0, *uvfa0),
            "q_int": self.q_net.init(ks[1], carry0, *uvfa0),
            "emb": self.emb_net.init(ks[2], obs0),
            "emb_act": self.emb_act.init(
                ks[3], jnp.zeros((1, self.emb_dim)), jnp.zeros((1, self.emb_dim))
            ),
            "rnd_pred": self.rnd_net.init(ks[4], obs0),
            "rnd_target": self.rnd_net.init(ks[5], obs0),
        }
        return A57FullState(
            params=params,
            target_params={
                "q_ext": jax.tree.map(jnp.copy, params["q_ext"]),
                "q_int": jax.tree.map(jnp.copy, params["q_int"]),
            },
            opt_state=self._tx.init(params),
            memory=self._replay.init(self._example_seq()),
            train_count=jnp.asarray(0, jnp.int32),
        )

    def init_actor_state(self, key, num_envs) -> A57FullActorState:
        B, N, U = num_envs, self.actor_num, self.lstm_units
        return A57FullActorState(
            actor_idx=jnp.arange(B, dtype=jnp.int32) % N,
            prev_action=jnp.zeros((B,), jnp.int32),
            prev_r_ext=jnp.zeros((B,)),
            prev_r_int=jnp.zeros((B,)),
            r_int_cur=jnp.zeros((B,)),
            epi_mem=jnp.zeros((B, self.episodic_memory_capacity, self.emb_dim)),
            epi_cnt=jnp.zeros((B,), jnp.int32),
            ucb_count=jnp.ones((B, N)),
            ucb_reward=jnp.zeros((B, N)),
            ext_c=jnp.zeros((B, U)), ext_h=jnp.zeros((B, U)),
            int_c=jnp.zeros((B, U)), int_h=jnp.zeros((B, U)),
        )

    def actor_snapshot(self, actor: A57FullActorState):
        return {
            "actor_idx": actor.actor_idx,
            "prev_action": actor.prev_action,
            "prev_r_ext": actor.prev_r_ext,
            "prev_r_int": actor.prev_r_int,
            "r_int_cur": actor.r_int_cur,
            "ext_c": actor.ext_c, "ext_h": actor.ext_h,
            "int_c": actor.int_c, "int_h": actor.int_h,
        }

    # ------------------------------------------------------------------
    def _episodic_reward(self, emb, mem, cnt):
        from .agent57_light import Agent57LightConfig

        return Agent57LightConfig._episodic_reward(self, emb, mem, cnt)

    def _lifelong_reward(self, params, obs):
        tgt = self.rnd_net.apply(params["rnd_target"], obs)
        prd = self.rnd_net.apply(params["rnd_pred"], obs)
        err = jnp.mean(jnp.square(tgt - prd), axis=-1)
        return jnp.clip(1.0 + err, 1.0, self.lifelong_max)

    def policy_step(self, state: A57FullState, actor, obs, invalid_mask, ctx, key, episode_start):
        B, N = invalid_mask.shape[0], self.actor_num
        idx = jnp.arange(B)
        params = state.params
        prev_r = ctx.prev_rewards[:, 0]

        # UCB arm per episode (same bandit as agent57_light)
        ep_reward = (
            ctx.autoreset_state.last_episode_reward[:, 0]
            if ctx.autoreset_state is not None else prev_r
        )
        ucb_count = actor.ucb_count.at[idx, actor.actor_idx].add(
            jnp.where(episode_start, 1.0, 0.0)
        )
        ucb_reward = actor.ucb_reward.at[idx, actor.actor_idx].add(
            jnp.where(episode_start, ep_reward, 0.0)
        )
        k_ucb, k_exp, key = jax.random.split(key, 3)
        total = ucb_count.sum(-1, keepdims=True)
        ucb = ucb_reward / ucb_count + self.ucb_beta * jnp.sqrt(
            jnp.log(jnp.maximum(total, 1.0)) / ucb_count
        )
        best = funcs.random_max_index(ucb, jnp.zeros((B, N), bool), k_ucb)
        rand_arm = jax.random.randint(k_exp, (B,), 0, N)
        explore = jax.random.uniform(key, (B,)) < self.ucb_epsilon
        arm = jnp.where(explore, rand_arm, best)
        actor_idx = jnp.where(episode_start, arm, actor.actor_idx)
        actor_idx = jnp.where(ctx.training, actor_idx, jnp.zeros_like(actor_idx))

        # episodic + lifelong intrinsic of the current obs
        epi_cnt = jnp.where(episode_start, 0, actor.epi_cnt)
        emb = self.emb_net.apply(params["emb"], obs)
        r_epi = self._episodic_reward(emb, actor.epi_mem, epi_cnt)
        r_life = self._lifelong_reward(params, obs)
        r_int = r_epi * r_life if self.enable_intrinsic_reward else jnp.zeros((B,))
        slot = epi_cnt % self.episodic_memory_capacity
        epi_mem = actor.epi_mem.at[idx, slot].set(emb)
        epi_cnt = epi_cnt + 1

        prev_action = jnp.where(episode_start, 0, actor.prev_action)
        prev_r_ext = jnp.where(episode_start, 0.0, prev_r)
        prev_r_int = jnp.where(episode_start, 0.0, actor.r_int_cur)

        # LSTM carries reset at episode starts
        m = episode_start[:, None].astype(jnp.float32)
        ext_carry = (actor.ext_c * (1 - m), actor.ext_h * (1 - m))
        int_carry = (actor.int_c * (1 - m), actor.int_h * (1 - m))

        uvfa = self._uvfa(obs, prev_r_ext, prev_r_int, prev_action, actor_idx)
        ext_carry, q_ext = self.q_net.apply(params["q_ext"], ext_carry, *uvfa)
        int_carry, q_int = self.q_net.apply(params["q_int"], int_carry, *uvfa)

        beta = jnp.where(ctx.training, self._beta_list[actor_idx], self.test_beta)
        eps = jnp.where(ctx.training, self._eps_list[actor_idx], self.test_epsilon)
        q = q_ext + beta[:, None] * q_int
        key, k_act = jax.random.split(key)
        action = funcs.epsilon_greedy(q, invalid_mask, eps, k_act)

        new_actor = A57FullActorState(
            actor_idx=actor_idx,
            prev_action=action,
            prev_r_ext=prev_r_ext,
            prev_r_int=prev_r_int,
            r_int_cur=jnp.where(ctx.training, r_int, 0.0),
            epi_mem=epi_mem,
            epi_cnt=epi_cnt,
            ucb_count=ucb_count,
            ucb_reward=ucb_reward,
            ext_c=ext_carry[0], ext_h=ext_carry[1],
            int_c=int_carry[0], int_h=int_carry[1],
        )
        return action, new_actor

    # ------------------------------------------------------------------
    def observe_chunk(self, state: A57FullState, transitions, mask, sv: StepView) -> A57FullState:
        snap = sv.actor_snapshot
        r_int_next = jnp.concatenate([snap["r_int_cur"][1:], snap["r_int_cur"][-1:]], 0)

        def tm(x):
            return jnp.moveaxis(x, 0, 1)

        items = A57Seq(
            obs=tm(sv.obs),
            action=tm(sv.action),
            reward_ext=tm(sv.reward),
            reward_int=tm(r_int_next),
            terminated=tm(sv.terminated.astype(jnp.float32)),
            episode_start=tm(sv.episode_start),
            invalid_mask=tm(sv.invalid_mask),
            prev_a=tm(snap["prev_action"]),
            prev_r_ext=tm(snap["prev_r_ext"]),
            prev_r_int=tm(snap["prev_r_int"]),
            actor_idx=tm(snap["actor_idx"]),
            init_ext_c=snap["ext_c"][0],
            init_ext_h=snap["ext_h"][0],
            init_int_c=snap["int_c"][0],
            init_int_h=snap["int_h"][0],
        )
        return state.replace(memory=self._replay.add(state.memory, items))

    # ------------------------------------------------------------------
    def _unroll_q(self, q_params, carry, seq: A57Seq, sl):
        """Scan a UVFA-LSTM over seq steps ``sl`` (slice), resetting at episode
        starts. Returns q values [bs, L, A]."""

        def step(carry, x):
            obs, es, pa, pre, pri, arm = x
            m = es[:, None].astype(jnp.float32)
            carry = (carry[0] * (1 - m), carry[1] * (1 - m))
            uvfa = self._uvfa(obs, pre, pri, pa, arm)
            carry, q = self.q_net.apply(q_params, carry, *uvfa)
            return carry, q

        xs = (
            jnp.moveaxis(jnp.asarray(seq.obs[:, sl], jnp.float32), 0, 1),
            jnp.moveaxis(seq.episode_start[:, sl], 0, 1),
            jnp.moveaxis(seq.prev_a[:, sl], 0, 1),
            jnp.moveaxis(seq.prev_r_ext[:, sl], 0, 1),
            jnp.moveaxis(seq.prev_r_int[:, sl], 0, 1),
            jnp.moveaxis(seq.actor_idx[:, sl], 0, 1),
        )
        carry, qs = jax.lax.scan(step, carry, xs)
        return carry, jnp.moveaxis(qs, 0, 1)

    def _q_loss(self, q_params, q_target_params, seq: A57Seq, rewards, discount_b):
        bs = seq.action.shape[0]
        carry0 = (seq.init_ext_c, seq.init_ext_h) if q_params is not None else None
        # burn-in (no grad) then training segment
        burn = slice(0, self.burnin)
        train_sl = slice(self.burnin, self.burnin + self.sequence_length)
        if self.burnin > 0:
            c_on, _ = self._unroll_q(q_params, carry0, seq, burn)
            c_on = jax.lax.stop_gradient(c_on)
            c_tg, _ = self._unroll_q(q_target_params, carry0, seq, burn)
        else:
            c_on = carry0
            c_tg = carry0
        _, q_on = self._unroll_q(q_params, c_on, seq, train_sl)
        _, q_tg = self._unroll_q(q_target_params, c_tg, seq, train_sl)

        act = seq.action[:, train_sl]
        rew = rewards[:, train_sl]
        term = seq.terminated[:, train_sl]
        inv = seq.invalid_mask[:, train_sl]
        es = seq.episode_start[:, train_sl]

        neg = jnp.finfo(jnp.float32).min
        nq_on = jnp.where(inv[:, 1:], neg, q_on[:, 1:])
        if self.enable_double_dqn:
            n_act = jnp.argmax(nq_on, -1)
            maxq = jnp.take_along_axis(q_tg[:, 1:], n_act[..., None], -1)[..., 0]
        else:
            maxq = jnp.max(jnp.where(inv[:, 1:], neg, q_tg[:, 1:]), -1)
        if self.enable_rescale:
            maxq = funcs.inverse_rescaling(maxq)
        undone = 1.0 - term[:, :-1]
        target = rew[:, :-1] + undone * discount_b[:, None] * maxq
        if self.enable_rescale:
            target = funcs.rescaling(target)
        target = jax.lax.stop_gradient(target)
        q_sel = jnp.take_along_axis(q_on[:, :-1], act[:, :-1, None], -1)[..., 0]
        valid = 1.0 - es[:, 1:].astype(jnp.float32)
        td = (target - q_sel) * valid
        # reference: q_criterion = HuberLoss (agent57/model_torch.py:258,487)
        return jnp.sum(funcs.huber(td)) / jnp.maximum(jnp.sum(valid), 1.0)

    def train(self, state: A57FullState, key: Array, num_steps: int) -> Tuple[A57FullState, Dict[str, Array]]:
        def one_update(st: A57FullState, k):
            seq, _ = self._replay.sample_with_indices(st.memory, k, self.batch_size)
            discount_b = self._gamma_list[seq.actor_idx[:, self.burnin]]

            def loss_fn(params):
                # carries for the int net come from its own stored init
                seq_int = seq.replace(init_ext_c=seq.init_int_c, init_ext_h=seq.init_int_h)
                l_ext = self._q_loss(
                    params["q_ext"], st.target_params["q_ext"], seq, seq.reward_ext, discount_b
                )
                l_int = self._q_loss(
                    params["q_int"], st.target_params["q_int"], seq_int, seq.reward_int, discount_b
                )
                # embedding inverse dynamics + RND on flattened steps
                T = self.required_chunk_steps
                obs_f = jnp.asarray(seq.obs, jnp.float32).reshape((-1,) + seq.obs.shape[2:])
                obs_n = jnp.asarray(
                    jnp.concatenate([seq.obs[:, 1:], seq.obs[:, -1:]], axis=1), jnp.float32
                ).reshape((-1,) + seq.obs.shape[2:])
                act_f = seq.action.reshape(-1)
                e1 = self.emb_net.apply(params["emb"], obs_f)
                e2 = self.emb_net.apply(params["emb"], obs_n)
                logits = self.emb_act.apply(params["emb_act"], e1, e2)
                l_emb = jnp.mean(
                    optax.softmax_cross_entropy_with_integer_labels(logits, act_f)
                )
                tgt = jax.lax.stop_gradient(self.rnd_net.apply(st.params["rnd_target"], obs_f))
                prd = self.rnd_net.apply(params["rnd_pred"], obs_f)
                l_rnd = jnp.mean(jnp.square(tgt - prd))
                return l_ext + l_int + l_emb + l_rnd, l_ext

            (loss, l_ext), grads = jax.value_and_grad(loss_fn, has_aux=True)(st.params)
            grads["rnd_target"] = jax.tree.map(jnp.zeros_like, grads["rnd_target"])
            if self.pmean_axis is not None:
                grads = self.dp_pmean(grads)
            updates, opt_state = self._tx.update(grads, st.opt_state, st.params)
            new_params = optax.apply_updates(st.params, updates)
            ready = self._replay.is_warmup_over(st.memory)
            params = masked_update(ready, new_params, st.params)
            opt_state = masked_update(ready, opt_state, st.opt_state)
            train_count = st.train_count + ready.astype(jnp.int32)
            target_params = {
                "q_ext": periodic_target_sync(
                    st.target_params["q_ext"], params["q_ext"], train_count,
                    self.target_model_update_interval,
                ),
                "q_int": periodic_target_sync(
                    st.target_params["q_int"], params["q_int"], train_count,
                    self.target_model_update_interval,
                ),
            }
            return (
                st.replace(
                    params=params, target_params=target_params, opt_state=opt_state,
                    train_count=train_count,
                ),
                l_ext,
            )

        state, losses = jax.lax.scan(one_update, state, jax.random.split(key, num_steps))
        return state, {"loss_ext": jnp.mean(losses), "train_count": state.train_count.astype(jnp.float32)}

    def params_of(self, state: A57FullState):
        return {"params": state.params, "target_params": state.target_params}

    def restore_params(self, state: A57FullState, p) -> A57FullState:
        return state.replace(params=p["params"], target_params=p["target_params"])
