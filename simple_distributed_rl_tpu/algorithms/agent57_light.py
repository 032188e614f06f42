"""Agent57-light (parity: srl/algorithms/agent57_light/ — DQN + NGU intrinsic rewards
(episodic kNN novelty x RND lifelong) + UVFA conditioning (prev action/rewards + actor
one-hot) + split ext/int Q networks + sliding-window-UCB meta-controller over the
(beta, epsilon, discount) actor ladder; "light" = Agent57 minus LSTM/multistep).

TPU re-design:
  - every vectorized env slot IS an actor: its UCB bandit, (beta, eps, gamma) arm,
    episodic memory ring and UVFA carry live in the engine-threaded actor state —
    thousands of meta-controlled actors in lockstep (the reference runs actor_num
    processes; agent57_light.py:280-353);
  - the per-step kNN episodic bonus (agent57_light.py:473-512) is a batched top-k over
    a fixed per-env embedding ring — one [B, cap] distance matmul per step;
  - intrinsic rewards are computed DURING rollout (actor side, like the reference) and
    stored with the transitions via the step-view path;
  - UCB uses cumulative per-env statistics (the reference's 3600-episode sliding
    window is approximated by lifetime counts + ucb_epsilon exploration).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from flax import struct

from ..define import RLBaseTypes
from ..memories.demo_mixed import DemoMixedReplayBuffer
from ..memories.priority_buffer import PriorityReplayBuffer
from ..models.blocks import DuelingHead, InputBlockConfig, MLPBlock
from ..utils import rl_functions as funcs
from .base import AlgoConfig, PolicyContext, StepView, Transition
from .common import masked_update, periodic_target_sync
from .dqn import MemoryConfig
import optax

Array = jax.Array


class UVFAQNet(nn.Module):
    num_actions: int
    num_actors: int
    obs_space: Any
    input_block: InputBlockConfig
    hidden: Tuple[int, ...]
    dueling: bool = True
    # UVFA input toggles (parity: the reference config's input_ext_reward /
    # input_int_reward / input_action — its own Pendulum long test DISABLES all
    # three, base_agent57_light.py:33-46; un-normalized reward inputs measurably
    # slow early learning)
    input_ext_reward: bool = True
    input_int_reward: bool = True
    input_action: bool = True

    @nn.compact
    def __call__(self, obs, prev_r_ext, prev_r_int, prev_a_onehot, actor_onehot):
        x = self.input_block.create_block(self.obs_space)(jnp.asarray(obs, jnp.float32))
        feats = [x]
        if self.input_ext_reward:
            feats.append(prev_r_ext)
        if self.input_int_reward:
            feats.append(prev_r_int)
        if self.input_action:
            feats.append(prev_a_onehot)
        feats.append(actor_onehot)
        x = jnp.concatenate(feats, axis=-1)
        x = MLPBlock(self.hidden)(x)
        if self.dueling:
            return DuelingHead(self.num_actions)(x)
        return nn.Dense(self.num_actions)(x)


class EmbedNet(nn.Module):
    obs_space: Any
    input_block: InputBlockConfig
    emb_dim: int = 32

    @nn.compact
    def __call__(self, obs):
        x = self.input_block.create_block(self.obs_space)(jnp.asarray(obs, jnp.float32))
        x = MLPBlock((64,))(x)
        return nn.Dense(self.emb_dim)(x)


class EmbActionHead(nn.Module):
    """Inverse-dynamics head: predict the action from (emb(s), emb(s'))."""

    num_actions: int

    @nn.compact
    def __call__(self, e1, e2):
        x = jnp.concatenate([e1, e2], axis=-1)
        x = MLPBlock((64,))(x)
        return nn.Dense(self.num_actions)(x)


class RNDNet(nn.Module):
    obs_space: Any
    input_block: InputBlockConfig
    out_dim: int = 64

    @nn.compact
    def __call__(self, obs):
        x = self.input_block.create_block(self.obs_space)(jnp.asarray(obs, jnp.float32))
        x = MLPBlock((128,))(x)
        return nn.Dense(self.out_dim)(x)


@struct.dataclass
class A57ActorState:
    actor_idx: Array  # [B] i32 current arm
    prev_action: Array  # [B] i32
    prev_r_ext: Array  # [B]
    prev_r_int: Array  # [B]
    r_int_cur: Array  # [B] intrinsic reward of the CURRENT obs (computed this call)
    epi_mem: Array  # [B, cap, emb]
    epi_cnt: Array  # [B] i32
    ucb_count: Array  # [B, N]
    ucb_reward: Array  # [B, N]
    ep_reward: Array  # [B] running ext reward of the current episode


@struct.dataclass
class A57State:
    params: Any  # dict of network params
    target_params: Any  # dict: q_ext, q_int
    opt_state: Any
    memory: Any
    train_count: Array


@struct.dataclass
class A57Item:
    """Replay item: transition + UVFA conditioning + intrinsic reward + arm."""

    t: Transition
    r_int: Array
    prev_a: Array  # i32 (UVFA input at s)
    prev_r_ext: Array
    prev_r_int: Array
    next_prev_a: Array  # UVFA input at s' (= action at s)
    next_prev_r_ext: Array
    next_prev_r_int: Array
    actor_idx: Array  # i32


@dataclasses.dataclass
class Agent57LightConfig(AlgoConfig):
    test_epsilon: float = 0.0
    test_beta: float = 0.0
    batch_size: int = 32
    memory: MemoryConfig = dataclasses.field(
        default_factory=lambda: MemoryConfig(kind="proportional")
    )
    lr_ext: float = 1e-4
    lr_int: float = 1e-4
    target_model_update_interval: int = 500
    enable_double_dqn: bool = True
    enable_rescale: bool = False
    enable_intrinsic_reward: bool = True
    actor_num: int = 16
    ucb_epsilon: float = 0.5
    ucb_beta: float = 1.0
    episodic_memory_capacity: int = 300
    episodic_count_max: int = 10  # k for kNN
    episodic_epsilon: float = 1e-3
    episodic_cluster_distance: float = 8e-3
    episodic_pseudo_counts: float = 0.1
    lifelong_max: float = 5.0
    emb_dim: int = 32
    #: UVFA input toggles (parity: agent57_light config input_ext_reward /
    #: input_int_reward / input_action)
    input_ext_reward: bool = True
    input_int_reward: bool = True
    input_action: bool = True
    input_block: InputBlockConfig = dataclasses.field(default_factory=InputBlockConfig)
    hidden_sizes: Tuple[int, ...] = (64, 64)

    observation_type: RLBaseTypes = RLBaseTypes.BOX
    action_type: RLBaseTypes = RLBaseTypes.DISCRETE

    has_actor_state: bool = True
    needs_step_view: bool = True

    def get_name(self) -> str:
        return "Agent57_light"

    def on_setup(self) -> None:
        self._replay = self.memory.create()
        self._is_per = isinstance(self._replay, PriorityReplayBuffer) or (
            isinstance(self._replay, DemoMixedReplayBuffer)
        )
        A, N = self.action_space.n, self.actor_num
        self.q_net = UVFAQNet(
            A, N, self.obs_space, self.input_block, self.hidden_sizes,
            input_ext_reward=self.input_ext_reward,
            input_int_reward=self.input_int_reward,
            input_action=self.input_action,
        )
        self.emb_net = EmbedNet(self.obs_space, self.input_block, self.emb_dim)
        self.emb_act = EmbActionHead(A)
        self.rnd_net = RNDNet(self.obs_space, self.input_block)
        self._beta_list = jnp.asarray(funcs.agent57_beta_list(N))
        self._eps_list = jnp.asarray(funcs.agent57_epsilon_list(N))
        self._gamma_list = jnp.asarray(funcs.agent57_gamma_list(N))
        self._tx_ext = optax.adam(self.lr_ext)
        self._tx_int = optax.adam(self.lr_int)

    # ------------------------------------------------------------------
    def _example_item(self) -> A57Item:
        A = self.num_actions
        return A57Item(
            t=Transition(
                obs=self.obs_space.zero(),
                action=jnp.asarray(0, jnp.int32),
                reward=jnp.asarray(0.0),
                next_obs=self.obs_space.zero(),
                undone=jnp.asarray(1.0),
                invalid_mask=jnp.zeros((A,), bool),
                next_invalid_mask=jnp.zeros((A,), bool),
            ),
            r_int=jnp.asarray(0.0),
            prev_a=jnp.asarray(0, jnp.int32),
            prev_r_ext=jnp.asarray(0.0),
            prev_r_int=jnp.asarray(0.0),
            next_prev_a=jnp.asarray(0, jnp.int32),
            next_prev_r_ext=jnp.asarray(0.0),
            next_prev_r_int=jnp.asarray(0.0),
            actor_idx=jnp.asarray(0, jnp.int32),
        )

    def init(self, key: Array) -> A57State:
        ks = jax.random.split(key, 6)
        obs0 = self.obs_space.zero()[None]
        A, N = self.action_space.n, self.actor_num
        uvfa_args = (
            obs0,
            jnp.zeros((1, 1)),
            jnp.zeros((1, 1)),
            jnp.zeros((1, A)),
            jnp.zeros((1, N)),
        )
        params = {
            "q_ext": self.q_net.init(ks[0], *uvfa_args),
            "q_int": self.q_net.init(ks[1], *uvfa_args),
            "emb": self.emb_net.init(ks[2], obs0),
            "emb_act": self.emb_act.init(
                ks[3], jnp.zeros((1, self.emb_dim)), jnp.zeros((1, self.emb_dim))
            ),
            "rnd_pred": self.rnd_net.init(ks[4], obs0),
            "rnd_target": self.rnd_net.init(ks[5], obs0),
        }
        opt_state = {
            "ext": self._tx_ext.init(params["q_ext"]),
            "int": self._tx_int.init(
                {"q_int": params["q_int"], "emb": params["emb"],
                 "emb_act": params["emb_act"], "rnd_pred": params["rnd_pred"]}
            ),
        }
        return A57State(
            params=params,
            target_params={
                "q_ext": jax.tree.map(jnp.copy, params["q_ext"]),
                "q_int": jax.tree.map(jnp.copy, params["q_int"]),
            },
            opt_state=opt_state,
            memory=self._replay.init(self._example_item()),
            train_count=jnp.asarray(0, jnp.int32),
        )

    def init_actor_state(self, key: Array, num_envs: int) -> A57ActorState:
        B, N = num_envs, self.actor_num
        return A57ActorState(
            actor_idx=jnp.arange(B, dtype=jnp.int32) % N,
            prev_action=jnp.zeros((B,), jnp.int32),
            prev_r_ext=jnp.zeros((B,)),
            prev_r_int=jnp.zeros((B,)),
            r_int_cur=jnp.zeros((B,)),
            epi_mem=jnp.zeros((B, self.episodic_memory_capacity, self.emb_dim)),
            epi_cnt=jnp.zeros((B,), jnp.int32),
            ucb_count=jnp.ones((B, N)),
            ucb_reward=jnp.zeros((B, N)),
            ep_reward=jnp.zeros((B,)),
        )

    def actor_snapshot(self, actor: A57ActorState):
        return {
            "actor_idx": actor.actor_idx,
            "prev_action": actor.prev_action,
            "prev_r_ext": actor.prev_r_ext,
            "prev_r_int": actor.prev_r_int,
            "r_int_cur": actor.r_int_cur,
        }

    # ------------------------------------------------------------------
    def _episodic_reward(self, emb, mem, cnt):
        """Batched kNN pseudo-count bonus (agent57_light.py:473-512)."""
        cap = self.episodic_memory_capacity
        d2 = jnp.sum(jnp.square(mem - emb[:, None, :]), axis=-1)  # [B, cap]
        live = jnp.arange(cap)[None, :] < cnt[:, None]
        d2 = jnp.where(live, d2, jnp.inf)
        k = self.episodic_count_max
        topk = -jax.lax.top_k(-d2, k)[0]  # k smallest distances [B, k]
        finite = jnp.isfinite(topk)
        nk = jnp.maximum(finite.sum(-1), 1)
        topk = jnp.where(finite, topk, 0.0)
        mean = jnp.sum(topk, -1) / nk
        dn = topk / jnp.maximum(mean[:, None], 1e-10)
        dn = jnp.where(finite, jnp.maximum(dn - self.episodic_cluster_distance, 0.0), jnp.inf)
        kernel = jnp.where(
            jnp.isfinite(dn), self.episodic_epsilon / (dn + self.episodic_epsilon), 0.0
        )
        count = jnp.sum(kernel, -1)
        r = 1.0 / (jnp.sqrt(count) + self.episodic_pseudo_counts)
        # first entry of a fresh memory gets the max bonus (reference: 1/c)
        return jnp.where(cnt == 0, 1.0 / self.episodic_pseudo_counts, r)

    def _lifelong_reward(self, params, obs):
        tgt = self.rnd_net.apply(params["rnd_target"], obs)
        prd = self.rnd_net.apply(params["rnd_pred"], obs)
        err = jnp.mean(jnp.square(tgt - prd), axis=-1)
        return jnp.clip(1.0 + err, 1.0, self.lifelong_max)

    def policy_step(self, state: A57State, actor: A57ActorState, obs, invalid_mask, ctx, key, episode_start):
        B = invalid_mask.shape[0]
        A, N = self.action_space.n, self.actor_num
        params = state.params
        prev_r = ctx.prev_rewards[:, 0]  # player 0's reward from the last step

        # --- episode bookkeeping + UCB arm selection at episode starts ---------
        ep_reward = actor.ep_reward + prev_r
        # finalize finished episode into the bandit, then pick a new arm
        idx = jnp.arange(B)
        ucb_count = actor.ucb_count.at[idx, actor.actor_idx].add(
            jnp.where(episode_start, 1.0, 0.0)
        )
        ucb_reward = actor.ucb_reward.at[idx, actor.actor_idx].add(
            jnp.where(episode_start, ep_reward, 0.0)
        )
        k_ucb, k_explore, key = jax.random.split(key, 3)
        total = ucb_count.sum(-1, keepdims=True)
        mean_r = ucb_reward / ucb_count
        ucb = mean_r + self.ucb_beta * jnp.sqrt(jnp.log(jnp.maximum(total, 1.0)) / ucb_count)
        best = funcs.random_max_index(ucb, jnp.zeros((B, N), bool), k_ucb)
        rand_arm = jax.random.randint(k_explore, (B,), 0, N)
        explore = jax.random.uniform(key, (B,)) < self.ucb_epsilon
        new_arm = jnp.where(explore, rand_arm, best)
        actor_idx = jnp.where(episode_start, new_arm, actor.actor_idx)
        actor_idx = jnp.where(ctx.training, actor_idx, jnp.zeros_like(actor_idx))
        ep_reward = jnp.where(episode_start, 0.0, ep_reward)

        # --- reset per-episode carries ----------------------------------------
        prev_action = jnp.where(episode_start, 0, actor.prev_action)
        prev_r_ext = jnp.where(episode_start, 0.0, prev_r)
        epi_cnt = jnp.where(episode_start, 0, actor.epi_cnt)

        # --- intrinsic reward of the current obs ------------------------------
        emb = self.emb_net.apply(params["emb"], obs)  # [B, emb]
        r_epi = self._episodic_reward(emb, actor.epi_mem, epi_cnt)
        r_life = self._lifelong_reward(params, obs)
        r_int = r_epi * r_life
        # insert emb into the episodic ring
        slot = epi_cnt % self.episodic_memory_capacity
        epi_mem = actor.epi_mem.at[idx, slot].set(emb)
        epi_cnt = jnp.minimum(epi_cnt + 1, jnp.asarray(2**30, jnp.int32))
        prev_r_int = jnp.where(episode_start, 0.0, actor.r_int_cur)

        # --- UVFA Q and action -------------------------------------------------
        beta = jnp.where(ctx.training, self._beta_list[actor_idx], self.test_beta)
        eps = jnp.where(ctx.training, self._eps_list[actor_idx], self.test_epsilon)
        uvfa = (
            obs,
            prev_r_ext[:, None],
            prev_r_int[:, None],
            jax.nn.one_hot(prev_action, A),
            jax.nn.one_hot(actor_idx, N),
        )
        q_ext = self.q_net.apply(params["q_ext"], *uvfa)
        q_int = self.q_net.apply(params["q_int"], *uvfa)
        q = q_ext + beta[:, None] * q_int
        key, k_act = jax.random.split(key)
        action = funcs.epsilon_greedy(q, invalid_mask, eps, k_act)

        new_actor = A57ActorState(
            actor_idx=actor_idx,
            prev_action=action,
            prev_r_ext=prev_r_ext,
            prev_r_int=prev_r_int,
            r_int_cur=jnp.where(ctx.training, r_int, 0.0),
            epi_mem=epi_mem,
            epi_cnt=epi_cnt,
            ucb_count=ucb_count,
            ucb_reward=ucb_reward,
            ep_reward=ep_reward,
        )
        return action, new_actor

    # ------------------------------------------------------------------
    def observe_chunk(self, state: A57State, transitions, mask, sv: StepView) -> A57State:
        T = sv.reward.shape[0]
        snap = sv.actor_snapshot
        # transition for step t: (obs[t], a[t], r[t], obs[t+1]); intrinsic reward of
        # the resulting state = r_int_cur computed at call t+1
        sl = slice(0, T - 1)
        done = jnp.logical_or(sv.terminated, sv.truncated)
        was_reset_next = jnp.concatenate(
            [jnp.zeros_like(done[:1]), done[:-1]], axis=0
        )  # [T, B]: step t is a reset step if t-1 was done
        valid = jnp.logical_not(was_reset_next[sl])  # exclude reset steps
        # t=0 of a chunk: cannot know if it is a reset step of the previous chunk tail
        valid = valid.at[0].set(False)

        item = A57Item(
            t=Transition(
                obs=sv.obs[sl],
                action=sv.action[sl],
                reward=sv.reward[sl],
                next_obs=sv.obs[1:],
                undone=1.0 - sv.terminated[sl].astype(jnp.float32),
                invalid_mask=sv.invalid_mask[sl],
                next_invalid_mask=sv.invalid_mask[1:],
            ),
            r_int=snap["r_int_cur"][1:],
            prev_a=snap["prev_action"][sl],
            prev_r_ext=snap["prev_r_ext"][sl],
            prev_r_int=snap["prev_r_int"][sl],
            next_prev_a=sv.action[sl],
            next_prev_r_ext=sv.reward[sl],
            next_prev_r_int=snap["r_int_cur"][1:],
            actor_idx=snap["actor_idx"][sl],
        )
        flat = jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), item)
        return state.replace(
            memory=self._replay.add_masked(state.memory, flat, valid.reshape(-1))
        )

    # ------------------------------------------------------------------
    def _uvfa_inputs(self, obs, r_ext, r_int, a, arm):
        A, N = self.action_space.n, self.actor_num
        return (
            obs,
            r_ext[:, None],
            r_int[:, None],
            jax.nn.one_hot(a, A),
            jax.nn.one_hot(arm, N),
        )

    def _q_target(self, q_params, q_target_params, item: A57Item, rewards, discount):
        n_in = self._uvfa_inputs(
            item.t.next_obs, item.next_prev_r_ext, item.next_prev_r_int,
            item.next_prev_a, item.actor_idx,
        )
        n_q_t = self.q_net.apply(q_target_params, *n_in)
        neg = jnp.finfo(jnp.float32).min
        if self.enable_double_dqn:
            n_q = self.q_net.apply(q_params, *n_in)
            n_q = jnp.where(item.t.next_invalid_mask, neg, n_q)
            n_act = jnp.argmax(n_q, -1)
            maxq = jnp.take_along_axis(n_q_t, n_act[:, None], -1)[:, 0]
        else:
            maxq = jnp.max(jnp.where(item.t.next_invalid_mask, neg, n_q_t), -1)
        if self.enable_rescale:
            maxq = funcs.inverse_rescaling(maxq)
        target = rewards + item.t.undone * discount * maxq
        if self.enable_rescale:
            target = funcs.rescaling(target)
        return jax.lax.stop_gradient(target)

    def train(self, state: A57State, key: Array, num_steps: int) -> Tuple[A57State, Dict[str, Array]]:
        A = self.action_space.n

        def one_update(st: A57State, k):
            if self._is_per:
                item, weights, indices = self._replay.sample(
                    st.memory, k, self.batch_size, st.train_count
                )
            else:
                item, indices = self._replay.sample_with_indices(st.memory, k, self.batch_size)
                weights = jnp.ones((self.batch_size,), jnp.float32)
            discount = self._gamma_list[item.actor_idx]
            in_s = self._uvfa_inputs(
                item.t.obs, item.prev_r_ext, item.prev_r_int, item.prev_a, item.actor_idx
            )

            # --- extrinsic Q
            tgt_ext = self._q_target(
                st.params["q_ext"], st.target_params["q_ext"], item, item.t.reward, discount
            )

            def ext_loss(qp):
                q = self.q_net.apply(qp, *in_s)
                qa = jnp.take_along_axis(q, item.t.action[:, None], -1)[:, 0]
                td = tgt_ext - qa
                # reference: q_criterion(target*w, q*w) with HuberLoss
                # (agent57_light/model_torch.py:248,437)
                return jnp.mean(funcs.huber(weights * td)), td

            (g_ext, td_ext) = jax.grad(ext_loss, has_aux=True)(st.params["q_ext"])

            # --- intrinsic Q + embedding (inverse dynamics) + RND predictor
            tgt_int = self._q_target(
                st.params["q_int"], st.target_params["q_int"], item, item.r_int, discount
            )
            rnd_target_params = st.params["rnd_target"]

            def int_loss(p):
                q = self.q_net.apply(p["q_int"], *in_s)
                qa = jnp.take_along_axis(q, item.t.action[:, None], -1)[:, 0]
                td = tgt_int - qa
                l_q = jnp.mean(funcs.huber(weights * td))
                e1 = self.emb_net.apply(p["emb"], item.t.obs)
                e2 = self.emb_net.apply(p["emb"], item.t.next_obs)
                logits = self.emb_act.apply(p["emb_act"], e1, e2)
                l_emb = jnp.mean(
                    optax.softmax_cross_entropy_with_integer_labels(logits, item.t.action)
                )
                tgt = jax.lax.stop_gradient(
                    self.rnd_net.apply(rnd_target_params, item.t.obs)
                )
                prd = self.rnd_net.apply(p["rnd_pred"], item.t.obs)
                l_rnd = jnp.mean(jnp.square(tgt - prd))
                return l_q + l_emb + l_rnd, td

            int_params = {
                "q_int": st.params["q_int"],
                "emb": st.params["emb"],
                "emb_act": st.params["emb_act"],
                "rnd_pred": st.params["rnd_pred"],
            }
            (g_int, td_int) = jax.grad(int_loss, has_aux=True)(int_params)

            if self.pmean_axis is not None:
                g_ext, g_int = self.dp_pmean((g_ext, g_int))

            up_ext, opt_ext = self._tx_ext.update(g_ext, st.opt_state["ext"], st.params["q_ext"])
            new_q_ext = optax.apply_updates(st.params["q_ext"], up_ext)
            up_int, opt_int = self._tx_int.update(g_int, st.opt_state["int"], int_params)
            new_int = optax.apply_updates(int_params, up_int)

            ready = self._replay.is_warmup_over(st.memory)
            params = dict(st.params)
            params["q_ext"] = masked_update(ready, new_q_ext, st.params["q_ext"])
            for k2 in ("q_int", "emb", "emb_act", "rnd_pred"):
                params[k2] = masked_update(ready, new_int[k2], st.params[k2])
            opt_state = {
                "ext": masked_update(ready, opt_ext, st.opt_state["ext"]),
                "int": masked_update(ready, opt_int, st.opt_state["int"]),
            }
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
            memory = st.memory
            if self._is_per:
                beta_b = self._beta_list[item.actor_idx]
                prio = jnp.abs(td_ext + beta_b * td_int)
                memory = self._replay.update(memory, indices, prio, enable=ready)
            new_st = A57State(
                params=params,
                target_params=target_params,
                opt_state=opt_state,
                memory=memory,
                train_count=train_count,
            )
            return new_st, jnp.mean(jnp.square(td_ext))

        state, losses = jax.lax.scan(one_update, state, jax.random.split(key, num_steps))
        return state, {
            "loss_ext": jnp.mean(losses),
            "train_count": state.train_count.astype(jnp.float32),
        }

    def params_of(self, state: A57State):
        return {"params": state.params, "target_params": state.target_params}

    def restore_params(self, state: A57State, p) -> A57State:
        return state.replace(params=p["params"], target_params=p["target_params"])
