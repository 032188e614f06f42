"""PPO-V (parity: srl/algorithms/ppo_v/ — the author's OFF-policy PPO variant: a
replay buffer of (s, s', a, old_logp, r, undone, MC-return) samples; clipped-ratio
policy loss with 1-step advantage q - V(s), ratio-weighted huber value loss plus an
MC-return align term (torch_model.py:111-178); discrete head shown here, epsilon
mixing to a uniform behavior policy at collection time)."""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..define import RLBaseTypes
from ..models.blocks import InputBlockConfig, MLPBlock
from .base import AlgoConfig, StepView, Transition
from .common import masked_update, to_env_sequences
from .dqn import MemoryConfig

Array = jax.Array


class VPNet(nn.Module):
    num_actions: int
    obs_space: Any
    input_block: InputBlockConfig
    hidden: Tuple[int, ...]

    @nn.compact
    def __call__(self, x):
        h = self.input_block.create_block(self.obs_space)(jnp.asarray(x, jnp.float32))
        h = MLPBlock(self.hidden)(h)
        v = nn.Dense(1)(MLPBlock((64,))(h))[..., 0]
        logits = nn.Dense(self.num_actions)(h)
        return v, logits


@struct.dataclass
class PPOVActorState:
    logp: Array  # [B] log-prob of the chosen action (behavior policy)


@struct.dataclass
class PPOVState:
    params: Any
    opt_state: Any
    memory: Any
    train_count: Array


@struct.dataclass
class PPOVItem:
    obs: Any
    next_obs: Any
    action: Array
    old_logp: Array
    reward: Array
    undone: Array
    total_reward: Array


@dataclasses.dataclass
class PPOVConfig(AlgoConfig):
    epsilon: float = 0.1
    test_epsilon: float = 0.0
    batch_size: int = 64
    memory: MemoryConfig = dataclasses.field(default_factory=MemoryConfig)
    discount: float = 0.95
    clip_range: float = 0.1
    loss_align_coeff: float = 0.1
    entropy_weight: float = 0.0
    lr: float = 3e-4
    max_grad_norm: float = 0.5
    input_block: InputBlockConfig = dataclasses.field(default_factory=InputBlockConfig)
    hidden_sizes: Tuple[int, ...] = (64, 64)

    observation_type: RLBaseTypes = RLBaseTypes.BOX
    action_type: RLBaseTypes = RLBaseTypes.DISCRETE

    has_actor_state: bool = True
    needs_step_view: bool = True

    def get_name(self) -> str:
        return "PPO_V"

    def on_setup(self) -> None:
        self.A = self.action_space.n
        self._replay = self.memory.create()
        self.model = VPNet(self.A, self.obs_space, self.input_block, self.hidden_sizes)
        self._tx = optax.chain(
            optax.clip_by_global_norm(self.max_grad_norm), optax.adam(self.lr)
        )

    def _example_item(self) -> PPOVItem:
        return PPOVItem(
            obs=self.obs_space.zero(),
            next_obs=self.obs_space.zero(),
            action=jnp.asarray(0, jnp.int32),
            old_logp=jnp.asarray(0.0),
            reward=jnp.asarray(0.0),
            undone=jnp.asarray(1.0),
            total_reward=jnp.asarray(0.0),
        )

    def init(self, key: Array) -> PPOVState:
        params = self.model.init(key, self.obs_space.zero()[None])
        return PPOVState(
            params=params,
            opt_state=self._tx.init(params),
            memory=self._replay.init(self._example_item()),
            train_count=jnp.asarray(0, jnp.int32),
        )

    def init_actor_state(self, key, num_envs) -> PPOVActorState:
        return PPOVActorState(logp=jnp.zeros((num_envs,)))

    def actor_snapshot(self, actor: PPOVActorState):
        return {"logp": actor.logp}

    def policy_step(self, state: PPOVState, actor, obs, invalid_mask, ctx, key, episode_start):
        B = invalid_mask.shape[0]
        k1, k2, k3 = jax.random.split(key, 3)
        _, logits = self.model.apply(state.params, obs)
        logits = jnp.where(invalid_mask, -jnp.inf, logits)
        lp = jax.nn.log_softmax(logits, -1)
        a_pi = jax.random.categorical(k1, logits, -1).astype(jnp.int32)
        # epsilon mixing to uniform behavior (torch_model.py:193-199)
        rand_logits = jnp.where(  # width = ENCODED action space, mask broadcasts up
            invalid_mask, -jnp.inf, jnp.zeros((invalid_mask.shape[0], self.num_actions))
        )
        a_rand = jax.random.categorical(k2, rand_logits, -1).astype(jnp.int32)
        n_valid = jnp.sum(
            jnp.broadcast_to(jnp.logical_not(invalid_mask), rand_logits.shape), -1
        ).astype(jnp.float32)
        explore = jax.random.uniform(k3, (B,)) < self.epsilon
        eps = jnp.where(ctx.training, self.epsilon, self.test_epsilon)
        explore = jnp.logical_and(explore, ctx.training)
        action = jnp.where(explore, a_rand, a_pi)
        logp_pi = jnp.take_along_axis(lp, action[:, None], -1)[:, 0]
        logp = jnp.where(explore, -jnp.log(jnp.maximum(n_valid, 1.0)), logp_pi)
        greedy = jnp.argmax(logits, -1).astype(jnp.int32)
        action = jnp.where(ctx.training, action, greedy)
        return action, PPOVActorState(logp=jnp.maximum(logp, jnp.log(1e-6)))

    def observe_chunk(self, state: PPOVState, transitions, mask, sv: StepView) -> PPOVState:
        num_envs = mask.shape[1] // (1 + self.env.player_num)
        seq, valid, is_final = to_env_sequences(transitions, mask, num_envs)
        B, L = valid.shape
        chain = seq.undone * (1.0 - is_final.astype(jnp.float32))

        def back(carry, x):
            r, u, v = x
            ret = jnp.where(v, r + self.discount * u * carry, carry)
            return ret, ret

        _, rets = jax.lax.scan(
            back, jnp.zeros((B,)), (seq.reward.T[::-1], chain.T[::-1], valid.T[::-1])
        )
        total_reward = rets[::-1].T

        def fwd(carry, f):
            seen = jnp.logical_or(carry, f)
            return seen, seen

        _, completed = jax.lax.scan(fwd, jnp.zeros((B,), bool), is_final.T[::-1])
        completed = completed[::-1].T

        # old_logp: the snapshot at the step when the pending action was chosen — the
        # T1 transition completed at scan step t was ACTED at step t-1; its logp is
        # snapshot[t-1]. Reconstruct via the same slot grid layout.
        T = sv.reward.shape[0]
        logp_prev = jnp.concatenate(
            [jnp.zeros_like(sv.actor_snapshot["logp"][:1]), sv.actor_snapshot["logp"][:-1]],
            axis=0,
        )  # [T, B] behavior logp of the T1 transition landing at step t
        # T2 transitions at step t were acted AT step t: logp = snapshot[t]
        S = 1 + self.env.player_num
        slot_logps = jnp.stack(
            [logp_prev] + [sv.actor_snapshot["logp"]] * (S - 1), axis=2
        )  # [T, B, S]
        # reshape the grid the same way as to_env_sequences
        y = slot_logps.reshape((T, num_envs, S))
        old_logp = jnp.moveaxis(y, 0, 1).reshape((num_envs, T * S))

        item = PPOVItem(
            obs=seq.obs,
            next_obs=seq.next_obs,
            action=seq.action,
            old_logp=old_logp,
            reward=seq.reward,
            undone=seq.undone,
            total_reward=total_reward,
        )
        flat = jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), item)
        m = (valid & completed).reshape(-1)
        return state.replace(memory=self._replay.add_masked(state.memory, flat, m))

    def train(self, state: PPOVState, key: Array, num_steps: int) -> Tuple[PPOVState, Dict[str, Array]]:
        def one_update(st: PPOVState, k):
            item, _ = self._replay.sample_with_indices(st.memory, k, self.batch_size)

            def loss_fn(params):
                v, logits = self.model.apply(params, item.obs)
                n_v, _ = self.model.apply(params, item.next_obs)
                n_v = jax.lax.stop_gradient(n_v)
                lp = jax.nn.log_softmax(logits, -1)
                new_logp = jnp.take_along_axis(lp, item.action[:, None], -1)[:, 0]
                ratio = jnp.exp(new_logp - item.old_logp)

                q = item.reward + item.undone * self.discount * n_v
                adv = jax.lax.stop_gradient(q - v)
                r_det = jax.lax.stop_gradient(ratio)
                l_value = jnp.mean(optax.huber_loss(v, r_det * q))
                l_align = jnp.mean(jnp.square(v - r_det * item.total_reward))
                clipped = jnp.clip(ratio, 1 - self.clip_range, 1 + self.clip_range)
                l_policy = -jnp.mean(jnp.minimum(ratio * adv, clipped * adv))
                loss = l_value + self.loss_align_coeff * l_align + l_policy
                if self.entropy_weight > 0:
                    ent = -jnp.sum(jnp.exp(lp) * lp, -1)
                    loss = loss - self.entropy_weight * jnp.mean(ent)
                return loss

            loss, grads = jax.value_and_grad(loss_fn)(st.params)
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

    def params_of(self, state: PPOVState):
        return state.params

    def restore_params(self, state: PPOVState, p) -> PPOVState:
        return state.replace(params=p)
