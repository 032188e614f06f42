"""SND — self-supervised network distillation exploration (parity:
srl/algorithms/snd/ — SND-V variant: DQN whose reward is shaped with a distillation
bonus ||target(s) - predictor(s)||^2, where the TARGET network is itself trained
contrastively on noised state pairs (tau=0 for same-state pairs, tau=1 for different),
snd.py:160-235; intrinsic reward added at experience time, snd.py:261-276).
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
from ..models.blocks import InputBlockConfig, MLPBlock, QNetwork
from ..utils import rl_functions as funcs
from ..utils.schedulers import SchedulerConfig
from .base import AlgoConfig, PolicyContext, Transition
from .common import masked_update, periodic_target_sync
from .dqn import MemoryConfig

Array = jax.Array


class SNDNet(nn.Module):
    obs_space: Any
    input_block: InputBlockConfig
    out_dim: int = 64

    @nn.compact
    def __call__(self, obs):
        x = self.input_block.create_block(self.obs_space)(jnp.asarray(obs, jnp.float32))
        x = MLPBlock((128,))(x)
        return nn.Dense(self.out_dim)(x)


@struct.dataclass
class SNDState:
    params: Any  # {q, snd_target, snd_pred}
    q_target_params: Any
    opt_state: Any  # {q, tgt, pred}
    memory: Any
    train_count: Array


@dataclasses.dataclass
class SNDConfig(AlgoConfig):
    test_epsilon: float = 0.0
    epsilon: float = 0.001
    epsilon_scheduler: SchedulerConfig = dataclasses.field(default_factory=SchedulerConfig)
    lr: float = 0.001
    batch_size: int = 32
    memory: MemoryConfig = dataclasses.field(default_factory=MemoryConfig)
    discount: float = 0.99
    target_model_update_interval: int = 1000
    int_reward_scale: float = 0.5
    input_block: InputBlockConfig = dataclasses.field(default_factory=InputBlockConfig)
    hidden_sizes: Tuple[int, ...] = (64, 64)

    observation_type: RLBaseTypes = RLBaseTypes.BOX
    action_type: RLBaseTypes = RLBaseTypes.DISCRETE

    def get_name(self) -> str:
        return "SND"

    def on_setup(self) -> None:
        self._eps_sch = self.epsilon_scheduler.create(self.epsilon)
        self._replay = self.memory.create()
        self.q_net = QNetwork(
            num_actions=self.action_space.n,
            obs_space=self.obs_space,
            input_block=self.input_block,
            hidden=self.hidden_sizes,
        )
        self.snd_net = SNDNet(self.obs_space, self.input_block)
        self._tx = optax.adam(self.lr)

    def _example_transition(self) -> Transition:
        A = self.num_actions
        return Transition(
            obs=self.obs_space.zero(),
            action=jnp.asarray(0, jnp.int32),
            reward=jnp.asarray(0.0),
            next_obs=self.obs_space.zero(),
            undone=jnp.asarray(1.0),
            invalid_mask=jnp.zeros((A,), bool),
            next_invalid_mask=jnp.zeros((A,), bool),
        )

    def init(self, key: Array) -> SNDState:
        k1, k2, k3 = jax.random.split(key, 3)
        obs0 = self.obs_space.zero()[None]
        params = {
            "q": self.q_net.init(k1, obs0),
            "snd_target": self.snd_net.init(k2, obs0),
            "snd_pred": self.snd_net.init(k3, obs0),
        }
        return SNDState(
            params=params,
            q_target_params=jax.tree.map(jnp.copy, params["q"]),
            opt_state={
                "q": self._tx.init(params["q"]),
                "tgt": self._tx.init(params["snd_target"]),
                "pred": self._tx.init(params["snd_pred"]),
            },
            memory=self._replay.init(self._example_transition()),
            train_count=jnp.asarray(0, jnp.int32),
        )

    def policy(self, state: SNDState, obs, invalid_mask, ctx: PolicyContext, key) -> Array:
        eps = jnp.where(ctx.training, self._eps_sch(ctx.step), self.test_epsilon)
        q = self.q_net.apply(state.params["q"], jnp.asarray(obs, jnp.float32))
        return funcs.epsilon_greedy(q, invalid_mask, eps, key)

    def observe(self, state: SNDState, t: Transition, mask) -> SNDState:
        t, mask = self.flatten_transitions(t, mask)
        # distillation intrinsic reward computed at experience time (snd.py:261-276)
        n_obs = jnp.asarray(t.next_obs, jnp.float32)
        z1 = self.snd_net.apply(state.params["snd_target"], n_obs)
        z2 = self.snd_net.apply(state.params["snd_pred"], n_obs)
        r_int = jnp.sum(jnp.square(z1 - z2), axis=-1)
        t = t.replace(reward=t.reward + self.int_reward_scale * r_int)
        return state.replace(memory=self._replay.add_masked(state.memory, t, mask))

    def train(self, state: SNDState, key: Array, num_steps: int) -> Tuple[SNDState, Dict[str, Array]]:
        half = self.batch_size // 2

        def one_update(st: SNDState, k):
            k1, k2, k3 = jax.random.split(k, 3)
            batch, _ = self._replay.sample_with_indices(st.memory, k1, self.batch_size)
            batch2, _ = self._replay.sample_with_indices(st.memory, k2, self.batch_size)
            obs = jnp.asarray(batch.obs, jnp.float32)
            n_obs = jnp.asarray(batch.next_obs, jnp.float32)
            obs_b = jnp.asarray(batch2.obs, jnp.float32)

            # --- contrastive target training (snd.py:161-190): pairs (s1, s1)->0,
            # (s1, s2)->1, with uniform noise augmentation
            ka, kb = jax.random.split(k3)
            s1 = obs + jax.random.uniform(ka, obs.shape, minval=-0.2, maxval=0.2)
            s2_same = s1[:half]
            s2_diff = obs_b[half:] + jax.random.uniform(
                kb, obs_b[half:].shape, minval=-0.2, maxval=0.2
            )
            s2 = jnp.concatenate([s2_same, s2_diff], axis=0)
            tau = jnp.concatenate([jnp.zeros((half,)), jnp.ones((self.batch_size - half,))])

            def tgt_loss_fn(p):
                z1 = self.snd_net.apply(p, s1)
                z2 = self.snd_net.apply(p, s2)
                d = jnp.mean(jnp.square(z1 - z2), axis=-1)
                return jnp.mean(jnp.square(d - tau))

            l_tgt, g_tgt = jax.value_and_grad(tgt_loss_fn)(st.params["snd_target"])

            # --- predictor distillation on next states
            z_tgt = jax.lax.stop_gradient(
                self.snd_net.apply(st.params["snd_target"], n_obs)
            )

            def pred_loss_fn(p):
                return jnp.mean(jnp.square(self.snd_net.apply(p, n_obs) - z_tgt))

            l_pred, g_pred = jax.value_and_grad(pred_loss_fn)(st.params["snd_pred"])

            # --- double DQN on shaped rewards
            n_q = self.q_net.apply(st.params["q"], n_obs)
            n_q_t = self.q_net.apply(st.q_target_params, n_obs)
            neg = jnp.finfo(jnp.float32).min
            n_q = jnp.where(batch.next_invalid_mask, neg, n_q)
            n_act = jnp.argmax(n_q, -1)
            maxq = jnp.take_along_axis(n_q_t, n_act[:, None], -1)[:, 0]
            target = jax.lax.stop_gradient(
                batch.reward + batch.undone * self.discount * maxq
            )

            def q_loss_fn(p):
                q = self.q_net.apply(p, obs)
                qa = jnp.take_along_axis(q, batch.action[:, None], -1)[:, 0]
                return jnp.mean(jnp.square(qa - target))

            l_q, g_q = jax.value_and_grad(q_loss_fn)(st.params["q"])

            if self.pmean_axis is not None:
                g_q, g_tgt, g_pred = self.dp_pmean((g_q, g_tgt, g_pred))

            up_q, o_q = self._tx.update(g_q, st.opt_state["q"], st.params["q"])
            up_t, o_t = self._tx.update(g_tgt, st.opt_state["tgt"], st.params["snd_target"])
            up_p, o_p = self._tx.update(g_pred, st.opt_state["pred"], st.params["snd_pred"])
            new_params = {
                "q": optax.apply_updates(st.params["q"], up_q),
                "snd_target": optax.apply_updates(st.params["snd_target"], up_t),
                "snd_pred": optax.apply_updates(st.params["snd_pred"], up_p),
            }
            new_opt = {"q": o_q, "tgt": o_t, "pred": o_p}

            ready = self._replay.is_warmup_over(st.memory)
            params = masked_update(ready, new_params, st.params)
            opt_state = masked_update(ready, new_opt, st.opt_state)
            train_count = st.train_count + ready.astype(jnp.int32)
            q_target = periodic_target_sync(
                st.q_target_params, params["q"], train_count, self.target_model_update_interval
            )
            return (
                st.replace(
                    params=params,
                    q_target_params=q_target,
                    opt_state=opt_state,
                    train_count=train_count,
                ),
                l_q,
            )

        state, losses = jax.lax.scan(one_update, state, jax.random.split(key, num_steps))
        return state, {"loss": jnp.mean(losses), "train_count": state.train_count.astype(jnp.float32)}

    def params_of(self, state: SNDState):
        return {"params": state.params, "q_target": state.q_target_params}

    def restore_params(self, state: SNDState, p) -> SNDState:
        return state.replace(params=p["params"], q_target_params=p["q_target"])
