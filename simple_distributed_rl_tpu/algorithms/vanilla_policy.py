"""VanillaPolicy — tabular REINFORCE, discrete and continuous actions (parity:
srl/algorithms/vanilla_policy.py: softmax-table policy for discrete, per-state
gaussian (mean, log-std) table for continuous, Monte-Carlo return updates).

TPU form: the policy tables are dense [S, ...] arrays; MC returns come from a backward
scan over the chunk's chronological sequences, and the REINFORCE update is a
count-normalized scatter-add (same batched-expectation treatment as QL).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..define import RLBaseTypes
from ..spaces import Discrete
from .base import AlgoConfig, PolicyContext, Transition
from .common import masked_gae, to_env_sequences

Array = jax.Array


@struct.dataclass
class VPState:
    # discrete: logits [S, A]; continuous: mean/log_std [S]
    table: Any
    train_count: Array


@dataclasses.dataclass
class VanillaPolicyConfig(AlgoConfig):
    lr: float = 0.1
    discount: float = 0.9

    observation_type: RLBaseTypes = RLBaseTypes.DISCRETE
    action_type: RLBaseTypes = RLBaseTypes.DISCRETE

    def get_name(self) -> str:
        return "VanillaPolicy"

    def setup(self, env) -> None:
        if not isinstance(env.action_space, Discrete):
            self.action_type = RLBaseTypes.CONTINUOUS
        super().setup(env)

    def on_setup(self) -> None:
        self.num_states = self.obs_space.n
        self.is_discrete = isinstance(self.action_space, Discrete)
        if not self.is_discrete:
            self._a_low = float(self.action_space.low)
            self._a_high = float(self.action_space.high)

    def init(self, key: Array) -> VPState:
        S = self.num_states
        if self.is_discrete:
            table = jnp.zeros((S, self.action_space.n), jnp.float32)
        else:
            table = {
                "mean": jnp.zeros((S,), jnp.float32),
                "log_std": jnp.zeros((S,), jnp.float32),
            }
        return VPState(table=table, train_count=jnp.asarray(0, jnp.int32))

    def action_values(self, state: VPState, obs):
        if not self.is_discrete:
            return None
        return jax.nn.softmax(state.table[obs], axis=-1)

    def policy(self, state: VPState, obs, invalid_mask, ctx: PolicyContext, key) -> Array:
        if self.is_discrete:
            logits = state.table[obs]
            logits = jnp.where(invalid_mask, -jnp.inf, logits)
            return jnp.where(
                ctx.training,
                jax.random.categorical(key, logits, axis=-1),
                jnp.argmax(logits, axis=-1),
            ).astype(jnp.int32)
        mean = state.table["mean"][obs]
        std = jnp.exp(jnp.clip(state.table["log_std"][obs], -5.0, 2.0))
        a = jnp.where(ctx.training, mean + std * jax.random.normal(key, mean.shape), mean)
        return jnp.clip(a, self._a_low, self._a_high)

    def observe(self, state: VPState, t: Transition, mask) -> VPState:
        num_envs = mask.shape[1] // (1 + self.env.player_num)
        seq, valid, is_final = to_env_sequences(t, mask, num_envs)
        B, L = valid.shape
        zeros = jnp.zeros((B, L), jnp.float32)
        # MC return: GAE with lambda=1 and zero baseline
        g, _ = masked_gae(seq.reward, zeros, zeros, seq.undone, valid, self.discount, 1.0, is_final)
        m = valid.reshape(-1).astype(jnp.float32)
        s = seq.obs.reshape(-1)
        g = g.reshape(-1)
        n = jnp.maximum(m.sum(), 1.0)

        if self.is_discrete:
            a = seq.action.reshape(-1)
            A = self.action_space.n
            pi = jax.nn.softmax(state.table[s], axis=-1)  # [N, A]
            grad = (jax.nn.one_hot(a, A) - pi) * (g * m)[:, None]  # [N, A]
            flat = s[:, None] * A + jnp.arange(A)[None, :]
            upd = jnp.zeros((self.num_states * A,), jnp.float32).at[flat.reshape(-1)].add(grad.reshape(-1))
            cnt = jnp.zeros((self.num_states,), jnp.float32).at[s].add(m)
            # dp: mean policy gradient over the GLOBAL batch keeps replicas identical
            upd, cnt = self.dp_psum(upd), self.dp_psum(cnt)
            upd = upd.reshape(self.num_states, A) / jnp.maximum(cnt, 1.0)[:, None]
            table = state.table + self.lr * upd
        else:
            a = seq.action.reshape(-1)
            mean = state.table["mean"][s]
            log_std = jnp.clip(state.table["log_std"][s], -5.0, 2.0)
            std = jnp.exp(log_std)
            z = (a - mean) / jnp.maximum(std, 1e-6)
            d_mean = z / jnp.maximum(std, 1e-6) * g * m
            d_log_std = (z**2 - 1.0) * g * m
            sum_mean = self.dp_psum(jnp.zeros((self.num_states,)).at[s].add(d_mean))
            sum_lstd = self.dp_psum(jnp.zeros((self.num_states,)).at[s].add(d_log_std))
            cnt = jnp.maximum(self.dp_psum(jnp.zeros((self.num_states,)).at[s].add(m)), 1.0)
            table = {
                "mean": state.table["mean"] + self.lr * sum_mean / cnt,
                "log_std": state.table["log_std"] + self.lr * 0.1 * sum_lstd / cnt,
            }
        n = self.dp_psum(m.sum()).astype(jnp.int32)
        return VPState(table=table, train_count=state.train_count + n)

    def train(self, state, key, num_steps):
        return state, {"train_count": state.train_count.astype(jnp.float32)}

    def params_of(self, state: VPState):
        return state.table

    def restore_params(self, state: VPState, p) -> VPState:
        return state.replace(table=p)
