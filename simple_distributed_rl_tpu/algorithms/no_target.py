"""Target-network-free variants (parity: srl/algorithms/dqn_not/ NoTarget_DQN and
srl/algorithms/sac_not/ — the author's originals that drop the target network).

NoTarget_DQN (dqn_not/trainer.py): a (Q, V) twin-head net; bootstrap target
r + gamma * (max Q(s') + V(s')) / 2 from the DETACHED online net, plus an "align
loss" pulling Q(s, a) toward the stored discounted return-to-go
(dqn_not/config.py:28-32 max_discount_steps / align_loss_coeff). The return-to-go is
computed chunk-wide by reverse scan (episodes completing in-chunk).

NoTarget_SAC: SAC with the soft target computed from the detached online twin
critics (no target copies, no tau)."""

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
from ..utils import rl_functions as funcs
from ..utils.schedulers import SchedulerConfig
from .base import AlgoConfig, PolicyContext, Transition
from .common import masked_update, to_env_sequences
from .dqn import MemoryConfig
from .sac import SACConfig, SACState

Array = jax.Array


class QVNet(nn.Module):
    """Trunk -> dueling-composed Q plus the V stream exposed separately —
    exactly the reference's QNetwork (dqn_not/parameter.py:16-44: shared
    Linear(units)+ReLU trunk, two-layer v/adv blocks, q = v + adv - mean(adv),
    and the bootstrap later averages (max_q + v)/2)."""

    num_actions: int
    obs_space: Any
    input_block: InputBlockConfig
    hidden: Tuple[int, ...]

    @nn.compact
    def __call__(self, x):
        h = self.input_block.create_block(self.obs_space)(jnp.asarray(x, jnp.float32))
        h = MLPBlock(self.hidden)(h)
        units = self.hidden[-1]
        v = nn.Dense(1)(nn.relu(nn.Dense(units)(h)))
        adv = nn.Dense(self.num_actions)(nn.relu(nn.Dense(units)(h)))
        q = v + adv - jnp.mean(adv, axis=-1, keepdims=True)
        return q, v[..., 0]


@struct.dataclass
class NoTDQNState:
    params: Any
    opt_state: Any
    memory: Any
    # per-env episode tracking buffer (the TPU form of the reference worker's
    # add_tracking deque, dqn_not/worker.py:27-49): transitions wait here until
    # their episode ends (or the window fills), when the discounted return-to-go
    # is computed and the whole window flushes into replay
    trk: Transition  # [B, K, ...]
    trk_len: Array  # [B] int32
    train_count: Array


@struct.dataclass
class NoTItem:
    t: Transition
    total_reward: Array  # discounted return-to-go (align target)


@dataclasses.dataclass
class NoTargetDQNConfig(AlgoConfig):
    test_epsilon: float = 0.0
    epsilon: float = 0.1
    epsilon_scheduler: SchedulerConfig = dataclasses.field(default_factory=SchedulerConfig)
    discount: float = 0.995
    #: cap on the tracked return-to-go window (parity: dqn_not/config.py
    #: max_discount_steps=500); also capped to the env's max episode length
    max_discount_steps: int = 500
    align_loss_coeff: float = 0.1
    batch_size: int = 32
    memory: MemoryConfig = dataclasses.field(default_factory=MemoryConfig)
    lr: float = 2e-4
    input_block: InputBlockConfig = dataclasses.field(default_factory=InputBlockConfig)
    hidden_sizes: Tuple[int, ...] = (128, 128)

    observation_type: RLBaseTypes = RLBaseTypes.BOX
    action_type: RLBaseTypes = RLBaseTypes.DISCRETE

    def get_name(self) -> str:
        return "NoTarget_DQN"

    def on_setup(self) -> None:
        self._eps_sch = self.epsilon_scheduler.create(self.epsilon)
        self._replay = self.memory.create()
        self.model = QVNet(self.action_space.n, self.obs_space, self.input_block, self.hidden_sizes)
        self._tx = optax.adam(self.lr)

    def _example_item(self) -> NoTItem:
        A = self.num_actions
        return NoTItem(
            t=Transition(
                obs=self.obs_space.zero(),
                action=jnp.asarray(0, jnp.int32),
                reward=jnp.asarray(0.0),
                next_obs=self.obs_space.zero(),
                undone=jnp.asarray(1.0),
                invalid_mask=jnp.zeros((A,), bool),
                next_invalid_mask=jnp.zeros((A,), bool),
            ),
            total_reward=jnp.asarray(0.0),
        )

    def init(self, key: Array) -> NoTDQNState:
        params = self.model.init(key, self.obs_space.zero()[None])
        B = int(getattr(self, "num_envs_hint", 1))
        K = min(self.max_discount_steps, int(self.env.max_episode_steps) + 1)
        self._K = K
        example = self._example_item().t
        trk = jax.tree.map(
            lambda x: jnp.zeros((B, K) + jnp.shape(x), jnp.asarray(x).dtype), example
        )
        return NoTDQNState(
            params=params,
            opt_state=self._tx.init(params),
            memory=self._replay.init(self._example_item()),
            trk=trk,
            trk_len=jnp.zeros((B,), jnp.int32),
            train_count=jnp.asarray(0, jnp.int32),
        )

    def policy(self, state: NoTDQNState, obs, invalid_mask, ctx: PolicyContext, key) -> Array:
        eps = jnp.where(ctx.training, self._eps_sch(ctx.step), self.test_epsilon)
        q, _ = self.model.apply(state.params, obs)
        return funcs.epsilon_greedy(q, invalid_mask, eps, key)

    def observe(self, state: NoTDQNState, t: Transition, mask) -> NoTDQNState:
        """Track transitions per env until episode end (or the window cap), then
        compute discounted return-to-go for the WHOLE episode and flush it into
        replay — episodes spanning chunk boundaries are handled by the carried
        tracker (parity: worker.add_tracking + the flush-on-done loop,
        dqn_not/worker.py:27-49; round-1 dropped episodes that crossed chunks)."""
        num_envs = mask.shape[1] // (1 + self.env.player_num)
        seq, valid, is_final = to_env_sequences(t, mask, num_envs)
        B, L = valid.shape
        K = self._K
        idxB = jnp.arange(B)

        def ret_to_go(trk, trk_len):
            # discounted return-to-go over the window: linear recurrence
            # ret_j = r_j + gamma * ret_{j+1} within the tracked episode, solved by
            # an associative scan (exact, O(log K) depth)
            in_win = jnp.arange(K)[None, :] < trk_len[:, None]  # [B, K]
            r = jnp.where(in_win, trk.reward, 0.0)
            d = jnp.where(in_win, self.discount, 0.0)

            def comb(a, b):
                # affine-map composition f(x)=r+d*x: b AFTER a (b covers the
                # later reversed indices = earlier timesteps)
                return b[0] + b[1] * a[0], b[1] * a[1]

            rets, _ = jax.lax.associative_scan(
                comb, (r[:, ::-1], d[:, ::-1]), axis=1
            )
            return rets[:, ::-1], in_win  # [B, K] return-to-go from each position

        def step_fn(carry, xs):
            trk, trk_len, mem = carry
            item, v, fin = xs  # Transition [B,...], [B] bool, [B] bool

            # window full without episode end: emit ONLY the oldest item, whose
            # return spans the full max_discount_steps horizon, then slide the
            # window (parity: the reference's deque slide, dqn_not/worker.py:39-44;
            # round-2 advisor: flushing all K truncated the newest items' horizons)
            full = (trk_len >= K) & v
            rets, _ = ret_to_go(trk, trk_len)
            oldest = jax.tree.map(lambda x: x[:, 0], trk)
            mem = self._replay.add_masked(
                mem, NoTItem(t=oldest, total_reward=rets[:, 0]), full
            )

            def shift(buf):
                m = full.reshape((B,) + (1,) * (buf.ndim - 1))
                return jnp.where(m, jnp.roll(buf, -1, axis=1), buf)

            trk = jax.tree.map(shift, trk)
            trk_len = jnp.where(full, K - 1, trk_len)

            # push at trk_len (valid rows only)
            pos = jnp.clip(trk_len, 0, K - 1)

            def put(buf, val):
                cur = buf[idxB, pos]
                m = v.reshape((B,) + (1,) * (val.ndim - 1))
                return buf.at[idxB, pos].set(jnp.where(m, val, cur))

            trk = jax.tree.map(put, trk, item)
            trk_len = trk_len + v.astype(jnp.int32)

            # flush the whole window on episode end: every item's return-to-go
            # legitimately truncates at the terminal step
            flush = fin & v
            rets, in_win = ret_to_go(trk, trk_len)
            flush_rows = flush[:, None] & in_win  # [B, K]
            flat_item = jax.tree.map(
                lambda x: x.reshape((B * K,) + x.shape[2:]),
                NoTItem(t=trk, total_reward=rets),
            )
            mem = self._replay.add_masked(mem, flat_item, flush_rows.reshape(-1))
            trk_len = jnp.where(flush, 0, trk_len)
            return (trk, trk_len, mem), None

        xs = (
            jax.tree.map(lambda x: jnp.swapaxes(x, 0, 1), seq),  # [L, B, ...]
            valid.T,
            is_final.T,
        )
        (trk, trk_len, memory), _ = jax.lax.scan(
            step_fn, (state.trk, state.trk_len, state.memory), xs
        )
        return state.replace(trk=trk, trk_len=trk_len, memory=memory)

    def train(self, state: NoTDQNState, key: Array, num_steps: int) -> Tuple[NoTDQNState, Dict[str, Array]]:
        def one_update(st: NoTDQNState, k):
            item, _ = self._replay.sample_with_indices(st.memory, k, self.batch_size)
            batch = item.t

            def loss_fn(params):
                q_all, _ = self.model.apply(params, batch.obs)
                n_q, n_v = self.model.apply(params, batch.next_obs)
                n_q = jax.lax.stop_gradient(n_q)
                n_v = jax.lax.stop_gradient(n_v)
                neg = jnp.finfo(jnp.float32).min
                n_q = jnp.where(batch.next_invalid_mask, neg, n_q)
                n_maxq = jnp.max(n_q, -1)
                target = batch.reward + batch.undone * self.discount * (n_maxq + n_v) / 2.0
                qa = jnp.take_along_axis(q_all, batch.action[:, None], -1)[:, 0]
                l_q = jnp.mean(optax.huber_loss(qa, jax.lax.stop_gradient(target)))
                l_align = jnp.mean(jnp.square(qa - item.total_reward))
                return l_q + self.align_loss_coeff * l_align

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

    def params_of(self, state: NoTDQNState):
        return state.params

    def restore_params(self, state: NoTDQNState, p) -> NoTDQNState:
        return state.replace(params=p)


@dataclasses.dataclass
class NoTargetSACConfig(SACConfig):
    """SAC without target critics: the soft bootstrap uses the detached online twins
    (parity: srl/algorithms/sac_not/)."""

    soft_target_tau: float = 1.0  # target == online every step

    def get_name(self) -> str:
        return "NoTarget_SAC"
