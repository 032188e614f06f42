"""Prioritized replay on device — the TPU-native replacement for the reference's C++
sum-tree (srl/rl/memories/priority_memories/proportional_memory.py:13-177 and
cpp_module/src/proportional_memory.cpp:14-250).

Same sampling semantics: proportional p_i = (|priority| + eps)^alpha, new items enter
at max priority, importance weights w = (N * p/total)^(-beta) with beta annealed
beta_initial -> 1 over beta_steps and normalized by the batch max. Instead of a
pointer-chasing binary tree (host-sequential, the reason the reference needed C++),
priorities live in a flat [capacity] array viewed as ``[num_buckets, bucket]``; sampling
is a two-level inverse-CDF: cumsum over bucket sums (one [B]-sized scan) then cumsum
inside the hit bucket — both fully vectorized over the sample batch, so adds, updates
and samples are O(batch) scatters/gathers plus one streaming pass over HBM (~capacity
floats, bandwidth-trivial on TPU). No host sync anywhere.

Also provides rank-based variants (parity: rankbased_memory.py / _linear.py) via a full
sort at sample time — vectorized and cheap at replay sizes.
"""

from __future__ import annotations

import math
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from .replay_buffer import ReplayBuffer, ReplayState

Array = jax.Array


@struct.dataclass
class PriorityReplayState:
    base: ReplayState
    priorities: Array  # [capacity] f32, already alpha-exponentiated; 0 = empty slot
    max_priority: Array  # f32 (alpha-exponentiated domain, starts at 1)


def _pick_bucket(capacity: int) -> int:
    b = 1 << max(0, int(math.log2(max(1.0, math.sqrt(capacity)))))
    while capacity % b != 0:
        b >>= 1
    return max(b, 1)


class PriorityReplayBuffer:
    """Proportional PER. All methods pure; ``sample`` returns (items, weights, indices)
    exactly like the reference's (batches, weights, indices) triple
    (proportional_memory.py:131-177)."""

    def __init__(
        self,
        capacity: int,
        warmup_size: int = 1,
        alpha: float = 0.6,
        beta_initial: float = 0.4,
        beta_steps: int = 1_000_000,
        epsilon: float = 1e-4,
    ):
        self.inner = ReplayBuffer(capacity, warmup_size)
        self.capacity = self.inner.capacity
        self.warmup_size = self.inner.warmup_size
        self.alpha = float(alpha)
        self.beta_initial = float(beta_initial)
        self.beta_steps = int(beta_steps)
        self.epsilon = float(epsilon)
        self.num_buckets = _pick_bucket(self.capacity)
        self.bucket_size = self.capacity // self.num_buckets

    # -- lifecycle ---------------------------------------------------------
    def init(self, example_item: Any) -> PriorityReplayState:
        return PriorityReplayState(
            base=self.inner.init(example_item),
            priorities=jnp.zeros((self.capacity,), jnp.float32),
            max_priority=jnp.asarray(1.0, jnp.float32),
        )

    def _exponentiate(self, raw_priority: Array) -> Array:
        return (jnp.abs(raw_priority) + self.epsilon) ** self.alpha

    def add(self, state: PriorityReplayState, items: Any, priority: Array = None) -> PriorityReplayState:
        """B items at max priority (proportional_memory.py:120-128) or explicit raw
        priorities."""
        b = jax.tree.leaves(items)[0].shape[0]
        pos = (state.base.insert_pos + jnp.arange(b, dtype=jnp.int32)) % self.capacity
        if priority is None:
            p = jnp.full((b,), 1.0, jnp.float32) * state.max_priority
        else:
            p = self._exponentiate(jnp.broadcast_to(priority, (b,)))
        base = self.inner.add(state.base, items)
        return PriorityReplayState(
            base=base,
            priorities=state.priorities.at[pos].set(p),
            max_priority=jnp.maximum(state.max_priority, jnp.max(p)),
        )

    def add_masked(self, state: PriorityReplayState, items: Any, mask: Array) -> PriorityReplayState:
        # same cumsum-rank slots as ReplayBuffer.add_masked; masked-out rows go
        # out of bounds and are DROPPED by the scatter (priorities has no scratch
        # row), so the data and priority writes land on identical slots
        offs = jnp.cumsum(mask.astype(jnp.int32)) - 1
        pos = jnp.where(
            mask, (state.base.insert_pos + offs) % self.capacity, self.capacity
        )
        new_prio = state.priorities.at[pos].set(
            jnp.broadcast_to(state.max_priority, pos.shape), mode="drop"
        )
        base = self.inner.add_masked(state.base, items, mask)
        return PriorityReplayState(
            base=base, priorities=new_prio, max_priority=state.max_priority
        )

    # -- sampling ----------------------------------------------------------
    def beta(self, step: Array) -> Array:
        return jnp.minimum(
            self.beta_initial + (1.0 - self.beta_initial) * step / self.beta_steps, 1.0
        )

    def sample(
        self, state: PriorityReplayState, key: Array, batch_size: int, step: Array
    ) -> Tuple[Any, Array, Array]:
        p = state.priorities  # [C]; empty slots are 0 so never selected
        rows = p.reshape(self.num_buckets, self.bucket_size)
        bucket_sums = rows.sum(axis=1)  # [B] — one streaming pass over HBM
        cum_b = jnp.cumsum(bucket_sums)
        total = cum_b[-1]

        r = jax.random.uniform(key, (batch_size,)) * total
        b_idx = jnp.clip(
            jnp.searchsorted(cum_b, r, side="right"), 0, self.num_buckets - 1
        )
        within = r - jnp.where(b_idx > 0, cum_b[b_idx - 1], 0.0)

        hit_rows = rows[b_idx]  # [batch, S]
        cum_r = jnp.cumsum(hit_rows, axis=1)
        s_idx = jnp.clip(
            jax.vmap(lambda c, v: jnp.searchsorted(c, v, side="right"))(cum_r, within),
            0,
            self.bucket_size - 1,
        )
        idx = b_idx * self.bucket_size + s_idx

        prob = p[idx] / jnp.maximum(total, 1e-30)
        n = jnp.maximum(state.base.size, 1).astype(jnp.float32)
        w = (n * prob) ** (-self.beta(step))
        w = w / jnp.maximum(jnp.max(w), 1e-30)

        items = jax.tree.map(lambda buf: buf[idx], state.base.data)
        return items, w.astype(jnp.float32), idx

    def update(
        self, state: PriorityReplayState, indices: Array, raw_priorities: Array, enable: Array = None
    ) -> PriorityReplayState:
        """Post-train priority write-back (proportional_memory.py:179-186). ``enable``
        (scalar bool) turns the write into a no-op without control flow — used to mask
        updates during replay warmup."""
        p = self._exponentiate(raw_priorities)
        if enable is not None:
            p = jnp.where(enable, p, state.priorities[indices])
        return PriorityReplayState(
            base=state.base,
            priorities=state.priorities.at[indices].set(p),
            max_priority=jnp.maximum(state.max_priority, jnp.max(p)),
        )

    def is_warmup_over(self, state: PriorityReplayState) -> Array:
        return self.inner.is_warmup_over(state.base)


class RankBasedReplayBuffer(PriorityReplayBuffer):
    """Rank-based PER (parity: rankbased_memory.py): p_i = (1/rank)^alpha. Computed by
    sorting priorities at sample time — a single vectorized sort, no incremental
    bisect-list bookkeeping."""

    def sample(self, state, key, batch_size, step):
        order = jnp.argsort(-state.priorities)  # rank 0 = highest
        ranks = jnp.zeros((self.capacity,), jnp.float32).at[order].set(
            jnp.arange(1, self.capacity + 1, dtype=jnp.float32)
        )
        live = state.priorities > 0
        rank_p = jnp.where(live, (1.0 / ranks) ** self.alpha, 0.0)
        tmp = PriorityReplayState(
            base=state.base, priorities=rank_p, max_priority=state.max_priority
        )
        return PriorityReplayBuffer.sample(self, tmp, key, batch_size, step)


class RankBasedLinearReplayBuffer(PriorityReplayBuffer):
    """Linear-rank PER (parity: rankbased_memory_linear.py): p_i = (N - rank_i)."""

    def sample(self, state, key, batch_size, step):
        order = jnp.argsort(-state.priorities)
        n = jnp.maximum(state.base.size, 1).astype(jnp.float32)
        ranks = jnp.zeros((self.capacity,), jnp.float32).at[order].set(
            jnp.arange(0, self.capacity, dtype=jnp.float32)
        )
        live = state.priorities > 0
        rank_p = jnp.where(live, jnp.maximum(n - ranks, 0.0), 0.0)
        tmp = PriorityReplayState(
            base=state.base, priorities=rank_p, max_priority=state.max_priority
        )
        return PriorityReplayBuffer.sample(self, tmp, key, batch_size, step)
