"""Device-resident uniform replay (parity: srl/rl/memories/replay_buffer.py:33,130).

The reference keeps a python deque of pickled items and feeds them over mp queues; here
the buffer is a fixed-shape pytree of device arrays living in HBM, written by the
vectorized rollout with a batched scatter and sampled with a batched gather — zero
host↔device traffic in the hot loop. All ops are pure (state in, state out) and
jit/vmap/shard_map-compatible; sharding the leading (capacity) axis over a mesh gives
per-device replay shards.

Storage layout: every leaf has ``capacity + 1`` rows; the last row is a scratch slot
that masked-out writes are routed to, so ``add_masked`` needs no data-dependent shapes.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import struct

Array = jax.Array


@struct.dataclass
class ReplayState:
    """data: pytree of [capacity + 1, ...] arrays; ring cursor + live size."""

    data: Any
    insert_pos: Array  # int32
    size: Array  # int32


class ReplayBuffer:
    """Uniform ring-buffer replay with batched add.

    ``init`` builds storage from one example item (zeros); ``add`` writes B items at the
    ring cursor; ``sample`` gathers a uniform batch. The warmup gate
    (srl/rl/memories/replay_buffer.py warmup_size) is exposed as ``is_warmup_over`` and
    applied by the caller with ``jnp.where`` (no data-dependent control flow under jit).
    """

    def __init__(self, capacity: int, warmup_size: int = 1):
        assert capacity >= 1
        self.capacity = int(capacity)
        self.warmup_size = max(1, int(warmup_size))

    def init(self, example_item: Any) -> ReplayState:
        data = jax.tree.map(
            lambda x: jnp.zeros((self.capacity + 1,) + jnp.shape(x), jnp.asarray(x).dtype),
            example_item,
        )
        return ReplayState(
            data=data, insert_pos=jnp.asarray(0, jnp.int32), size=jnp.asarray(0, jnp.int32)
        )

    def _write(self, state: ReplayState, items: Any, pos: Array, n_added: Array) -> ReplayState:
        data = jax.tree.map(lambda buf, x: buf.at[pos].set(x), state.data, items)
        return ReplayState(
            data=data,
            insert_pos=(state.insert_pos + n_added) % self.capacity,
            size=jnp.minimum(state.size + n_added, self.capacity),
        )

    def add(self, state: ReplayState, items: Any) -> ReplayState:
        """Add B items (every leaf has leading dim B). Vectorized ring write."""
        b = jax.tree.leaves(items)[0].shape[0]
        pos = (state.insert_pos + jnp.arange(b, dtype=jnp.int32)) % self.capacity
        return self._write(state, items, pos, jnp.asarray(b, jnp.int32))

    def add_masked(self, state: ReplayState, items: Any, mask: Array) -> ReplayState:
        """Add only rows where ``mask`` is True. Static shapes: each valid row's ring
        slot is its rank among the valid rows (one cumsum — the chunk's masked rows
        can be ~10^6, so this replaces the previous O(n log n) stable-argsort
        compaction, which showed up in the TPU profile); masked-out rows are
        scattered to the scratch row ``capacity``."""
        offs = jnp.cumsum(mask.astype(jnp.int32)) - 1  # rank among valid rows
        pos = jnp.where(
            mask, (state.insert_pos + offs) % self.capacity, self.capacity
        )
        n_valid = jnp.sum(mask.astype(jnp.int32))
        return self._write(state, items, pos, n_valid)

    def sample(self, state: ReplayState, key: Array, batch_size: int) -> Any:
        idx = jax.random.randint(key, (batch_size,), 0, jnp.maximum(state.size, 1))
        return jax.tree.map(lambda buf: buf[idx], state.data)

    def sample_with_indices(
        self, state: ReplayState, key: Array, batch_size: int
    ) -> Tuple[Any, Array]:
        idx = jax.random.randint(key, (batch_size,), 0, jnp.maximum(state.size, 1))
        return jax.tree.map(lambda buf: buf[idx], state.data), idx

    def is_warmup_over(self, state: ReplayState) -> Array:
        return state.size >= self.warmup_size
