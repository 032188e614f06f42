"""Episode/sequence replay with windowed sampling (parity:
srl/rl/memories/episode_replay_buffer.py:10-191 — store whole episodes, sample windows
of ``prefix_size + 1 + suffix_size`` with skip_head/skip_tail).

TPU form: episodes are stored as FIXED-length rows [max_len, ...] with a per-row valid
length (shorter episodes zero-padded, longer ones truncated at add time by the
caller); window sampling is a uniform (row, start) gather with dynamic_slice, fully
batched. R2D2/DreamerV3 use their own chunk-aligned variants; this class is the
general-purpose API for user algorithms.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from .replay_buffer import ReplayBuffer, ReplayState

Array = jax.Array


@struct.dataclass
class EpisodeItem:
    data: Any  # pytree [max_len, ...]
    length: Array  # int32 valid steps


class EpisodeReplayBuffer:
    """Ring of fixed-shape episode rows + windowed sampling."""

    def __init__(
        self,
        capacity: int,
        max_len: int,
        prefix_size: int = 0,
        suffix_size: int = 0,
        skip_head: int = 0,
        skip_tail: int = 0,
        warmup_size: int = 1,
    ):
        self.inner = ReplayBuffer(capacity, warmup_size)
        self.max_len = int(max_len)
        self.prefix_size = int(prefix_size)
        self.suffix_size = int(suffix_size)
        self.skip_head = int(skip_head)
        self.skip_tail = int(skip_tail)
        self.window = self.prefix_size + 1 + self.suffix_size

    def init(self, example_step: Any) -> ReplayState:
        row = jax.tree.map(
            lambda x: jnp.zeros((self.max_len,) + jnp.shape(x), jnp.asarray(x).dtype),
            example_step,
        )
        return self.inner.init(EpisodeItem(data=row, length=jnp.asarray(0, jnp.int32)))

    def add_episodes(self, state: ReplayState, episodes: Any, lengths: Array) -> ReplayState:
        """episodes: pytree [B, max_len, ...]; lengths [B]."""
        items = EpisodeItem(data=episodes, length=lengths.astype(jnp.int32))
        return self.inner.add(state, items)

    def add_episodes_masked(self, state: ReplayState, episodes: Any, lengths: Array, mask: Array) -> ReplayState:
        items = EpisodeItem(data=episodes, length=lengths.astype(jnp.int32))
        return self.inner.add_masked(state, items, mask)

    def sample_windows(self, state: ReplayState, key: Array, batch_size: int) -> Tuple[Any, Array]:
        """Sample ``batch_size`` windows of length ``prefix+1+suffix``. Returns
        (windows pytree [batch, window, ...], step_mask [batch, window] marking
        positions inside the episode's valid length)."""
        k1, k2 = jax.random.split(key)
        items, _ = self.inner.sample_with_indices(state, k1, batch_size)
        length = items.length  # [batch]

        lo = self.skip_head
        hi = jnp.maximum(length - self.window - self.skip_tail, lo)
        u = jax.random.uniform(k2, (batch_size,))
        start = (lo + u * (hi - lo + 1).astype(jnp.float32)).astype(jnp.int32)
        start = jnp.clip(start, 0, self.max_len - self.window)

        def slice_row(row, s):
            return jax.tree.map(
                lambda x: jax.lax.dynamic_slice_in_dim(x, s, self.window, axis=0), row
            )

        windows = jax.vmap(slice_row)(items.data, start)
        pos = start[:, None] + jnp.arange(self.window)[None, :]
        step_mask = pos < length[:, None]
        return windows, step_mask

    def is_warmup_over(self, state: ReplayState) -> Array:
        return self.inner.is_warmup_over(state)
