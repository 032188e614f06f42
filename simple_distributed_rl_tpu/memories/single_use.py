"""On-policy take-all-and-clear buffer (parity: srl/rl/memories/single_use_buffer.py).

In a jitted engine the on-policy case is usually the rollout scan output itself; this
buffer exists for algorithms that accumulate a fixed number of transitions between
train calls (QL, VanillaPolicy, PPO chunks): a fixed-capacity block plus a fill count.
``take_all`` returns the whole block and a validity mask, then resets the count.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import struct

Array = jax.Array


@struct.dataclass
class SingleUseState:
    data: Any  # pytree [capacity, ...]
    count: Array  # int32


class SingleUseBuffer:
    def __init__(self, capacity: int):
        self.capacity = int(capacity)

    def init(self, example_item: Any) -> SingleUseState:
        data = jax.tree.map(
            lambda x: jnp.zeros((self.capacity,) + jnp.shape(x), jnp.asarray(x).dtype),
            example_item,
        )
        return SingleUseState(data=data, count=jnp.asarray(0, jnp.int32))

    def add(self, state: SingleUseState, items: Any) -> SingleUseState:
        b = jax.tree.leaves(items)[0].shape[0]
        pos = jnp.minimum(state.count + jnp.arange(b, dtype=jnp.int32), self.capacity - 1)
        data = jax.tree.map(lambda buf, x: buf.at[pos].set(x), state.data, items)
        return SingleUseState(data=data, count=jnp.minimum(state.count + b, self.capacity))

    def take_all(self, state: SingleUseState) -> Tuple[Any, Array, SingleUseState]:
        mask = jnp.arange(self.capacity) < state.count
        cleared = SingleUseState(data=state.data, count=jnp.asarray(0, jnp.int32))
        return state.data, mask, cleared
