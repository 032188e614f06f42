"""Demo-memory mixing (R2D3-style) — parity: the demo branch of
srl/rl/memories/priority_replay_buffer.py:32-38,177-189,228-250.

Reference semantics reproduced exactly:
  * two memories: the main (prioritized) buffer and a uniform demo buffer;
  * `select_memory` routes experience collection ("main" or "demo") statically;
  * each sampled batch = (batch - demo_n) prioritized items + demo_n uniform demo
    items with importance weight 1.0, where demo_n = max(1, int(batch * demo_ratio));
  * priority write-back applies to the main portion only (priority_replay_buffer.py:246-248).

TPU re-design: both buffers are device-resident pytrees, the mixed batch is one
concatenate (static split point), so the whole thing stays inside the jitted train
step — no host round-trip for the demo side either.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from .priority_buffer import PriorityReplayBuffer
from .replay_buffer import ReplayBuffer

Array = jax.Array


@struct.dataclass
class DemoMixedState:
    main: Any
    demo: Any


class DemoMixedReplayBuffer:
    """Wraps a main prioritized buffer + a uniform demo buffer behind the same
    (init / add_masked / sample / update / is_warmup_over) protocol the algorithms use,
    so enabling demo mixing is a pure config switch."""

    def __init__(
        self,
        main,  # PriorityReplayBuffer or uniform ReplayBuffer
        demo_capacity: int = None,
        demo_ratio: float = 1.0 / 256.0,
        select_memory: str = "main",
    ):
        assert select_memory in ("main", "demo")
        self.main = main
        self._main_is_per = isinstance(main, PriorityReplayBuffer)
        self.demo = ReplayBuffer(demo_capacity or main.capacity, warmup_size=1)
        self.demo_ratio = float(demo_ratio)
        self.select_memory = select_memory
        self.capacity = main.capacity
        self.warmup_size = main.warmup_size

    def demo_batch_size(self, batch_size: int) -> int:
        return max(1, int(batch_size * self.demo_ratio))

    # -- lifecycle ----------------------------------------------------------
    def init(self, example_item: Any) -> DemoMixedState:
        return DemoMixedState(
            main=self.main.init(example_item), demo=self.demo.init(example_item)
        )

    def add_masked(self, state: DemoMixedState, items: Any, mask: Array) -> DemoMixedState:
        """Collection path — routed by select_memory (priority_replay_buffer.py:214-217)."""
        if self.select_memory == "demo":
            return state.replace(demo=self.demo.add_masked(state.demo, items, mask))
        return state.replace(main=self.main.add_masked(state.main, items, mask))

    def add(self, state: DemoMixedState, items: Any, priority: Array = None) -> DemoMixedState:
        if self.select_memory == "demo":
            return state.replace(demo=self.demo.add(state.demo, items))
        return state.replace(main=self.main.add(state.main, items, priority))

    def add_demo(self, state: DemoMixedState, items: Any) -> DemoMixedState:
        """Explicit demo-data load (e.g. from a recorded rollout), regardless of
        select_memory."""
        return state.replace(demo=self.demo.add(state.demo, items))

    # -- sampling -----------------------------------------------------------
    def sample(
        self, state: DemoMixedState, key: Array, batch_size: int, step: Array
    ) -> Tuple[Any, Array, Array]:
        demo_n = self.demo_batch_size(batch_size)
        main_n = batch_size - demo_n
        assert main_n > 0, f"demo_ratio too large for batch_size={batch_size}"
        k_main, k_demo = jax.random.split(key)
        if self._main_is_per:
            items_m, w_m, idx_m = self.main.sample(state.main, k_main, main_n, step)
        else:
            items_m, idx_m = self.main.sample_with_indices(state.main, k_main, main_n)
            w_m = jnp.ones((main_n,), jnp.float32)
        items_d, idx_d = self.demo.sample_with_indices(state.demo, k_demo, demo_n)
        items = jax.tree.map(
            lambda a, b: jnp.concatenate([a, b], axis=0), items_m, items_d
        )
        w = jnp.concatenate([w_m, jnp.ones((demo_n,), jnp.float32)])
        idx = jnp.concatenate([idx_m, idx_d])
        return items, w, idx

    def update(
        self, state: DemoMixedState, indices: Array, raw_priorities: Array, enable: Array = None
    ) -> DemoMixedState:
        """Main portion only (priority_replay_buffer.py:246-248)."""
        if not self._main_is_per:
            return state
        batch = indices.shape[0]
        demo_n = self.demo_batch_size(batch)
        main_n = batch - demo_n
        return state.replace(
            main=self.main.update(
                state.main, indices[:main_n], raw_priorities[:main_n], enable=enable
            )
        )

    def is_warmup_over(self, state: DemoMixedState) -> Array:
        # main must be warm; demo must hold at least one mixable batch
        demo_ready = state.demo.size >= 1
        return jnp.logical_and(self.main.is_warmup_over(state.main), demo_ready)
