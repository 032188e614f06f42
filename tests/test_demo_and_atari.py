"""Demo-memory mixing (R2D3-style), AtariProcessor, and the MuZero-atari block."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

jax.config.update("jax_platforms", "cpu")

from simple_distributed_rl_tpu.define import SpaceTypes
from simple_distributed_rl_tpu.memories.demo_mixed import DemoMixedReplayBuffer
from simple_distributed_rl_tpu.memories.priority_buffer import PriorityReplayBuffer
from simple_distributed_rl_tpu.models.blocks import InputBlockConfig, MuZeroAtariBlock
from simple_distributed_rl_tpu.processors import AtariPongProcessor, AtariProcessor
from simple_distributed_rl_tpu.spaces import Box


def test_demo_mixed_sampling_composition():
    main = PriorityReplayBuffer(capacity=64, warmup_size=4)
    buf = DemoMixedReplayBuffer(main, demo_ratio=0.25, select_memory="main")
    state = buf.init({"x": jnp.asarray(0.0)})

    # collection goes to main; demo loaded explicitly
    items = {"x": jnp.arange(8, dtype=jnp.float32)}
    state = buf.add(state, items)
    demo_items = {"x": jnp.full((4,), 100.0)}
    state = buf.add_demo(state, demo_items)

    k = jax.random.PRNGKey(0)
    batch, w, idx = buf.sample(state, k, batch_size=8, step=jnp.asarray(0))
    assert batch["x"].shape == (8,)
    demo_n = buf.demo_batch_size(8)
    assert demo_n == 2
    # demo tail comes from the demo buffer (values 100) with weight 1
    assert np.all(np.asarray(batch["x"][-demo_n:]) == 100.0)
    assert np.all(np.asarray(w[-demo_n:]) == 1.0)
    # main head never returns demo values
    assert np.all(np.asarray(batch["x"][:-demo_n]) < 100.0)

    # priority update touches the main portion only (no crash on demo indices)
    state2 = buf.update(state, idx, jnp.abs(batch["x"]) + 1.0)
    assert state2.demo.size == state.demo.size


def test_demo_mixed_select_memory_demo_routes_collection():
    main = PriorityReplayBuffer(capacity=16, warmup_size=1)
    buf = DemoMixedReplayBuffer(main, demo_ratio=0.25, select_memory="demo")
    state = buf.init({"x": jnp.asarray(0.0)})
    state = buf.add_masked(state, {"x": jnp.ones((4,))}, jnp.ones((4,), bool))
    assert int(state.demo.size) == 4
    assert int(state.main.base.size) == 0


def test_dqn_memory_config_demo_flag():
    from simple_distributed_rl_tpu.algorithms.dqn import MemoryConfig

    cfg = MemoryConfig(enable_demo_memory=True, demo_ratio=1 / 4)
    cfg.set_proportional()
    buf = cfg.create()
    assert isinstance(buf, DemoMixedReplayBuffer)


def test_atari_processor_space_and_value():
    space = Box((210, 160, 3), 0, 255, jnp.uint8, SpaceTypes.COLOR)
    p = AtariProcessor(resize=(84, 84), grayscale=True)
    out_space = p.remap_space(space)
    assert out_space.shape == (84, 84, 1)
    x = jnp.ones((210, 160, 3), jnp.uint8) * 200
    y = p.remap(x)
    assert y.shape == (84, 84, 1) and y.dtype == jnp.uint8

    pong = AtariPongProcessor()
    out2 = pong.remap_space(space)
    assert out2.shape == (64, 64, 1)
    y2 = pong.remap(x)
    assert set(np.unique(np.asarray(y2))) <= {0, 255}


def test_muzero_atari_block_downsampling():
    blk = MuZeroAtariBlock(filters=32)
    params = blk.init(jax.random.PRNGKey(0), jnp.zeros((1, 96, 96, 4)))
    out = blk.apply(params, jnp.zeros((2, 96, 96, 4)))
    assert out.shape == (2, 6, 6, 64)  # 16x spatial reduction, 2*filters channels

    cfg = InputBlockConfig().set_muzero_atari_block(filters=32)
    space = Box((96, 96, 4), 0, 255, jnp.uint8, SpaceTypes.COLOR)
    m = cfg.create_block(space)
    assert isinstance(m, MuZeroAtariBlock)
