"""MCTS / DynaQ / processors / public harness tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import simple_distributed_rl_tpu as srl
from simple_distributed_rl_tpu import testing
from simple_distributed_rl_tpu.algorithms import DynaQConfig, MCTSConfig, QLConfig


def test_mcts_smoke_and_stats_persist():
    cfg = MCTSConfig(num_simulations=3, expansion_threshold=2)
    r = srl.Runner("Grid", cfg, num_envs=4, seed=0)
    r.train(max_steps=200, progress=False)
    assert float(r.algo_state.N.sum()) > 0  # search statistics accumulated


@pytest.mark.slow
def test_mcts_stone_taking_beats_random():
    """Reference baseline: P1 >= 0.9 vs random @200 ep (srl/envs/stone_taking.py:44-48)."""
    cfg = MCTSConfig(num_simulations=10, expansion_threshold=5)
    r = srl.Runner("StoneTaking", cfg, num_envs=32, seed=1, players=[None, "random"])
    r.train(max_steps=20_000, progress=False)
    rewards = r.evaluate(200, players=[None, "random"])
    assert float(rewards[0]) >= 0.9


@pytest.mark.slow
def test_dynaq_grid_baseline():
    r = srl.Runner("Grid", DynaQConfig(), num_envs=64, seed=1)
    r.train(max_steps=200_000, progress=False)
    assert r.evaluate_compare_to_baseline_single_player(episodes=300)


def test_dynaq_model_learns_transitions():
    r = srl.Runner("EasyGrid", DynaQConfig(), num_envs=16, seed=0)
    r.train(max_steps=5000, progress=False)
    st = r.algo_state
    # deterministic EasyGrid: each visited (s,a) maps to exactly one next state
    visited = np.asarray(st.cnt) > 0
    trans = np.asarray(st.trans)
    for s, a in zip(*np.nonzero(visited)):
        nz = np.count_nonzero(trans[s, a])
        assert nz == 1, (s, a, nz)


def test_image_processor():
    from simple_distributed_rl_tpu.define import SpaceTypes
    from simple_distributed_rl_tpu.processors import ImageProcessor, apply_processors
    from simple_distributed_rl_tpu.spaces import Box

    space = Box((64, 48, 3), 0, 255, jnp.uint8, SpaceTypes.COLOR)
    out_space, fn = apply_processors(space, [ImageProcessor(resize=(84, 84), grayscale=True)])
    assert out_space.shape == (84, 84, 1)
    x = jnp.ones((64, 48, 3), jnp.uint8) * 128
    y = fn(x)
    assert y.shape == (84, 84, 1)
    assert y.dtype == jnp.uint8
    np.testing.assert_allclose(np.asarray(y).mean(), 128, atol=2)


def test_normalize_processor():
    from simple_distributed_rl_tpu.processors import NormalizeProcessor, apply_processors
    from simple_distributed_rl_tpu.spaces import Box

    space = Box((4,), -2.0, 2.0)
    out_space, fn = apply_processors(space, [NormalizeProcessor()])
    y = fn(jnp.asarray([-2.0, 0.0, 2.0, 1.0]))
    np.testing.assert_allclose(np.asarray(y), [0.0, 0.5, 1.0, 0.75])


def test_algo_processors_pipeline():
    """Processors plug into the algorithm's obs encode path."""
    from simple_distributed_rl_tpu.processors import NormalizeProcessor

    cfg = QLConfig()
    cfg.processors = []  # QL on discrete obs: no processors, just check plumbing
    env = srl.make_env("CartPole-v1")
    from simple_distributed_rl_tpu.algorithms import DQNConfig

    cfg2 = DQNConfig(processors=[NormalizeProcessor()])
    cfg2.memory.capacity = 256
    cfg2.memory.warmup_size = 32
    r = srl.Runner(env, cfg2, num_envs=4, seed=0)
    r.train(max_steps=200, progress=False)
    assert float(cfg2.obs_space.high) == 1.0


@pytest.mark.slow
def test_public_check_env_catches_good_envs():
    testing.check_env(srl.make_env("Grid"), steps=50)
    testing.check_env(srl.make_env("OX"), steps=50)


def test_public_check_algorithm():
    testing.check_algorithm(QLConfig(), "Grid", train_steps=500)
