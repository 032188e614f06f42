"""GoDynaQ / WorldModels / ConnectX / interactive-play tests."""

import io
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import simple_distributed_rl_tpu as srl
from simple_distributed_rl_tpu.algorithms import (
    GoDynaQConfig,
    QLConfig,
    WorldModelsConfig,
)


@pytest.mark.slow
def test_godynaq_grid_baseline():
    r = srl.Runner("Grid", GoDynaQConfig(), num_envs=64, seed=1)
    r.train(max_steps=100_000, train_steps_per_chunk=1, progress=False)
    assert int(r.algo_state.visited.sum()) >= 10  # archive covers the grid
    assert r.evaluate_compare_to_baseline_single_player(episodes=300)


def test_godynaq_oneroad_default_hypers():
    """The archive teleport solves OneRoad at DEFAULT hypers (plain SearchDynaQ
    needs tuning)."""
    r = srl.Runner("OneRoad", GoDynaQConfig(), num_envs=64, seed=1)
    r.train(max_steps=40_000, train_steps_per_chunk=1, progress=False)
    rewards = r.evaluate(100)
    assert float(rewards[0]) >= 0.9


@pytest.mark.slow
def test_world_models_smoke():
    cfg = WorldModelsConfig(batch_length=8, capacity=100, warmup_size=5)
    r = srl.Runner("Grid", cfg, num_envs=16, seed=0)
    r.train(max_steps=2000, train_steps_per_chunk=1, progress=False)
    rewards = r.evaluate(8)
    assert np.isfinite(rewards).all()
    assert int(r.algo_state.train_count) > 0


@pytest.mark.slow
def test_world_models_grid_learning():
    cfg = WorldModelsConfig(batch_length=16, capacity=500, warmup_size=20,
                            es_sigma=0.3, es_lr=0.3)
    r = srl.Runner("Grid", cfg, num_envs=256, seed=1)
    r.train(max_steps=450_000, train_steps_per_chunk=4, progress=False)
    rewards = r.evaluate(100)
    assert float(rewards[0]) >= 0.1


def test_connectx_rules():
    env = srl.make_env("ConnectX")
    state, ts = env.reset(jax.random.PRNGKey(0))
    # P1 stacks column 0, P2 column 1; P1 wins with 4 vertical
    for a, done in [(0, False), (1, False), (0, False), (1, False),
                    (0, False), (1, False), (0, True)]:
        state, ts = env.step(state, jnp.asarray(a), jax.random.PRNGKey(a))
        assert bool(ts.terminated) == done
    np.testing.assert_allclose(np.asarray(ts.rewards), [1.0, -1.0])


def test_connectx_column_fills_up():
    env = srl.make_env("ConnectX")
    state, ts = env.reset(jax.random.PRNGKey(0))
    # alternate in column 0 six times -> column full -> invalid
    for i in range(6):
        state, ts = env.step(state, jnp.asarray(0), jax.random.PRNGKey(i))
    assert bool(ts.invalid_mask[0])
    assert not bool(ts.invalid_mask[1])


def test_play_terminal_scripted():
    r = srl.Runner("OX", QLConfig(), num_envs=16, seed=0)
    r.train(max_steps=5000, progress=False)
    old = sys.stdin
    try:
        sys.stdin = io.StringIO("\n".join(str(i) for i in range(9)) + "\n")
        total = r.play_terminal(max_steps=12)
    finally:
        sys.stdin = old
    assert -1.0 <= total <= 1.0


def test_replay_window_headless():
    r = srl.Runner("Grid", QLConfig(), num_envs=8, seed=0)
    r.train(max_steps=1000, progress=False)
    frames = r.replay_window(max_steps=10)
    assert len(frames) >= 2
    assert frames[0].ndim == 3
