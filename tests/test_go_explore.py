"""SearchDynaQ and Go-Explore tests (archive-restore engine hook)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import simple_distributed_rl_tpu as srl
from simple_distributed_rl_tpu.algorithms import GoExploreConfig, SearchDynaQConfig, make


@pytest.mark.slow
def test_search_dynaq_smoke():
    r = srl.Runner("Grid", SearchDynaQConfig(), num_envs=8, seed=0)
    r.train(max_steps=2000, train_steps_per_chunk=1, progress=False)
    rewards = r.evaluate(8)
    assert np.isfinite(rewards).all()
    # the learned model captured transitions
    assert float(r.algo_state.cnt.sum()) > 0


def test_search_dynaq_grid_baseline():
    r = srl.Runner("Grid", SearchDynaQConfig(), num_envs=64, seed=1)
    r.train(max_steps=100_000, train_steps_per_chunk=1, progress=False)
    assert r.evaluate_compare_to_baseline_single_player(episodes=300)


def test_search_dynaq_oneroad():
    cfg = SearchDynaQConfig(action_ucb_penalty_rate=0.5, q_int_discount=0.99)
    r = srl.Runner("OneRoad", cfg, num_envs=64, seed=1)
    r.train(max_steps=60_000, train_steps_per_chunk=1, progress=False)
    rewards = r.evaluate(100)
    assert float(rewards[0]) >= 0.9


@pytest.mark.slow
def test_go_explore_smoke_and_archive():
    cfg = make("Go-Explore", discount=0.9, memory_warmup_size=100)
    r = srl.Runner("Grid", cfg, num_envs=16, seed=1)
    r.train(max_steps=10_000, train_steps_per_chunk=8, progress=False)
    # Grid has exactly 11 walkable cells — the archive should find most of them
    assert int(r.algo_state.visited.sum()) >= 8
    # snapshots hold restorable states: best_step finite where visited
    visited = np.asarray(r.algo_state.visited[:-1])
    steps = np.asarray(r.algo_state.best_step[:-1])
    assert np.isfinite(steps[visited]).all()


def test_go_explore_restore_actually_teleports():
    """With restore active, early-episode states should be spread across the grid
    rather than concentrated at the start cell."""
    cfg = make("Go-Explore", discount=0.9, memory_warmup_size=100)
    r = srl.Runner("Grid", cfg, num_envs=16, seed=1)
    r.train(max_steps=20_000, train_steps_per_chunk=8, progress=False)
    # sample current env positions: after many restores they should be diverse
    pos = np.asarray(r.carry.env_state.env_state.pos)
    assert len(np.unique(pos[:, 0] * 10 + pos[:, 1])) >= 4


@pytest.mark.slow
def test_go_explore_grid_baseline():
    cfg = make(
        "Go-Explore", discount=0.9, memory_warmup_size=500, epsilon=0.1, lr=1e-3,
        batch_size=64, target_model_update_interval=500,
    )
    cfg.memory_capacity = 50_000
    r = srl.Runner("Grid", cfg, num_envs=64, seed=1)
    r.train(max_steps=300_000, train_steps_per_chunk=64, progress=False)
    rewards = r.evaluate(300)
    assert float(rewards[0]) >= 0.65
