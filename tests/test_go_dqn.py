"""GoDQN tests (UCB archive + go modes + double DQN)."""

import numpy as np
import pytest

import simple_distributed_rl_tpu as srl
from simple_distributed_rl_tpu.algorithms import GoDQNConfig, make


@pytest.mark.slow
def test_go_dqn_smoke_and_archive():
    cfg = make("GoDQN", discount=0.9, memory_warmup_size=100)
    r = srl.Runner("Grid", cfg, num_envs=16, seed=1)
    r.train(max_steps=10_000, train_steps_per_chunk=8, progress=False)
    # Grid has 11 walkable cells; UCB-driven restores should find most of them
    assert int(r.algo_state.visited.sum()) >= 8
    # select counts accumulate only on visited cells
    sel = np.asarray(r.algo_state.select[:-1])
    visited = np.asarray(r.algo_state.visited[:-1])
    assert sel[~visited].sum() == 0
    # eval path runs in pure-DQN mode
    rewards = r.evaluate(8)
    assert np.isfinite(rewards).all()


@pytest.mark.slow
def test_go_dqn_restore_teleports():
    cfg = make("GoDQN", discount=0.9, memory_warmup_size=100)
    r = srl.Runner("Grid", cfg, num_envs=16, seed=1)
    r.train(max_steps=20_000, train_steps_per_chunk=8, progress=False)
    pos = np.asarray(r.carry.env_state.env_state.pos)
    assert len(np.unique(pos[:, 0] * 10 + pos[:, 1])) >= 4


@pytest.mark.slow
def test_go_dqn_grid_baseline():
    cfg = GoDQNConfig(
        discount=0.9, memory_warmup_size=500, epsilon=0.1, lr=1e-3,
        batch_size=64, target_model_update_interval=500, go_rate=0.5,
    )
    r = srl.Runner("Grid", cfg, num_envs=64, seed=1)
    # 500k: 300k left this seed borderline (0.46) after the round-3 encoded-
    # action-space exploration fix changed the RNG stream; measured 0.74 @500k
    r.train(max_steps=500_000, train_steps_per_chunk=64, progress=False)
    rewards = r.evaluate(300)
    assert float(rewards[0]) >= 0.65
