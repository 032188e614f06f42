"""Runner.train_only + rollout(max_memory=) — parity with the reference's
trainer-only mode (srl/runner/runner.py:254 train_only, :185 rollout;
base/run/core_train_only.py:12) and the offline rollout->train_only workflow
its DIAMOND recipe depends on (tests/algorithms_/base_diamond.py:53-77)."""

import numpy as np
import pytest

import simple_distributed_rl_tpu as srl
from simple_distributed_rl_tpu.algorithms import DQNConfig


def _dqn(batch_size=64):
    cfg = DQNConfig(lr=1e-3, discount=0.9, epsilon=1.0, batch_size=batch_size,
                    target_model_update_interval=500)
    cfg.memory.capacity = 100_000
    cfg.memory.warmup_size = 200
    return cfg


def test_rollout_max_memory_stops():
    r = srl.Runner("Grid", _dqn(), num_envs=32, seed=11)
    out = r.rollout(max_memory=2_000)
    assert out["memory_size"] >= 2_000
    # rollout never trains
    assert int(r.algo_state.train_count) == 0


def test_train_only_mechanics():
    r = srl.Runner("Grid", _dqn(), num_envs=32, seed=12)
    r.rollout(max_memory=1_000)
    stats = r.train_only(max_train_count=128, train_steps_per_call=32,
                         progress=False)
    assert int(r.algo_state.train_count) >= 128
    assert np.isfinite(stats.get("loss", 0.0))


def test_train_only_needs_stop_condition():
    r = srl.Runner("Grid", _dqn(), num_envs=8, seed=13)
    with pytest.raises(AssertionError):
        r.train_only(progress=False)
    with pytest.raises(AssertionError):
        r.rollout()


@pytest.mark.slow
def test_offline_rollout_train_only_beats_grid_baseline(tmp_path):
    """Offline DQN: random-policy rollout -> save memory -> fresh runner loads the
    memory -> train_only -> beats the Grid 0.65 baseline (the reference's
    rollout/train_only contract, srl/test/rl.py rollout->train_only case +
    envs/grid.py:25-30 baseline)."""
    r = srl.Runner("Grid", _dqn(batch_size=128), num_envs=128, seed=14)
    r.rollout(max_memory=100_000)
    p = str(tmp_path / "mem.pkl.xz")
    r.save_memory(p)

    r2 = srl.Runner("Grid", _dqn(batch_size=128), num_envs=128, seed=15)
    r2.load_memory(p)
    # 30k: at exactly 10k the offline value estimate is still settling for some
    # RNG streams (seen 0.33-0.73); 20k+ plateaus at ~0.73-0.74
    r2.train_only(max_train_count=30_000, train_steps_per_call=512,
                  progress=False)
    assert r2.evaluate_compare_to_baseline_single_player(episodes=500)


def test_train_max_train_count_is_per_call():
    """max_train_count counts THIS call's updates (parity: RunState.train_count
    restarts per play call, base/context.py:346) — staged recipes call train()
    after train_only() and must not stop instantly."""
    r = srl.Runner("Grid", _dqn(), num_envs=32, seed=21)
    r.rollout(max_memory=1_000)
    r.train_only(max_train_count=64, train_steps_per_call=32, progress=False)
    tc_mid = int(r.algo_state.train_count)
    assert tc_mid >= 64
    r.train(max_train_count=64, train_steps_per_chunk=32, progress=False)
    assert int(r.algo_state.train_count) >= tc_mid + 64
