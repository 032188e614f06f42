"""QL_agent57 and SND tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import simple_distributed_rl_tpu as srl
from simple_distributed_rl_tpu.algorithms import QLAgent57Config, SNDConfig


@pytest.mark.slow
def test_qla57_smoke():
    r = srl.Runner("Grid", QLAgent57Config(actor_num=4), num_envs=8, seed=0)
    r.train(max_steps=2000, progress=False)
    rewards = r.evaluate(8)
    assert np.isfinite(rewards).all()
    # lifelong factors decayed for visited states
    assert float(r.algo_state.lifelong.min()) < 1.0


@pytest.mark.slow
def test_qla57_grid_baseline():
    r = srl.Runner("Grid", QLAgent57Config(), num_envs=128, seed=1)
    r.train(max_steps=600_000, progress=False)
    rewards = r.evaluate(300)
    assert float(rewards[0]) >= 0.65


def test_qla57_intrinsic_tables():
    r = srl.Runner("Grid", QLAgent57Config(actor_num=4), num_envs=8, seed=0)
    r.train(max_steps=3000, progress=False)
    # intrinsic Q table learned something nonzero
    assert float(jnp.abs(r.algo_state.q_int).max()) > 0


@pytest.mark.slow
def test_snd_smoke():
    cfg = SNDConfig()
    cfg.memory.capacity = 1000
    cfg.memory.warmup_size = 100
    r = srl.Runner("Grid", cfg, num_envs=8, seed=0)
    r.train(max_steps=2000, progress=False)
    rewards = r.evaluate(8)
    assert np.isfinite(rewards).all()


@pytest.mark.slow
def test_snd_intrinsic_changes_rewards():
    """Replay rewards must differ from raw env rewards when distillation is on."""
    cfg = SNDConfig(int_reward_scale=1.0)
    cfg.memory.capacity = 2000
    cfg.memory.warmup_size = 50
    r = srl.Runner("EasyGrid", cfg, num_envs=8, seed=0)
    r.train(max_steps=1000, progress=False)
    n = int(r.algo_state.memory.size)
    rews = np.asarray(r.algo_state.memory.data.reward[:n])
    # EasyGrid env rewards are {0, 1}; shaped rewards should rarely be exactly 0
    assert (np.abs(rews % 1.0) > 1e-6).mean() > 0.5


@pytest.mark.slow
def test_snd_grid_baseline_extrinsic():
    cfg = SNDConfig(discount=0.9, epsilon=0.2, batch_size=64,
                    target_model_update_interval=500, int_reward_scale=0.0, lr=1e-3)
    cfg.memory.capacity = 50_000
    cfg.memory.warmup_size = 1000
    r = srl.Runner("Grid", cfg, num_envs=128, seed=3)
    r.train(max_steps=1_000_000, train_steps_per_chunk=128, progress=False)
    rewards = r.evaluate(300)
    assert float(rewards[0]) >= 0.65
