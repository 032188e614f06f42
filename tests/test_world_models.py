"""DreamerV3 / PlaNet / NoTarget variants tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import simple_distributed_rl_tpu as srl
from simple_distributed_rl_tpu.algorithms import (
    DreamerV3Config,
    NoTargetDQNConfig,
    NoTargetSACConfig,
    PlaNetConfig,
)


def _small_dreamer(**kw):
    return DreamerV3Config(
        batch_size=4, batch_length=8, horizon=5, capacity=200, warmup_size=10,
        deter=32, stoch=4, classes=4, discount=0.9, **kw
    )


@pytest.mark.slow
def test_dreamer_smoke():
    r = srl.Runner("EasyGrid", _small_dreamer(), num_envs=8, seed=0)
    r.train(max_steps=500, train_steps_per_chunk=2, progress=False)
    rewards = r.evaluate(8)
    assert np.isfinite(rewards).all()
    assert int(r.algo_state.train_count) > 0


@pytest.mark.slow
def test_dreamer_sequences_stored():
    r = srl.Runner("EasyGrid", _small_dreamer(), num_envs=8, seed=0)
    r.train(max_steps=400, train_steps_per_chunk=1, progress=False)
    n = int(r.algo_state.memory.size)
    assert n >= 8  # one sequence per env per chunk
    seq = jax.tree.map(lambda x: np.asarray(x[:n]), r.algo_state.memory.data)
    assert seq.obs.shape[1] == 8  # batch_length
    assert set(np.unique(seq.cont)) <= {0.0, 1.0}


@pytest.mark.slow
def test_dreamer_save_load():
    import os
    import tempfile

    r = srl.Runner("EasyGrid", _small_dreamer(), num_envs=4, seed=0)
    r.train(max_steps=200, train_steps_per_chunk=1, progress=False)
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "x.pkl.xz")
        r.save_parameter(p)
        r2 = srl.Runner("EasyGrid", _small_dreamer(), num_envs=4, seed=1)
        r2.load_parameter(p)


@pytest.mark.slow
def test_planet_smoke():
    cfg = PlaNetConfig(
        batch_size=4, batch_length=8, plan_horizon=4, num_candidates=16,
        capacity=200, warmup_size=10, deter=32, stoch=4, classes=4, discount=0.9,
    )
    r = srl.Runner("EasyGrid", cfg, num_envs=4, seed=0)
    r.train(max_steps=300, train_steps_per_chunk=1, progress=False)
    rewards = r.evaluate(4)
    assert np.isfinite(rewards).all()


@pytest.mark.slow
def test_dreamer_grid_learning():
    """Reference bar: Grid >= 0.4 @10 eps (base_dreamer_v3.py test_Grid:118) — the
    reference trains ~4k updates at deter 8/stoch 16x16, bar 0.4 not the env's 0.65.
    Measured 0.59 @300k env-steps with this recipe."""
    cfg = DreamerV3Config(deter=64, stoch=8, classes=8, batch_size=32, batch_length=8,
                          horizon=5, lr_wm=5e-4, lr_ac=3e-4, discount=0.9)
    r = srl.Runner("Grid", cfg, num_envs=64, seed=1)
    r.train(max_steps=300_000, progress=False)
    assert float(r.evaluate(100)[0]) >= 0.4


@pytest.mark.slow
def test_world_models_grid_learning():
    """Reference bar: Grid >= 0.3 @10 eps (base_world_models.py test_Grid:59 —
    the reference's staged VAE->RNN->controller recipe asserts baseline=0.3).
    Measured 0.42 @600k env-steps, default config."""
    from simple_distributed_rl_tpu.algorithms import WorldModelsConfig

    cfg = WorldModelsConfig()
    r = srl.Runner("Grid", cfg, num_envs=128, seed=1)
    r.train(max_steps=600_000, progress=False)
    assert float(r.evaluate(300)[0]) >= 0.3


@pytest.mark.slow
def test_planet_easygrid_learning():
    """Reference bar: EasyGrid >= 0.2 @5 eps (base_planet.py test_EasyGrid) — the
    CEM planner over the learned RSSM. Measured 1.0 @150k (vs EasyGrid optimal)."""
    cfg = PlaNetConfig()
    r = srl.Runner("EasyGrid", cfg, num_envs=64, seed=1)
    r.train(max_steps=150_000, progress=False)
    assert float(r.evaluate(40)[0]) >= 0.9


@pytest.mark.slow
def test_no_target_dqn_smoke():
    cfg = NoTargetDQNConfig()
    cfg.memory.capacity = 1000
    cfg.memory.warmup_size = 50
    r = srl.Runner("Grid", cfg, num_envs=8, seed=0)
    r.train(max_steps=2000, progress=False)
    rewards = r.evaluate(8)
    assert np.isfinite(rewards).all()
    # align targets (return-to-go) stored and bounded for Grid
    n = int(r.algo_state.memory.size)
    tr = np.asarray(r.algo_state.memory.data.total_reward[:n])
    assert n > 0 and np.abs(tr).max() <= 3.0


@pytest.mark.slow
def test_no_target_sac_smoke():
    cfg = NoTargetSACConfig()
    cfg.memory.capacity = 1000
    cfg.memory.warmup_size = 50
    r = srl.Runner("Pendulum-v1", cfg, num_envs=8, seed=0)
    r.train(max_steps=2000, progress=False)
    rewards = r.evaluate(8)
    assert np.isfinite(rewards).all()


@pytest.mark.slow
def test_dreamer_grid_learning():
    cfg = DreamerV3Config(
        batch_size=16, batch_length=16, horizon=12, capacity=2000, warmup_size=50,
        deter=64, stoch=8, classes=8, discount=0.95, lr_wm=3e-3, lr_ac=1e-3,
        entropy_coef=1e-2,
    )
    r = srl.Runner("Grid", cfg, num_envs=32, seed=1)
    r.train(max_steps=150_000, train_steps_per_chunk=16, progress=False)
    rewards = r.evaluate(100)
    assert float(rewards[0]) >= 0.4


@pytest.mark.slow
def test_no_target_dqn_grid_learning():
    """Reference bar: Grid >= 0.65 (grid.py:25-30). Measured 0.732 @200k after the
    round-2 episode-tracker fix (round 1 dropped chunk-crossing episodes)."""
    cfg = NoTargetDQNConfig(discount=0.9, lr=1e-3, hidden_sizes=(64, 64))
    cfg.memory.capacity = 20_000
    cfg.memory.warmup_size = 500
    cfg.epsilon_scheduler.set_linear(1.0, 0.1, 500)
    r = srl.Runner("Grid", cfg, num_envs=128, seed=3)
    r.train(max_steps=200_000, train_steps_per_chunk=64, progress=False)
    rewards = r.evaluate(300)
    assert float(rewards[0]) >= 0.65


@pytest.mark.slow
def test_no_target_dqn_pendulum_learning():
    """Reference recipe + bar (base_dqn_not.py test_Pendulum / Pendulum baseline
    -500, gymnasium_wrapper.py:327-329). Measured -290 @400k."""
    cfg = NoTargetDQNConfig(discount=0.9, lr=1e-3, hidden_sizes=(64, 64))
    cfg.memory.capacity = 50_000
    cfg.memory.warmup_size = 1000
    cfg.epsilon_scheduler.set_linear(1.0, 0.1, 500)
    r = srl.Runner("Pendulum-v1", cfg, num_envs=64, seed=1)
    r.train(max_steps=400_000, train_steps_per_chunk=64, progress=False)
    assert float(r.evaluate(32)[0]) >= -500.0


@pytest.mark.slow
def test_no_target_sac_pendulum_learning():
    """Reference bar: Pendulum >= -500 (base_sac_not.py test_Pendulum_continue).
    Measured -361 @200k."""
    cfg = NoTargetSACConfig(
        hidden_sizes=(128, 128, 128), lr_policy=3e-3, lr_q=3e-3, batch_size=64, discount=0.9
    )
    cfg.memory.capacity = 10_000
    cfg.memory.warmup_size = 1000
    r = srl.Runner("Pendulum-v1", cfg, num_envs=64, seed=1)
    r.train(max_steps=200_000, train_steps_per_chunk=64, progress=False)
    assert float(r.evaluate(32)[0]) >= -500.0
