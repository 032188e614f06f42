"""EfficientZeroV2 tests (LSTM value-prefix dynamics + consistency + gumbel)."""

import jax.numpy as jnp
import numpy as np
import pytest

import simple_distributed_rl_tpu as srl
from simple_distributed_rl_tpu.algorithms import EfficientZeroV2Config, make


def _small(**kw):
    base = dict(
        num_simulations=8, num_top_actions=2, unroll_steps=3, batch_size=8,
        warmup_size=30, capacity=2000, latent_dim=16, lstm_units=16,
        value_bins=21, v_min=-3.0, v_max=3.0, discount=0.9,
        policy_tau_points=((500, 1.0),), policy_tau_final=0.25,
    )
    base.update(kw)
    return make("EfficientZeroV2", **base)


@pytest.mark.slow
def test_ez2_smoke():
    r = srl.Runner("EasyGrid", _small(), num_envs=8, seed=1)
    r.train(max_steps=1200, train_steps_per_chunk=2, progress=False)
    assert int(r.algo_state.train_count) > 0
    rewards = r.evaluate(4)
    assert np.isfinite(rewards).all()
    # global soft-minmax bounds were tracked
    assert float(r.algo_state.q_min) < float(r.algo_state.q_max)


@pytest.mark.slow
def test_ez2_no_gumbel_and_full_expansion():
    cfg = _small(enable_gumbel_search=False, num_top_actions=4)
    r = srl.Runner("EasyGrid", cfg, num_envs=8, seed=1)
    r.train(max_steps=800, train_steps_per_chunk=2, progress=False)
    rewards = r.evaluate(4)
    assert np.isfinite(rewards).all()


@pytest.mark.slow
def test_ez2_consistency_off():
    cfg = _small(consistency_loss_coeff=0.0)
    r = srl.Runner("EasyGrid", cfg, num_envs=8, seed=2)
    r.train(max_steps=800, train_steps_per_chunk=2, progress=False)
    assert int(r.algo_state.train_count) > 0


@pytest.mark.slow
def test_ez2_easygrid_baseline():
    """EasyGrid >= 0.9, the reference's own bar (base_efficient_zero_v2.py:54-65:
    20 simulations, lr 1e-3, unroll 2, warmup 100, 2000 trains on the EasyGrid
    env baseline grid.py:44-52). Measured 1.0 @~4.7k trains."""
    cfg = EfficientZeroV2Config(
        num_simulations=20, num_top_actions=4, unroll_steps=2, batch_size=32,
        warmup_size=100, latent_dim=32, lstm_units=32, value_bins=41,
        v_min=-3.0, v_max=3.0, discount=0.9, lr=1e-3,
        policy_tau_points=((20_000, 1.0), (40_000, 0.5)),
    )
    r = srl.Runner("EasyGrid", cfg, num_envs=16, seed=1)
    r.train(max_steps=150_000, train_steps_per_chunk=16, progress=False)
    rewards = r.evaluate(100)
    assert float(rewards[0]) >= 0.9


@pytest.mark.slow
def test_ez2_continuous_smoke():
    """Sampled-candidate continuous search (mcts.py Node.expand continuous
    branch): candidates per node, squashed-gaussian NLL policy loss."""
    cfg = EfficientZeroV2Config(
        num_simulations=8, num_top_actions=4, batch_size=8, capacity=500,
        warmup_size=20, unroll_steps=3, latent_dim=16, lstm_units=16,
        value_bins=21, v_min=-20.0, v_max=5.0, discount=0.99,
    )
    r = srl.Runner("Pendulum-v1", cfg, num_envs=8, seed=0)
    r.train(max_steps=2048, chunk_steps=256, train_steps_per_chunk=4, progress=False)
    rewards = r.evaluate(4)
    assert np.isfinite(rewards).all()
    assert int(r.algo_state.train_count) > 0
    # actions stored at env scale as float vectors
    assert r.algo_state.memory.data.actions.dtype == jnp.float32


@pytest.mark.slow
def test_ez2_continuous_action_range():
    cfg = EfficientZeroV2Config(
        num_simulations=4, num_top_actions=4, batch_size=4, capacity=100,
        warmup_size=10, unroll_steps=2, latent_dim=8, lstm_units=8, value_bins=11,
    )
    r = srl.Runner("Pendulum-v1", cfg, num_envs=4, seed=1)
    r.train(max_steps=512, chunk_steps=256, train_steps_per_chunk=1, progress=False)
    n = int(r.algo_state.memory.size)
    acts = np.asarray(r.algo_state.memory.data.actions[:n])
    assert acts.min() >= -2.0 - 1e-5 and acts.max() <= 2.0 + 1e-5
