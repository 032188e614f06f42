"""MuZero tests: latent search, absorbing-window construction, learning signal."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import simple_distributed_rl_tpu as srl
from simple_distributed_rl_tpu.algorithms import MuZeroConfig


@pytest.mark.slow
def test_mz_smoke():
    cfg = MuZeroConfig(num_simulations=6, capacity=500, warmup_size=50, unroll_steps=2)
    r = srl.Runner("EasyGrid", cfg, num_envs=8, seed=0)
    r.train(max_steps=800, progress=False)
    assert int(r.algo_state.memory.size) > 0
    rewards = r.evaluate(8)
    assert np.isfinite(rewards).all()


@pytest.mark.slow
def test_mz_window_targets():
    cfg = MuZeroConfig(num_simulations=6, capacity=2000, warmup_size=50, unroll_steps=3,
                       discount=0.9)
    r = srl.Runner("EasyGrid", cfg, num_envs=8, seed=0)
    r.train(max_steps=1500, progress=False)
    n = int(r.algo_state.memory.size)
    data = r.algo_state.memory.data
    pol = np.asarray(data.policies[:n])  # [n, K+1, A]
    np.testing.assert_allclose(pol.sum(-1), 1.0, atol=1e-4)
    z = np.asarray(data.z[:n])
    assert np.isfinite(z).all()
    # EasyGrid rewards are 0 except +-1 terminal; z at k=0 bounded
    assert np.abs(z).max() <= 1.0 + 1e-5


@pytest.mark.slow
def test_mz_learned_model_consistency():
    """After training, the dynamics reward head should predict ~0 rewards for
    mid-grid moves on EasyGrid (all move rewards are 0)."""
    cfg = MuZeroConfig(num_simulations=8, capacity=5000, warmup_size=100, unroll_steps=2,
                       discount=0.9, lr=2e-3)
    r = srl.Runner("EasyGrid", cfg, num_envs=32, seed=1)
    r.train(max_steps=20_000, train_steps_per_chunk=64, progress=False)
    params = r.algo_state.params
    obs = jnp.asarray([[1.0, 3.0]])  # start cell
    latent = cfg.repr_net.apply(params["repr"], obs)
    _, r_logits = cfg.dyn_net.apply(params["dyn"], latent, jax.nn.one_hot(jnp.asarray([0]), 4))
    pred_r = cfg._decode_bins(r_logits)
    assert abs(float(pred_r[0])) < 0.5  # move reward is 0


@pytest.mark.slow
def test_mz_easygrid_learning():
    """Reference bar: EasyGrid >= 0.9 (grid.py:44-52), with the reference recipe
    scale (base_muzero.py test_EasyGrid: 50 simulations, lr 1e-3, batch 32).
    Measured 1.0 @200k."""
    cfg = MuZeroConfig(num_simulations=50, capacity=20_000, warmup_size=300,
                       unroll_steps=3, discount=0.9, lr=1e-3, v_min=-2.0, v_max=2.0,
                       batch_size=32)
    r = srl.Runner("EasyGrid", cfg, num_envs=64, seed=1)
    r.train(max_steps=200_000, train_steps_per_chunk=32, progress=False)
    rewards = r.evaluate(100)
    assert float(rewards[0]) >= 0.9


@pytest.mark.slow
def test_stochastic_muzero_smoke():
    from simple_distributed_rl_tpu.algorithms import StochasticMuZeroConfig

    cfg = StochasticMuZeroConfig(num_simulations=6, capacity=500, warmup_size=50,
                                 unroll_steps=2, num_codes=4, discount=0.9)
    r = srl.Runner("Grid", cfg, num_envs=8, seed=0)
    r.train(max_steps=1000, progress=False)
    rewards = r.evaluate(8)
    assert np.isfinite(rewards).all()
    assert int(r.algo_state.train_count) > 0
    # next-obs windows stored for the chance encoder
    n = int(r.algo_state.memory.size)
    assert r.algo_state.memory.data.next_obs.shape[1] == 2


@pytest.mark.slow
def test_stochastic_muzero_grid_layer_baseline():
    """Grid-layer >= 0.4, the reference's own bar for StochasticMuZero
    (base_stochastic_muzero.py:54-58: 10 sims, batch 16, unroll 2, codebook 4,
    value/reward range (-2,2), 5000 trains). Measured 0.61 @10k trains."""
    from simple_distributed_rl_tpu.algorithms import StochasticMuZeroConfig

    cfg = StochasticMuZeroConfig(
        num_simulations=10, batch_size=16, unroll_steps=2, num_codes=4,
        discount=0.9, lr=1e-3, v_min=-2.0, v_max=2.0, capacity=20_000,
        warmup_size=100,
    )
    r = srl.Runner("Grid-layer", cfg, num_envs=32, seed=1)
    r.train(max_train_count=10_000, max_steps=2_000_000,
            train_steps_per_chunk=16, progress=False)
    rewards = r.evaluate(200)
    assert float(rewards[0]) >= 0.4
