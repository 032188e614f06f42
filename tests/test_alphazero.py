"""AlphaZero tests: search sanity, learning on OX vs random."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import simple_distributed_rl_tpu as srl
from simple_distributed_rl_tpu.algorithms import AlphaZeroConfig


@pytest.mark.slow
def test_az_smoke():
    cfg = AlphaZeroConfig(num_simulations=8, capacity=500, warmup_size=50)
    r = srl.Runner("StoneTaking", cfg, num_envs=8, seed=0, players=[None, "random"])
    r.train(max_steps=600, progress=False)
    assert int(r.algo_state.memory.size) > 0
    rewards = r.evaluate(16, players=[None, "random"])
    assert np.isfinite(rewards).all()


@pytest.mark.slow
def test_az_value_targets_in_range():
    cfg = AlphaZeroConfig(num_simulations=8, capacity=2000, warmup_size=50)
    r = srl.Runner("OX", cfg, num_envs=8, seed=0)
    r.train(max_steps=1500, progress=False)
    n = int(r.algo_state.memory.size)
    z = np.asarray(r.algo_state.memory.data.z[:n])
    assert (np.abs(z) <= 1.0 + 1e-5).all()  # OX returns in [-1, 1]
    pi = np.asarray(r.algo_state.memory.data.policy[:n])
    np.testing.assert_allclose(pi.sum(-1), 1.0, atol=1e-4)


@pytest.mark.slow
def test_az_search_prefers_winning_move():
    """Hand-positioned OX board: P1 to move with two in a row — search must find the
    winning cell."""
    from simple_distributed_rl_tpu.envs.board_games import OXState

    cfg = AlphaZeroConfig(num_simulations=64)
    env = srl.make_env("OX")
    cfg.setup(env)
    state = cfg.init(jax.random.PRNGKey(0))
    # board: P1 has 0, 1; cell 2 wins. P2 has 3, 4.
    field = jnp.asarray([1, 1, 0, -1, -1, 0, 0, 0, 0], jnp.int32)
    ox = OXState(field=field, next_player=jnp.asarray(0, jnp.int32))
    ts = env._ts(ox, jnp.zeros(2), jnp.asarray(False))
    batched_state = jax.tree.map(lambda x: x[None], ox)
    batched_ts = jax.tree.map(lambda x: x[None], ts)
    counts, v0, _, _ = cfg._search(
        state.params, batched_state, batched_ts, state.q_min, state.q_max,
        jax.random.PRNGKey(1), jnp.asarray(False),
    )
    # with an untrained net the search must still find the immediate win
    assert int(np.argmax(np.asarray(counts)[0])) == 2, np.asarray(counts)


@pytest.mark.slow
def test_az_ox_beats_random():
    cfg = AlphaZeroConfig(
        num_simulations=24, capacity=20_000, warmup_size=500, sampling_steps=4, lr=1e-3
    )
    r = srl.Runner("OX", cfg, num_envs=64, seed=1, players=[None, "random"])
    r.train(max_steps=80_000, train_steps_per_chunk=64, progress=False)
    rewards = r.evaluate(200, players=[None, "random"])
    assert float(rewards[0]) >= 0.8
