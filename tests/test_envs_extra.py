"""SampleEnv / hungry_geese / Othello cpu worker / kaggle wrapper tests."""

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

import simple_distributed_rl_tpu as srl
from simple_distributed_rl_tpu.algorithms import QLConfig


@pytest.mark.slow
def test_sample_env_ql_learns():
    r = srl.Runner("SampleEnv", QLConfig(), num_envs=64, seed=1)
    r.train(max_steps=50_000, progress=False)
    rewards = r.evaluate(20)
    assert float(rewards[0]) > 0.5  # optimal is ~0.88 (4 steps right)
    r.render_terminal(max_steps=8)


def test_hungry_geese_rollout_invariants():
    e = srl.make_env("hungry_geese")
    step = jax.jit(e.step)
    k = jr.PRNGKey(0)
    s, ts = e.reset(k)
    assert ts.obs.shape == (77,)
    alive_counts = [4]
    for i in range(900):
        if bool(ts.done):
            break
        k, k1, k2 = jr.split(k, 3)
        logits = jnp.where(ts.invalid_mask, -jnp.inf, 0.0)
        a = jr.categorical(k1, logits)
        assert not bool(ts.invalid_mask[a])
        # rewards stay zero until the episode ends
        assert float(jnp.abs(ts.rewards).sum()) == 0.0
        s, ts = step(s, a, k2)
        alive_counts.append(int(s.alive.sum()))
    assert bool(ts.done)
    # geese never resurrect
    assert all(a >= b for a, b in zip(alive_counts, alive_counts[1:]))
    # rank rewards are zero-sum and bounded
    rw = np.asarray(ts.rewards)
    assert abs(rw.sum()) < 1e-5 and (np.abs(rw) <= 1.0).all()


@pytest.mark.slow
def test_hungry_geese_greedy_worker():
    e = srl.make_env("hungry_geese")
    k = jr.PRNGKey(1)
    s, ts = e.reset(k)
    pol = jax.jit(lambda s, t, k: e.worker_policy("greedy", s, t, k))
    a = pol(s, ts, k)
    assert 0 <= int(a) < 4
    # greedy respects the reverse-move invalid mask
    for seed in range(5):
        k = jr.PRNGKey(seed)
        s, ts = e.reset(k)
        for _ in range(40):
            if bool(ts.done):
                break
            k, k1, k2 = jr.split(k, 3)
            a = pol(s, ts, k1)
            assert not bool(ts.invalid_mask[a])
            s, ts = jax.jit(e.step)(s, a, k2)


@pytest.mark.slow
def test_hungry_geese_engine_training():
    r = srl.Runner(
        "hungry_geese", QLConfig(), num_envs=8,
        players=[None, "greedy", "greedy", "greedy"], seed=2,
    )
    r.train(max_steps=2_000, progress=False)
    rewards = r.evaluate(4)
    assert np.isfinite(np.asarray(rewards)).all()


def test_othello_cpu_beats_random():
    e = srl.make_env("Othello4x4")
    step = jax.jit(e.step)
    pol = jax.jit(lambda s, t, k: e.worker_policy("cpu", s, t, k))
    wins = draws = 0
    for seed in range(10):
        k = jr.PRNGKey(seed)
        s, ts = e.reset(k)
        for _ in range(60):
            if bool(ts.done):
                break
            k, k1, k2 = jr.split(k, 3)
            if int(ts.next_player) == 0:
                a = pol(s, ts, k1)
            else:
                a = jr.categorical(k1, jnp.where(ts.invalid_mask, -jnp.inf, 0.0))
            s, ts = step(s, a, k2)
        wins += float(ts.rewards[0]) > 0
        draws += float(ts.rewards[0]) == 0
    assert wins >= 6, (wins, draws)


@pytest.mark.slow
def test_env_worker_player_spec():
    r = srl.Runner("Othello4x4", QLConfig(), num_envs=16, players=[None, "cpu"], seed=1)
    r.train(max_steps=500, progress=False)
    rewards = r.evaluate(2)
    assert np.isfinite(np.asarray(rewards)).all()


def test_bad_player_spec_raises():
    with pytest.raises(ValueError):
        srl.Runner("Othello4x4", QLConfig(), num_envs=4, players=[None, "nosuch"], seed=1)


def test_kaggle_wrapper_gated():
    from simple_distributed_rl_tpu.envs import kaggle_wrapper

    if not kaggle_wrapper.is_available():
        with pytest.raises(Exception):
            kaggle_wrapper.KaggleWrapper("connectx", player_num=2)
    else:
        e = srl.make_env("kaggle_connectx")
        s, ts = e.reset(jr.PRNGKey(0))
        assert ts.obs.shape == (42,)
