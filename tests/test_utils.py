"""Scheduler + RL math tests (parity model: tests/quick scheduler/processor units)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simple_distributed_rl_tpu.utils import rl_functions as funcs
from simple_distributed_rl_tpu.utils import schedulers


def test_linear_schedule():
    f = schedulers.linear(1.0, 0.1, 100)
    assert float(f(jnp.asarray(0))) == pytest.approx(1.0)
    assert float(f(jnp.asarray(50))) == pytest.approx(0.55)
    assert float(f(jnp.asarray(1000))) == pytest.approx(0.1)


def test_cosine_schedule():
    f = schedulers.cosine(1.0, 0.0, 100)
    assert float(f(jnp.asarray(0))) == pytest.approx(1.0)
    assert float(f(jnp.asarray(100))) == pytest.approx(0.0, abs=1e-6)


def test_scheduler_config():
    cfg = schedulers.SchedulerConfig().set_linear(1.0, 0.0, 10)
    f = cfg.create(0.5)
    assert float(f(jnp.asarray(5))) == pytest.approx(0.5)
    cfg2 = schedulers.SchedulerConfig()
    f2 = cfg2.create(0.3)
    assert float(f2(jnp.asarray(99))) == pytest.approx(0.3)


def test_chain_schedule():
    f = schedulers.chain([(0, schedulers.constant(1.0)), (10, schedulers.linear(1.0, 0.0, 10))])
    assert float(f(jnp.asarray(5))) == 1.0
    assert float(f(jnp.asarray(15))) == pytest.approx(0.5)


def test_rescaling_inverse():
    x = jnp.linspace(-10, 10, 41)
    y = funcs.inverse_rescaling(funcs.rescaling(x))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-3)


def test_symlog_symexp():
    x = jnp.linspace(-5, 5, 21)
    np.testing.assert_allclose(np.asarray(funcs.symexp(funcs.symlog(x))), np.asarray(x), atol=1e-5)


def test_twohot_roundtrip():
    x = jnp.asarray([0.3, -1.7, 4.0])
    probs = funcs.twohot_encode(x, 51, -5.0, 5.0)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-6)
    back = funcs.twohot_decode(probs, 51, -5.0, 5.0)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-5)


def test_random_max_index_tiebreak():
    q = jnp.asarray([[1.0, 1.0, 0.0, 1.0]])
    invalid = jnp.asarray([[False, False, False, True]])
    seen = set()
    for i in range(50):
        a = funcs.random_max_index(q, invalid, jax.random.PRNGKey(i))
        seen.add(int(a[0]))
    assert seen == {0, 1}  # 3 invalid, 2 not max


def test_epsilon_greedy_respects_mask():
    q = jnp.zeros((8, 4))
    invalid = jnp.tile(jnp.asarray([True, False, True, False]), (8, 1))
    for i in range(10):
        a = funcs.epsilon_greedy(q, invalid, jnp.asarray(1.0), jax.random.PRNGKey(i))
        assert np.isin(np.asarray(a), [1, 3]).all()


def test_actor_ladders():
    eps = funcs.agent57_epsilon_list(32)
    assert eps.shape == (32,)
    assert eps[0] > eps[-1]
    betas = funcs.agent57_beta_list(32)
    assert betas[0] == 0.0 and betas[-1] == pytest.approx(0.3)
    gammas = funcs.agent57_gamma_list(32)
    assert gammas[0] == pytest.approx(0.9999) and gammas[-1] == pytest.approx(0.99)
