"""Nested-RLConfig opponent players (parity: RLConfig entries with own parameter in
the players list, srl/base/rl/registration.py:149-225)."""

import jax
import numpy as np
import pytest

jax.config.update("jax_platforms", "cpu")

import simple_distributed_rl_tpu as srl
from simple_distributed_rl_tpu.algorithms import QLConfig
from simple_distributed_rl_tpu.runner.engine import OPP0, resolve_players


def test_resolve_players_algo_config_specs():
    cfg = QLConfig()
    codes, opps = resolve_players([None, cfg], 2)
    assert codes == [0, OPP0]
    assert opps == [(cfg, None)]

    params = {"q": np.zeros(3)}
    codes, opps = resolve_players([None, (cfg, params)], 2)
    assert codes[1] == OPP0
    assert opps[0][1] is params

    with pytest.raises(ValueError):
        resolve_players([None, 123], 2)


@pytest.mark.slow
def test_train_and_eval_vs_algo_opponent():
    r = srl.Runner("OX", QLConfig(), num_envs=16, seed=2, players=[None, QLConfig()])
    r.train(max_steps=2_000, progress=False)
    rw = r.evaluate(16, players=[None, QLConfig()])
    assert rw.shape == (2,)
    assert np.isfinite(rw).all()


@pytest.mark.slow
def test_eval_vs_trained_params_opponent():
    r1 = srl.Runner("OX", QLConfig(), num_envs=32, seed=1)
    r1.train(max_steps=5_000, progress=False)
    params = jax.device_get(r1.algo.params_of(r1.algo_state))

    r2 = srl.Runner("OX", QLConfig(), num_envs=16, seed=3)
    rw = r2.evaluate(16, players=[None, (QLConfig(), params)])
    assert np.isfinite(rw).all()


@pytest.mark.slow
def test_recurrent_opponent_r2d2():
    """Recurrent (LSTM actor-state) algorithms as opponent players: the engine
    carries each opponent's per-env hidden in EngineState.opp_actor_states and
    advances it only on that opponent's turns."""
    from simple_distributed_rl_tpu.algorithms import R2D2Config

    opp = R2D2Config(burnin=2, sequence_length=4, lstm_units=16, warmup_size=10,
                     capacity=100)
    r = srl.Runner("OX", QLConfig(), num_envs=16, seed=5, players=[None, opp])
    assert r.carry.opp_actor_states[0] is not None  # LSTM hidden allocated
    r.train(max_steps=1_500, progress=False)
    rw = r.evaluate(16, players=[None, opp])
    assert np.isfinite(rw).all()


@pytest.mark.slow
def test_recurrent_opponent_with_trained_params():
    from simple_distributed_rl_tpu.algorithms import R2D2Config

    cfg = R2D2Config(burnin=2, sequence_length=4, lstm_units=16, warmup_size=10,
                     capacity=200)
    r1 = srl.Runner("OX", cfg, num_envs=16, seed=6)
    r1.train(max_steps=1_200, progress=False)
    params = jax.device_get(r1.algo.params_of(r1.algo_state))

    r2 = srl.Runner("OX", QLConfig(), num_envs=16, seed=7,
                    players=[None, (R2D2Config(burnin=2, sequence_length=4,
                                               lstm_units=16), params)])
    r2.train(max_steps=1_500, progress=False)
    rw = r2.evaluate(16)
    assert np.isfinite(rw).all()
