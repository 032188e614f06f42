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
