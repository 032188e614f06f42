"""Data-parallel mesh tests on the 8-device virtual CPU mesh (the fake-mesh analog of
the reference's in-process mp tests, tests/quick_mp/base/run/test_play_mp.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import simple_distributed_rl_tpu as srl
from simple_distributed_rl_tpu.algorithms import DQNConfig, QLConfig
from simple_distributed_rl_tpu.parallel import DataParallelEngine, make_mesh


@pytest.fixture
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(8)


def test_dp_dqn_replicas_stay_identical(mesh8):
    env = srl.make_env("Grid")
    cfg = DQNConfig(discount=0.9)
    cfg.memory.capacity = 2000
    cfg.memory.warmup_size = 100
    cfg.setup(env)
    dp = DataParallelEngine(env, cfg, num_envs_per_shard=16, mesh=mesh8)
    carry = dp.init(jax.random.PRNGKey(0))
    fn = dp.build_chunk(8)
    for _ in range(3):
        carry, m = fn(carry)
    for leaf in jax.tree.leaves(cfg.params_of(carry.algo_state)["params"]):
        assert float(jnp.max(jnp.abs(leaf - leaf[0]))) == 0.0


def test_dp_ql_replicas_stay_identical(mesh8):
    env = srl.make_env("Grid")
    cfg = QLConfig()
    cfg.setup(env)
    dp = DataParallelEngine(env, cfg, num_envs_per_shard=16, mesh=mesh8)
    carry = dp.init(jax.random.PRNGKey(0))
    fn = dp.build_chunk(8)
    for _ in range(3):
        carry, m = fn(carry)
    q = carry.algo_state.q_table
    assert float(jnp.max(jnp.abs(q - q[0]))) == 0.0


def test_dp_envs_diverge_across_shards(mesh8):
    """Shards must explore independently (different PRNG streams)."""
    env = srl.make_env("Grid")
    cfg = QLConfig()
    cfg.setup(env)
    dp = DataParallelEngine(env, cfg, num_envs_per_shard=8, mesh=mesh8)
    carry = dp.init(jax.random.PRNGKey(0))
    fn = dp.build_chunk(8)
    carry, _ = fn(carry)
    pos = np.asarray(carry.env_state.env_state.pos)  # [shards, envs, 2]
    assert not np.all(pos == pos[0])


def test_dp_eval(mesh8):
    env = srl.make_env("Grid")
    cfg = QLConfig()
    cfg.setup(env)
    dp = DataParallelEngine(env, cfg, num_envs_per_shard=8, mesh=mesh8)
    carry = dp.init(jax.random.PRNGKey(0))
    ev = dp.build_eval(8)
    rewards, complete = ev(carry, jax.random.PRNGKey(1))
    assert rewards.shape == (1,)
    assert bool(complete)


def test_dp_learning_easygrid(mesh8):
    """End-to-end: data-parallel QL reaches the EasyGrid baseline."""
    env = srl.make_env("EasyGrid")
    cfg = QLConfig()
    cfg.setup(env)
    dp = DataParallelEngine(env, cfg, num_envs_per_shard=32, mesh=mesh8)
    carry = dp.init(jax.random.PRNGKey(0))
    fn = dp.build_chunk(16)
    for _ in range(60):
        carry, _ = fn(carry)
    ev = dp.build_eval(16)
    rewards, _ = ev(carry, jax.random.PRNGKey(1))
    assert float(rewards[0]) >= 0.85
