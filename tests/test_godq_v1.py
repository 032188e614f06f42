"""GoDQ_v1 tests (BYOL intrinsic + distributional dueling Q + alignment + archive)."""

import numpy as np
import pytest

import simple_distributed_rl_tpu as srl
from simple_distributed_rl_tpu.algorithms import GoDQv1Config, make


def _small(**kw):
    base = dict(
        base_units=32,
        batch_size=16,
        memory_warmup_size=50,
        memory_capacity=2000,
        reset_net_interval=0,
        discount=0.9,
    )
    base.update(kw)
    return make("GoDQ_v1", **base)


@pytest.mark.slow
def test_godq_v1_smoke_byol():
    r = srl.Runner("Grid", _small(), num_envs=8, seed=1)
    r.train(max_steps=2000, train_steps_per_chunk=4, progress=False)
    assert int(r.algo_state.train_count) > 0
    rewards = r.evaluate(4)
    assert np.isfinite(rewards).all()


@pytest.mark.slow
def test_godq_v1_rnd_and_episodic():
    cfg = _small(feat_type="", enable_int_episodic=True, episodic_memory_capacity=64)
    r = srl.Runner("Grid", cfg, num_envs=8, seed=1)
    r.train(max_steps=1500, train_steps_per_chunk=4, progress=False)
    assert int(r.algo_state.train_count) > 0
    # the RunningNorm initialized from real intrinsic errors
    assert bool(r.algo_state.norm_init)


@pytest.mark.slow
def test_godq_v1_q_only():
    cfg = _small(enable_int_q=False, feat_type="", enable_q_distribution=False,
                 enable_q_rescale=False)
    r = srl.Runner("Grid", cfg, num_envs=8, seed=1)
    r.train(max_steps=1500, train_steps_per_chunk=4, progress=False)
    rewards = r.evaluate(4)
    assert np.isfinite(rewards).all()


@pytest.mark.slow
def test_godq_v1_archive_restores():
    cfg = _small(enable_archive=True, archive_steps=5, archive_rate=0.8,
                 archive_max_buckets=8)
    r = srl.Runner("Grid", cfg, num_envs=16, seed=1)
    r.train(max_steps=8000, train_steps_per_chunk=4, progress=False)
    # snapshots stored into step buckets
    assert int(r.algo_state.occupied.sum()) >= 1


@pytest.mark.slow
def test_godq_v1_shrink_perturb_reset():
    cfg = _small(reset_net_interval=20)
    r = srl.Runner("Grid", cfg, num_envs=8, seed=1)
    r.train(max_steps=4000, train_steps_per_chunk=8, progress=False)
    assert int(r.algo_state.reset_count) >= 1


@pytest.mark.slow
def test_godq_v1_grid_baseline():
    cfg = GoDQv1Config(
        base_units=64, batch_size=32, lr=5e-4, discount=0.9,
        memory_warmup_size=500, reset_net_interval=0, epsilon=0.05,
    )
    r = srl.Runner("Grid", cfg, num_envs=32, seed=1)
    r.train(max_steps=200_000, train_steps_per_chunk=32, progress=False)
    rewards = r.evaluate(200)
    assert float(rewards[0]) >= 0.6


# ---------------------------------------------------------------------------
# GoDQ_v1_LSTM
# ---------------------------------------------------------------------------
def _small_lstm(**kw):
    base = dict(
        base_units=32, batch_size=8, memory_warmup_size=20, memory_capacity=500,
        reset_net_interval=0, discount=0.9, burnin=2, sequence_length=6,
    )
    base.update(kw)
    return make("GoDQ_v1_LSTM", **base)


@pytest.mark.slow
def test_godq_v1_lstm_smoke():
    cfg = _small_lstm()
    r = srl.Runner("Grid", cfg, num_envs=8, seed=1)
    r.train(max_steps=2000, train_steps_per_chunk=2, progress=False)
    assert int(r.algo_state.train_count) > 0
    rewards = r.evaluate(4)
    assert np.isfinite(rewards).all()


@pytest.mark.slow
def test_godq_v1_lstm_rnd():
    cfg = _small_lstm(feat_type="", enable_q_distribution=False)
    r = srl.Runner("Grid", cfg, num_envs=8, seed=1)
    r.train(max_steps=1500, train_steps_per_chunk=2, progress=False)
    assert int(r.algo_state.train_count) > 0
    assert bool(r.algo_state.norm_init)


@pytest.mark.slow
def test_godq_v1_lstm_pomdp_learns_signal():
    # Tiger needs memory; just verify the recurrent pipeline runs on a POMDP
    cfg = _small_lstm(enable_int_q=False, feat_type="")
    r = srl.Runner("Tiger", cfg, num_envs=8, seed=3)
    r.train(max_steps=2000, train_steps_per_chunk=2, progress=False)
    rewards = r.evaluate(4)
    assert np.isfinite(rewards).all()
