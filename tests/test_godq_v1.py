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
    """Grid >= 0.65 (the reference's own bar, base_godq_v1.py:35-43 via
    envs/grid.py:25-30), BYOL feat, no archive."""
    cfg = GoDQv1Config(
        base_units=64, batch_size=64, lr=1e-3, discount=0.9,
        memory_warmup_size=500, reset_net_interval=0, epsilon=0.1,
    )
    r = srl.Runner("Grid", cfg, num_envs=32, seed=1)
    r.train(max_steps=200_000, train_steps_per_chunk=32, progress=False)
    rewards = r.evaluate(500)
    assert float(rewards[0]) >= 0.65


@pytest.mark.slow
def test_godq_v1_grid_baseline_byol_archive():
    """Grid >= 0.65 with the reference's second parametrization
    (base_godq_v1.py:36 ["BYOL", True]): BYOL feat + go-explore archive."""
    cfg = GoDQv1Config(
        base_units=64, batch_size=32, lr=5e-4, discount=0.9,
        memory_warmup_size=500, reset_net_interval=0, epsilon=0.05,
        align_loss_coeff=0.1, feat_type="BYOL", enable_archive=True,
    )
    r = srl.Runner("Grid", cfg, num_envs=32, seed=1)
    r.train(max_steps=200_000, train_steps_per_chunk=32, progress=False)
    rewards = r.evaluate(500)
    assert float(rewards[0]) >= 0.65


@pytest.mark.slow
def test_godq_v1_pendulum_baseline():
    """Pendulum >= -500 (reference: base_godq_v1.py:44-50, gym baseline via
    gymnasium_wrapper.py:327-329). Requires the encoded-action-space head fix
    (round 3); measured -316 with this recipe."""
    cfg = GoDQv1Config(base_units=64, batch_size=64, lr=1e-3, discount=0.9,
                       memory_warmup_size=1000, reset_net_interval=0, epsilon=0.1)
    r = srl.Runner("Pendulum-v1", cfg, num_envs=64, seed=1)
    r.train(max_steps=600_000, train_steps_per_chunk=64, progress=False)
    rewards = r.evaluate(100)
    assert float(rewards[0]) >= -500.0


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
def test_godq_v1_lstm_grid_baseline():
    """Grid >= 0.3, the reference's LSTM-variant bar (base_godq_v1_lstm.py:49-56,
    BYOL defaults). Measured 0.75 with this recipe."""
    cfg = make("GoDQ_v1_LSTM", base_units=64, batch_size=32, lr=1e-3, discount=0.9,
               burnin=2, sequence_length=6, reset_net_interval=0,
               memory_warmup_size=100, epsilon=0.1)
    r = srl.Runner("Grid", cfg, num_envs=32, seed=1)
    r.train(max_steps=200_000, train_steps_per_chunk=8, progress=False)
    rewards = r.evaluate(300)
    assert float(rewards[0]) >= 0.3


@pytest.mark.slow
def test_godq_v1_lstm_pendulum_baseline():
    """Pendulum >= -500, the reference's LSTM-variant bar
    (base_godq_v1_lstm.py:58-64: discount .9, lr 1e-3). Measured -431 with this
    recipe (int-Q off — the intrinsic mix hurts on a dense-reward control task)."""
    cfg = make("GoDQ_v1_LSTM", base_units=128, batch_size=64, lr=1e-3,
               discount=0.9, burnin=2, sequence_length=6, reset_net_interval=0,
               memory_warmup_size=100, epsilon=0.05, enable_int_q=False,
               feat_type="")
    r = srl.Runner("Pendulum-v1", cfg, num_envs=64, seed=1)
    r.train(max_steps=1_000_000, train_steps_per_chunk=24, progress=False)
    rewards = r.evaluate(100)
    assert float(rewards[0]) >= -500.0


@pytest.mark.slow
def test_godq_v1_lstm_tiger_baseline():
    """Tiger (POMDP) >= -0.1, the reference's own bar for the LSTM variant
    (base_godq_v1_lstm.py:36-47: units 64, feat '', no int_q, no resets) — the
    recurrent state must carry the listen observations to beat it. Measured
    +0.04 with this recipe."""
    cfg = make("GoDQ_v1_LSTM", base_units=64, batch_size=32, lr=1e-3, discount=0.9,
               burnin=0, sequence_length=4, feat_type="", enable_int_q=False,
               reset_net_interval=0, memory_warmup_size=100, epsilon=0.1)
    r = srl.Runner("Tiger", cfg, num_envs=32, seed=1)
    r.train(max_steps=150_000, train_steps_per_chunk=8, progress=False)
    rewards = r.evaluate(500)
    assert float(rewards[0]) >= -0.1

def test_godq_v1_mc_pend_window():
    """mc_pend_rows > 0: rows are emitted one chunk LATE with a two-chunk
    reward-to-go window (godq_v1.py observe). Checks the emission delay
    against the immediate-emission run and that training proceeds."""
    chunk, envs = 4, 4
    rows_per_chunk = chunk * 2  # T1 + episode-flush slots per env

    def run(pend):
        cfg = _small(mc_pend_rows=pend, memory_warmup_size=10, batch_size=8)
        r = srl.Runner("Pendulum-v1", cfg, num_envs=envs, seed=3)
        sizes = []
        for _ in range(4):
            r.train(max_steps=envs * chunk, chunk_steps=chunk,
                    train_steps_per_chunk=4, progress=False)
            sizes.append(r.memory_size())
        return r, sizes

    r0, sizes0 = run(0)
    r1, sizes1 = run(rows_per_chunk)
    # first chunk: delayed run has emitted nothing yet
    assert sizes1[0] == 0 and sizes0[0] > 0
    # steady state: delayed run trails by exactly one chunk of valid rows
    assert sizes1[-1] == sizes0[-2]
    assert int(r1.algo_state.train_count) > 0
    # the held-back window's targets are finite
    tr = np.asarray(r1.algo_state.memory.data.total_reward)
    assert np.isfinite(tr).all()
