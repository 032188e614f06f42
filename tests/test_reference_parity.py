"""Exact-parity regression vs the reference implementation (BASELINE.md: "QL tabular
on Grid — exact trajectory/return match vs reference under fixed seed"). Runs the
actual reference package from /root/reference side by side."""

import os

import pytest

pytestmark = pytest.mark.skipif(
    not os.path.exists("/root/reference/srl"), reason="reference not mounted"
)


@pytest.mark.parametrize("seed", [1, 7, 42])
def test_ql_grid_exact_trajectory_parity(seed):
    from simple_distributed_rl_tpu.parity import (
        run_parity_ql_grid,
        run_reference_ql_grid,
    )

    steps = 1500
    ref_traj, ref_q = run_reference_ql_grid(seed=seed, max_steps=steps)
    our_traj, our_q = run_parity_ql_grid(seed=seed, max_steps=steps)

    assert len(ref_traj) == len(our_traj) == steps
    for i, (a, b) in enumerate(zip(ref_traj, our_traj)):
        assert (a[0], a[1], a[3]) == (b[0], b[1], b[3]), f"step {i}: {a} != {b}"
        assert abs(a[2] - b[2]) < 1e-12, f"step {i} reward: {a[2]} != {b[2]}"

    # learned Q tables identical to the last bit
    keys = set(ref_q) | set(our_q)
    for k in keys:
        ra = ref_q.get(k, [0.0] * 4)
        rb = our_q.get(k, [0.0] * 4)
        for a in range(4):
            assert ra[a] == rb[a], f"Q[{k}][{a}]: {ra[a]} != {rb[a]}"


def test_parity_returns_match():
    """Episode returns derived from the matched trajectories agree exactly."""
    from simple_distributed_rl_tpu.parity import (
        run_parity_ql_grid,
        run_reference_ql_grid,
    )

    ref_traj, _ = run_reference_ql_grid(seed=3, max_steps=800)
    our_traj, _ = run_parity_ql_grid(seed=3, max_steps=800)

    def returns(traj):
        out, acc = [], 0.0
        for (_, _, r, done, _) in traj:
            acc += r
            if done:
                out.append(round(acc, 10))
                acc = 0.0
        return out

    assert returns(ref_traj) == returns(our_traj)


@pytest.mark.parametrize("seed", [1, 5])
def test_ql_grid_engine_in_the_loop_parity(seed):
    """The COMPILED PlayEngine, driven by the harness's recorded decision stream
    (B=1, injected actions + env slips), reproduces the harness — which itself
    matches the reference bit-exactly (tests above) — in its transition stream,
    Q table and episode accounting. This closes the loop on the jitted core_play
    semantics (/root/reference/srl/base/run/core_play.py:115-214 +
    worker_run.py:107-228): pending-transition delays, episode-end double flush,
    auto-reset bookkeeping and the sequential QL update path are all exercised
    inside jit."""
    import numpy as np

    from simple_distributed_rl_tpu.parity import run_engine_ql_grid

    harness, engine = run_engine_ql_grid(seed=seed, max_steps=1200)

    # 1) transition stream: identical length, identical (s, a, r, term, s') tuples
    hs, es = harness["train_stream"], engine["train_stream"]
    assert len(hs) == len(es)
    for i, (a, b) in enumerate(zip(hs, es)):
        assert a[0] == b[0] and a[1] == b[1] and a[3] == b[3] and a[4] == b[4], (i, a, b)
        assert abs(a[2] - b[2]) < 1e-6, (i, a, b)

    # 2) Q table matches the float32 replay of the harness's update stream
    q = engine["q_table"]
    seen = set(harness["q_f32"])
    for idx, row in harness["q_f32"].items():
        np.testing.assert_allclose(q[idx], np.asarray(row, np.float32),
                                   rtol=0, atol=1e-5)
    for idx in range(q.shape[0]):
        if idx not in seen:
            assert np.all(q[idx] == 0.0), idx

    # 3) episode accounting
    assert engine["episode_count"] == harness["episode_count"]
    assert abs(engine["episode_reward_sum"] - sum(harness["episode_rewards"])) < 1e-4
