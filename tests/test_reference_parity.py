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
