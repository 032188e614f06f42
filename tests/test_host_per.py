"""C++ host sum-tree PER tests (parity model:
tests/quick/rl/memories/test_priority_memories.py for the cpp module)."""

import numpy as np
import pytest

from simple_distributed_rl_tpu.ops import host_per

pytestmark = pytest.mark.skipif(not host_per.is_available(), reason="no C++ toolchain")


def test_add_sample_update_cycle():
    m = host_per.HostProportionalMemory(capacity=64, alpha=1.0, epsilon=0.0, seed=1)
    m.add_batch(list(range(16)))
    assert m.length() == 16
    items, w, slots = m.sample(8, step=0)
    assert len(items) == 8
    assert all(0 <= it < 16 for it in items)
    assert w.max() == pytest.approx(1.0)
    m.update(slots, np.full(8, 3.0))
    # updated slots now dominate sampling
    items2, _, slots2 = m.sample(256, step=0)
    frac = np.isin(slots2, slots).mean()
    assert frac > 0.5


def test_proportionality():
    m = host_per.HostProportionalMemory(capacity=128, alpha=1.0, epsilon=0.0, seed=2)
    m.add_batch(list(range(4)))  # all at max priority 1
    m.update(np.asarray([3], np.int64), np.asarray([9.0]))
    _, _, slots = m.sample(4096, step=0)
    frac3 = (slots == 3).mean()
    assert 0.6 < frac3 < 0.9  # expected 9/12 = 0.75


def test_ring_overwrite():
    m = host_per.HostProportionalMemory(capacity=4, seed=3)
    m.add_batch([10, 11, 12, 13, 14])
    assert m.length() == 4
    items, _, _ = m.sample(32, step=0)
    assert 10 not in items  # overwritten
    assert 14 in items


def test_backup_restore():
    m = host_per.HostProportionalMemory(capacity=8, seed=4)
    m.add_batch([1, 2, 3])
    m.update(np.asarray([1], np.int64), np.asarray([5.0]))
    snap = m.backup()
    m2 = host_per.HostProportionalMemory(capacity=8, seed=5)
    m2.restore(snap)
    assert m2.length() == 3
    _, _, slots = m2.sample(512, step=0)
    assert (slots == 1).mean() > 0.4  # priority survived the round-trip


def test_weights_anneal():
    m = host_per.HostProportionalMemory(capacity=16, beta_initial=0.4, beta_steps=100, seed=6)
    m.add_batch(list(range(8)))
    m.update(np.asarray([0], np.int64), np.asarray([10.0]))
    _, w_early, s_early = m.sample(64, step=0)
    _, w_late, s_late = m.sample(64, step=1000)
    # at beta=1 the low-probability items get proportionally larger weights
    assert w_late.min() <= w_early.min() + 1e-9
