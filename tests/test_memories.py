"""Replay memory tests (parity model: tests/quick/rl/memories/* — uniform ring,
proportional PER sampling statistics, priority updates, IS weights)."""

import jax
import jax.numpy as jnp
import numpy as np

from simple_distributed_rl_tpu.memories import (
    PriorityReplayBuffer,
    RankBasedReplayBuffer,
    ReplayBuffer,
    SingleUseBuffer,
)


def _items(vals):
    return {"x": jnp.asarray(vals, jnp.float32)}


def test_ring_add_and_wrap():
    buf = ReplayBuffer(capacity=4)
    st = buf.init({"x": jnp.asarray(0.0)})
    st = buf.add(st, _items([1, 2, 3]))
    assert int(st.size) == 3 and int(st.insert_pos) == 3
    st = buf.add(st, _items([4, 5]))
    assert int(st.size) == 4 and int(st.insert_pos) == 1
    # slot 0 overwritten by 5
    assert float(st.data["x"][0]) == 5.0
    assert float(st.data["x"][3]) == 4.0


def test_masked_add():
    buf = ReplayBuffer(capacity=8)
    st = buf.init({"x": jnp.asarray(0.0)})
    mask = jnp.asarray([True, False, True, False])
    st = buf.add_masked(st, _items([10, 11, 12, 13]), mask)
    assert int(st.size) == 2
    vals = np.asarray(st.data["x"][:2])
    assert set(vals.tolist()) == {10.0, 12.0}


def test_uniform_sample_range():
    buf = ReplayBuffer(capacity=16)
    st = buf.init({"x": jnp.asarray(0.0)})
    st = buf.add(st, _items(list(range(1, 9))))
    batch = buf.sample(st, jax.random.PRNGKey(0), 32)
    assert batch["x"].shape == (32,)
    assert np.all(np.asarray(batch["x"]) >= 1.0)  # never the empty tail


def test_per_sampling_proportional():
    buf = PriorityReplayBuffer(capacity=64, alpha=1.0, epsilon=0.0)
    st = buf.init({"x": jnp.asarray(0.0)})
    st = buf.add(st, _items(list(range(64))))
    # give item 7 priority 9, everything else 1
    pr = jnp.ones((64,))
    st = st.replace(priorities=pr.at[7].set(9.0))
    items, w, idx = buf.sample(st, jax.random.PRNGKey(0), 2048, jnp.asarray(0))
    frac7 = float(np.mean(np.asarray(idx) == 7))
    # expected 9 / (63 + 9) = 0.125
    assert 0.09 < frac7 < 0.16
    # IS weight of the high-priority item is the smallest
    w7 = np.asarray(w)[np.asarray(idx) == 7]
    assert np.all(w7 <= np.asarray(w).max())


def test_per_empty_slots_never_sampled():
    buf = PriorityReplayBuffer(capacity=64)
    st = buf.init({"x": jnp.asarray(0.0)})
    st = buf.add(st, _items([1, 2, 3, 4]))
    items, w, idx = buf.sample(st, jax.random.PRNGKey(1), 256, jnp.asarray(0))
    assert np.asarray(idx).max() < 4


def test_per_update_and_max_priority():
    buf = PriorityReplayBuffer(capacity=8, alpha=1.0, epsilon=0.0)
    st = buf.init({"x": jnp.asarray(0.0)})
    st = buf.add(st, _items([1, 2]))
    st = buf.update(st, jnp.asarray([0]), jnp.asarray([5.0]))
    assert float(st.priorities[0]) == 5.0
    assert float(st.max_priority) == 5.0
    # new adds enter at the new max
    st = buf.add(st, _items([3]))
    assert float(st.priorities[2]) == 5.0


def test_per_update_disabled():
    buf = PriorityReplayBuffer(capacity=8, alpha=1.0, epsilon=0.0)
    st = buf.init({"x": jnp.asarray(0.0)})
    st = buf.add(st, _items([1, 2]))
    st2 = buf.update(st, jnp.asarray([0]), jnp.asarray([5.0]), enable=jnp.asarray(False))
    assert float(st2.priorities[0]) == float(st.priorities[0])


def test_per_beta_annealing():
    buf = PriorityReplayBuffer(capacity=8, beta_initial=0.4, beta_steps=100)
    import pytest

    assert float(buf.beta(jnp.asarray(0))) == pytest.approx(0.4)
    assert float(buf.beta(jnp.asarray(50))) == pytest.approx(0.7)
    assert float(buf.beta(jnp.asarray(1000))) == pytest.approx(1.0)


def test_rankbased_smoke():
    buf = RankBasedReplayBuffer(capacity=32, alpha=1.0)
    st = buf.init({"x": jnp.asarray(0.0)})
    st = buf.add(st, _items(list(range(16))))
    st = buf.update(st, jnp.arange(16), jnp.arange(16, dtype=jnp.float32) + 1.0)
    items, w, idx = buf.sample(st, jax.random.PRNGKey(0), 512, jnp.asarray(0))
    # highest-priority item (rank 1) sampled most
    counts = np.bincount(np.asarray(idx), minlength=32)
    assert counts[15] == counts.max()


def test_single_use():
    buf = SingleUseBuffer(capacity=8)
    st = buf.init({"x": jnp.asarray(0.0)})
    st = buf.add(st, _items([1, 2, 3]))
    data, mask, st = buf.take_all(st)
    assert int(mask.sum()) == 3
    assert int(st.count) == 0


def test_per_two_level_consistency():
    """bucketed inverse-CDF must agree with exact probabilities on average."""
    cap = 256
    buf = PriorityReplayBuffer(capacity=cap, alpha=1.0, epsilon=0.0)
    st = buf.init({"x": jnp.asarray(0.0)})
    st = buf.add(st, _items(list(range(cap))))
    pr = jax.random.uniform(jax.random.PRNGKey(3), (cap,)) + 0.1
    st = st.replace(priorities=pr)
    _, _, idx = buf.sample(st, jax.random.PRNGKey(4), 4096, jnp.asarray(0))
    counts = np.bincount(np.asarray(idx), minlength=cap) / 4096.0
    probs = np.asarray(pr / pr.sum())
    # correlation between empirical frequency and priority should be strong
    corr = np.corrcoef(counts, probs)[0, 1]
    assert corr > 0.8


def test_episode_replay_buffer_windows():
    from simple_distributed_rl_tpu.memories import EpisodeReplayBuffer

    buf = EpisodeReplayBuffer(capacity=8, max_len=10, prefix_size=1, suffix_size=1)
    st = buf.init({"x": jnp.asarray(0.0)})
    # two episodes: lengths 10 and 5, values = step index (+100 for ep 2)
    eps = {"x": jnp.stack([jnp.arange(10.0), jnp.arange(10.0) + 100.0])}
    st = buf.add_episodes(st, eps, jnp.asarray([10, 5]))
    w, m = buf.sample_windows(st, jax.random.PRNGKey(0), 64)
    assert w["x"].shape == (64, 3)
    # windows are contiguous steps
    d = np.diff(np.asarray(w["x"]), axis=1)
    assert np.all(d == 1.0)
    # masks valid inside episode length
    assert m.shape == (64, 3)
    # windows from the short episode never start past its length
    vals = np.asarray(w["x"])
    from_short = vals[:, 0] >= 100
    assert np.all(vals[from_short][:, 2] - 100 <= 9)
