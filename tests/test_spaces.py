"""Space unit tests (parity model: tests/quick/base/spaces/* of the reference)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simple_distributed_rl_tpu.define import RLBaseTypes, SpaceTypes
from simple_distributed_rl_tpu.spaces import (
    ArrayContinuous,
    ArrayDiscrete,
    Box,
    Continuous,
    Discrete,
    Multi,
    Text,
)


def test_discrete_basic():
    s = Discrete(5, start=2)
    key = jax.random.PRNGKey(0)
    v = s.sample(key)
    assert s.check_val(int(v))
    assert not s.check_val(7)
    assert not s.check_val(1)
    assert s.sanitize(99) == 6


def test_discrete_sample_invalid_mask():
    s = Discrete(4)
    mask = jnp.asarray([True, False, True, True])
    for i in range(20):
        v = s.sample(jax.random.PRNGKey(i), mask)
        assert int(v) == 1


def test_discrete_encoders():
    s = Discrete(6, start=1)
    for target in [
        RLBaseTypes.DISCRETE,
        RLBaseTypes.ARRAY_DISCRETE,
        RLBaseTypes.CONTINUOUS,
        RLBaseTypes.BOX,
    ]:
        e = s.encoder(target)
        y = e.encode(jnp.asarray(3))
        x = e.decode(y)
        assert int(x) == 3, target


def test_array_discrete_flat_index_roundtrip():
    s = ArrayDiscrete(3, low=(0, -1, 2), high=(4, 1, 5))
    vals = jnp.asarray([2, 0, 3])
    idx = s.flat_index(vals)
    back = s.from_flat_index(idx)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(vals))
    assert s.n_total == 5 * 3 * 4


def test_array_discrete_encoders():
    s = ArrayDiscrete(2, 0, (5, 3))
    e = s.encoder(RLBaseTypes.DISCRETE)
    assert e.space.n == 24
    v = jnp.asarray([4, 2])
    assert np.array_equal(np.asarray(e.decode(e.encode(v))), [4, 2])
    e2 = s.encoder(RLBaseTypes.BOX)
    y = e2.encode(v)
    assert y.dtype == jnp.float32 and y.shape == (2,)
    assert np.array_equal(np.asarray(e2.decode(y)), [4, 2])


def test_continuous_division():
    s = Continuous(-1.0, 1.0)
    e = s.encoder(RLBaseTypes.DISCRETE, division=5)
    assert e.space.n == 5
    # nearest grid point of 0.3 on linspace(-1,1,5)=[-1,-.5,0,.5,1] is .5 (idx 3)
    assert int(e.encode(jnp.asarray(0.3))) == 3
    assert float(e.decode(jnp.asarray(3))) == pytest.approx(0.5)


def test_array_continuous_encoders():
    s = ArrayContinuous(2, -1.0, 1.0)
    e = s.encoder(RLBaseTypes.ARRAY_DISCRETE, division=3)
    v = jnp.asarray([-1.0, 1.0])
    d = e.encode(v)
    assert np.array_equal(np.asarray(d), [0, 2])
    back = e.decode(d)
    np.testing.assert_allclose(np.asarray(back), [-1.0, 1.0])
    ed = s.encoder(RLBaseTypes.DISCRETE, division=3)
    assert ed.space.n == 9


def test_box_encoders():
    s = Box((2, 3), 0.0, 1.0)
    e = s.encoder(RLBaseTypes.NP_ARRAY)
    v = jnp.arange(6, dtype=jnp.float32).reshape(2, 3) / 6.0
    y = e.encode(v)
    assert y.shape == (6,)
    np.testing.assert_allclose(np.asarray(e.decode(y)), np.asarray(v))


def test_box_image_stype():
    s = Box((8, 8, 3), 0, 255, jnp.uint8, SpaceTypes.COLOR)
    assert s.is_image
    assert s.stype.is_image()


def test_multi_space():
    s = Multi([Discrete(3), Box((2,), 0.0, 1.0)])
    key = jax.random.PRNGKey(0)
    v = s.sample(key)
    assert s.check_val(v)
    e = s.encoder(RLBaseTypes.BOX)
    y = e.encode(v)
    assert y.shape == (3,)  # 1 + 2
    back = e.decode(y)
    assert int(back[0]) == int(v[0])
    np.testing.assert_allclose(np.asarray(back[1]), np.asarray(v[1]), rtol=1e-6)


def test_multi_discrete_encode():
    s = Multi([Discrete(2), Discrete(3)])
    e = s.encoder(RLBaseTypes.DISCRETE)
    assert e.space.n == 6
    v = (jnp.asarray(1), jnp.asarray(2))
    idx = e.encode(v)
    back = e.decode(idx)
    assert int(back[0]) == 1 and int(back[1]) == 2


def test_text_space():
    s = Text(max_length=5)
    arr = s.to_jnp("ab")
    assert arr.shape == (5,)
    assert s.check_val("abc")
    assert not s.check_val("x" * 10)


def test_stacked():
    s = ArrayDiscrete(2, 0, 5)
    st = s.stacked(4)
    assert st.shape == (4, 2)
