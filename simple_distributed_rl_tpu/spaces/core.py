"""Space type system with a full encode/decode matrix as trace-time transforms.

Capability parity with the reference 9-class space system and its N×N encode engine
(srl/base/spaces/space.py:36,185-250 and the per-class files in srl/base/spaces/ of
pocokhc/simple_distributed_rl), re-designed TPU-first:

- every space is a frozen dataclass with STATIC shape/dtype — nothing here is traced;
- ``encoder(target)`` returns a pair of pure jittable functions (encode/decode) plus the
  statically-known encoded space, so space negotiation happens once at trace time and the
  compiled program contains only the resulting reshapes/gathers/casts;
- sampling takes an explicit PRNG key (and an invalid-action mask for discrete spaces);
- the reference's sanitize/assert path (srl/base/env/env_run.py:373-440) lives in
  ``check_val``/``sanitize`` and runs host-side only (registration/test time).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Callable, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..define import RLBaseTypes, SpaceTypes

# dense tabular tables are exact up to this joint cardinality; beyond it the
# discrete encode falls back to a hashed index over _HASH_BUCKETS rows
_MAX_EXACT_DISCRETE = 1 << 20
_HASH_BUCKETS = 1 << 20

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class Encoder:
    """A static encode/decode transform between two spaces.

    ``encode`` maps an env-native value into the target representation; ``decode`` maps it
    back (used for actions). Both are pure and jittable.
    """

    space: "Space"
    encode: Callable[[Any], Any]
    decode: Callable[[Any], Any]


class Space:
    """Abstract space. All metadata is static python; values are jnp arrays."""

    stype: SpaceTypes = SpaceTypes.UNKNOWN

    # --- static metadata -------------------------------------------------
    @property
    def shape(self) -> Tuple[int, ...]:
        raise NotImplementedError()

    @property
    def dtype(self):
        raise NotImplementedError()

    @property
    def flat_size(self) -> int:
        n = 1
        for s in self.shape:
            n *= int(s)
        return n

    # --- value ops (pure, jittable) --------------------------------------
    def sample(self, key: Array, invalid_mask: Optional[Array] = None) -> Array:
        raise NotImplementedError()

    def zero(self) -> Array:
        return jnp.zeros(self.shape, self.dtype)

    # --- encode engine ----------------------------------------------------
    def encoder(self, target: RLBaseTypes, **kwargs) -> Encoder:
        """Build the static transform to ``target``. Mirrors the reference's
        set_encode_space/encode_to_space/decode_from_space triple
        (srl/base/spaces/space.py:185-250) but resolved once, at trace time."""
        raise NotImplementedError()

    # --- host-side validation (not jitted) --------------------------------
    def check_val(self, val) -> bool:
        raise NotImplementedError()

    def sanitize(self, val):
        return val

    def to_jnp(self, host_val) -> Array:
        return jnp.asarray(host_val, self.dtype).reshape(self.shape)

    # --- stacking ---------------------------------------------------------
    def stacked(self, length: int) -> "Space":
        """Frame-stack space: new leading axis of ``length`` (parity:
        srl/base/spaces/space.py create_stack_space)."""
        base = self.encoder(RLBaseTypes.BOX).space
        assert isinstance(base, Box)
        return Box(
            shape=(length,) + base.shape,
            low=float(np.min(base.low)),
            high=float(np.max(base.high)),
            dtype=base.dtype,
            stype=self.stype,
        )


def _identity(x):
    return x


# ---------------------------------------------------------------------------
# Discrete
# ---------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class Discrete(Space):
    """{start, ..., start+n-1} (parity: srl/base/spaces/discrete.py)."""

    n: int
    start: int = 0
    stype: SpaceTypes = SpaceTypes.DISCRETE

    @property
    def shape(self):
        return ()

    @property
    def dtype(self):
        return jnp.int32

    def sample(self, key, invalid_mask=None):
        if invalid_mask is None:
            return jax.random.randint(key, (), 0, self.n, jnp.int32) + self.start
        logits = jnp.where(invalid_mask, -jnp.inf, 0.0)
        return jax.random.categorical(key, logits).astype(jnp.int32) + self.start

    def check_val(self, val) -> bool:
        try:
            v = int(val)
        except (TypeError, ValueError):
            return False
        return self.start <= v < self.start + self.n

    def sanitize(self, val):
        return int(np.clip(int(np.asarray(val).reshape(-1)[0]), self.start, self.start + self.n - 1))

    def encoder(self, target: RLBaseTypes, **kwargs) -> Encoder:
        s = self.start

        if target & RLBaseTypes.DISCRETE:
            return Encoder(
                Discrete(self.n),
                lambda x: (x - s).astype(jnp.int32),
                lambda y: (y + s).astype(jnp.int32),
            )
        if target & RLBaseTypes.ARRAY_DISCRETE:
            return Encoder(
                ArrayDiscrete(1, 0, self.n - 1),
                lambda x: jnp.asarray([x - s], jnp.int32).reshape(1),
                lambda y: (jnp.asarray(y).reshape(-1)[0] + s).astype(jnp.int32),
            )
        if target & RLBaseTypes.CONTINUOUS:
            return Encoder(
                Continuous(0.0, float(self.n - 1)),
                lambda x: (x - s).astype(jnp.float32),
                lambda y: jnp.round(y).astype(jnp.int32) + s,
            )
        if target & (RLBaseTypes.ARRAY_CONTINUOUS | RLBaseTypes.NP_ARRAY | RLBaseTypes.BOX):
            return Encoder(
                Box((1,), 0.0, float(self.n - 1), jnp.float32, SpaceTypes.DISCRETE),
                lambda x: jnp.asarray([x - s], jnp.float32).reshape(1),
                lambda y: jnp.round(jnp.asarray(y).reshape(-1)[0]).astype(jnp.int32) + s,
            )
        raise ValueError(f"unsupported encode target {target} for {self}")


# ---------------------------------------------------------------------------
# ArrayDiscrete
# ---------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class ArrayDiscrete(Space):
    """Fixed-length int vector with per-dim bounds (parity:
    srl/base/spaces/array_discrete.py)."""

    size: int
    low: Union[int, Tuple[int, ...]] = 0
    high: Union[int, Tuple[int, ...]] = 1
    stype: SpaceTypes = SpaceTypes.DISCRETE

    def __post_init__(self):
        lo = np.broadcast_to(np.asarray(self.low, np.int32), (self.size,)).copy()
        hi = np.broadcast_to(np.asarray(self.high, np.int32), (self.size,)).copy()
        object.__setattr__(self, "_low", lo)
        object.__setattr__(self, "_high", hi)

    @property
    def low_arr(self) -> np.ndarray:
        return self._low  # type: ignore[attr-defined]

    @property
    def high_arr(self) -> np.ndarray:
        return self._high  # type: ignore[attr-defined]

    @property
    def shape(self):
        return (self.size,)

    @property
    def dtype(self):
        return jnp.int32

    @property
    def n_total(self) -> int:
        """Product of per-dim cardinalities (size of the flattened discrete space).
        Computed in exact Python ints — int64 np.prod silently wraps for large joint
        spaces (e.g. hungry_geese's 10^77 states)."""
        return math.prod(int(h) - int(l) + 1 for h, l in zip(self.high_arr, self.low_arr))

    def sample(self, key, invalid_mask=None):
        lo = jnp.asarray(self.low_arr)
        hi = jnp.asarray(self.high_arr)
        u = jax.random.uniform(key, (self.size,))
        return (lo + jnp.floor(u * (hi - lo + 1)).astype(jnp.int32)).clip(lo, hi)

    def check_val(self, val) -> bool:
        v = np.asarray(val)
        if v.shape != (self.size,):
            return False
        return bool(np.all(v >= self.low_arr) and np.all(v <= self.high_arr))

    def sanitize(self, val):
        v = np.asarray(val, np.int32).reshape(self.size)
        return np.clip(v, self.low_arr, self.high_arr).tolist()

    def flat_index(self, x: Array) -> Array:
        """Mixed-radix flatten to a scalar index in [0, n_total). Jittable; this is the
        TPU-native stand-in for the reference's string-keyed Q-table dict
        (srl/base/spaces/array_discrete.py to_str / algorithms/ql.py:149)."""
        radices = (self.high_arr - self.low_arr + 1).astype(np.int64)
        strides = np.concatenate([np.cumprod(radices[::-1])[::-1][1:], [1]]).astype(np.int32)
        return jnp.sum((x - jnp.asarray(self.low_arr)) * jnp.asarray(strides), axis=-1).astype(jnp.int32)

    def from_flat_index(self, idx: Array) -> Array:
        radices = (self.high_arr - self.low_arr + 1).astype(np.int32)
        strides = np.concatenate([np.cumprod(radices[::-1].astype(np.int64))[::-1][1:], [1]]).astype(np.int32)
        digits = (idx[..., None] // jnp.asarray(strides)) % jnp.asarray(radices)
        return digits.astype(jnp.int32) + jnp.asarray(self.low_arr)

    def flat_hash(self, x: Array, buckets: int) -> Array:
        """Hashed flatten for joint spaces too large for an exact dense index — the
        TPU-native analog of the reference's UNBOUNDED string-keyed table (a dict never
        overflows; a fixed device table needs hashing). Rolling polynomial hash with an
        odd multiplier (a unit mod 2^32, so every digit keeps influence) plus a final
        avalanche mix; collisions act as benign state aliasing."""
        digits = (jnp.asarray(x) - jnp.asarray(self.low_arr)).astype(jnp.uint32)
        h = jnp.zeros(digits.shape[:-1], jnp.uint32)
        for i in range(self.size):
            h = h * jnp.uint32(1_000_003) + digits[..., i]
        h = h ^ (h >> 16)
        h = h * jnp.uint32(0x85EBCA6B)
        h = h ^ (h >> 13)
        h = h * jnp.uint32(0xC2B2AE35)
        h = h ^ (h >> 16)
        return (h % jnp.uint32(buckets)).astype(jnp.int32)

    def encoder(self, target: RLBaseTypes, **kwargs) -> Encoder:
        if target & RLBaseTypes.DISCRETE:
            if self.n_total <= _MAX_EXACT_DISCRETE:
                return Encoder(Discrete(self.n_total), self.flat_index, self.from_flat_index)
            if kwargs.get("role") == "action":
                # hashing is one-way; decoding a hashed index back to an env action
                # would silently always yield the low corner (round-1 advisor
                # finding) — fail loudly instead
                raise ValueError(
                    f"{self} is too large for an exact DISCRETE action encode "
                    f"({self.n_total} > {_MAX_EXACT_DISCRETE}); the hashed fallback "
                    "only applies to observations"
                )
            buckets = _HASH_BUCKETS
            low = np.asarray(self.low_arr, np.int32)
            return Encoder(
                Discrete(buckets),
                lambda x: self.flat_hash(x, buckets),
                # hashing is one-way; decode (unused for observations) yields the
                # space's low corner with the right shape
                lambda y: jnp.broadcast_to(
                    jnp.asarray(low), jnp.shape(y) + (self.size,)
                ),
            )
        if target & RLBaseTypes.ARRAY_DISCRETE:
            return Encoder(self, _identity, _identity)
        if target & (RLBaseTypes.ARRAY_CONTINUOUS | RLBaseTypes.NP_ARRAY | RLBaseTypes.BOX):
            lo = float(np.min(self.low_arr))
            hi = float(np.max(self.high_arr))
            return Encoder(
                Box((self.size,), lo, hi, jnp.float32, SpaceTypes.DISCRETE),
                lambda x: jnp.asarray(x, jnp.float32),
                lambda y: jnp.round(jnp.asarray(y)).astype(jnp.int32),
            )
        if target & RLBaseTypes.CONTINUOUS and self.size == 1:
            return Encoder(
                Continuous(float(self.low_arr[0]), float(self.high_arr[0])),
                lambda x: jnp.asarray(x, jnp.float32).reshape(())[()],
                lambda y: jnp.round(y).astype(jnp.int32).reshape(1),
            )
        raise ValueError(f"unsupported encode target {target} for {self}")


# ---------------------------------------------------------------------------
# Continuous
# ---------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class Continuous(Space):
    """Scalar float in [low, high] (parity: srl/base/spaces/continuous.py)."""

    low: float = -np.inf
    high: float = np.inf
    stype: SpaceTypes = SpaceTypes.CONTINUOUS

    @property
    def shape(self):
        return ()

    @property
    def dtype(self):
        return jnp.float32

    @property
    def is_bounded(self) -> bool:
        return bool(np.isfinite(self.low) and np.isfinite(self.high))

    def sample(self, key, invalid_mask=None):
        if self.is_bounded:
            return jax.random.uniform(key, (), jnp.float32, self.low, self.high)
        return jax.random.normal(key, (), jnp.float32)

    def check_val(self, val) -> bool:
        try:
            v = float(val)
        except (TypeError, ValueError):
            return False
        return self.low <= v <= self.high

    def sanitize(self, val):
        return float(np.clip(float(np.asarray(val).reshape(-1)[0]), self.low, self.high))

    def division_points(self, division: int) -> np.ndarray:
        """Static quantization grid (parity: create_division_tbl,
        srl/base/spaces/continuous.py)."""
        assert self.is_bounded, "division table requires bounded space"
        return np.linspace(self.low, self.high, division).astype(np.float32)

    def encoder(self, target: RLBaseTypes, division: int = 10, **kwargs) -> Encoder:
        if target & RLBaseTypes.DISCRETE:
            pts = jnp.asarray(self.division_points(division))
            return Encoder(
                Discrete(division),
                lambda x: jnp.argmin(jnp.abs(pts - x)).astype(jnp.int32),
                lambda y: pts[y],
            )
        if target & RLBaseTypes.ARRAY_DISCRETE:
            pts = jnp.asarray(self.division_points(division))
            return Encoder(
                ArrayDiscrete(1, 0, division - 1),
                lambda x: jnp.argmin(jnp.abs(pts - x)).astype(jnp.int32).reshape(1),
                lambda y: pts[jnp.asarray(y).reshape(-1)[0]],
            )
        if target & RLBaseTypes.CONTINUOUS:
            return Encoder(self, _identity, _identity)
        if target & (RLBaseTypes.ARRAY_CONTINUOUS | RLBaseTypes.NP_ARRAY | RLBaseTypes.BOX):
            return Encoder(
                Box((1,), self.low, self.high, jnp.float32),
                lambda x: jnp.asarray(x, jnp.float32).reshape(1),
                lambda y: jnp.asarray(y, jnp.float32).reshape(-1)[0],
            )
        raise ValueError(f"unsupported encode target {target} for {self}")


# ---------------------------------------------------------------------------
# ArrayContinuous
# ---------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class ArrayContinuous(Space):
    """Fixed-length float vector (parity: srl/base/spaces/array_continuous.py)."""

    size: int
    low: Union[float, Tuple[float, ...]] = -np.inf
    high: Union[float, Tuple[float, ...]] = np.inf
    stype: SpaceTypes = SpaceTypes.CONTINUOUS

    def __post_init__(self):
        lo = np.broadcast_to(np.asarray(self.low, np.float32), (self.size,)).copy()
        hi = np.broadcast_to(np.asarray(self.high, np.float32), (self.size,)).copy()
        object.__setattr__(self, "_low", lo)
        object.__setattr__(self, "_high", hi)

    @property
    def low_arr(self) -> np.ndarray:
        return self._low  # type: ignore[attr-defined]

    @property
    def high_arr(self) -> np.ndarray:
        return self._high  # type: ignore[attr-defined]

    @property
    def shape(self):
        return (self.size,)

    @property
    def dtype(self):
        return jnp.float32

    @property
    def is_bounded(self) -> bool:
        return bool(np.all(np.isfinite(self.low_arr)) and np.all(np.isfinite(self.high_arr)))

    def sample(self, key, invalid_mask=None):
        if self.is_bounded:
            return jax.random.uniform(
                key, (self.size,), jnp.float32, jnp.asarray(self.low_arr), jnp.asarray(self.high_arr)
            )
        return jax.random.normal(key, (self.size,), jnp.float32)

    def check_val(self, val) -> bool:
        v = np.asarray(val)
        if v.shape != (self.size,):
            return False
        return bool(np.all(v >= self.low_arr - 1e-8) and np.all(v <= self.high_arr + 1e-8))

    def sanitize(self, val):
        v = np.asarray(val, np.float32).reshape(self.size)
        return np.clip(v, self.low_arr, self.high_arr).tolist()

    def encoder(self, target: RLBaseTypes, division: int = 10, **kwargs) -> Encoder:
        if target & (RLBaseTypes.DISCRETE | RLBaseTypes.ARRAY_DISCRETE):
            assert self.is_bounded, "discretizing an unbounded space requires bounds"
            pts = jnp.stack(
                [jnp.linspace(self.low_arr[i], self.high_arr[i], division) for i in range(self.size)]
            )  # [size, division]

            def _quantize(x):
                return jnp.argmin(jnp.abs(pts - x[:, None]), axis=-1).astype(jnp.int32)

            def _dequantize(d):
                return jnp.take_along_axis(pts, d[:, None], axis=-1)[:, 0]

            if target & RLBaseTypes.ARRAY_DISCRETE:
                return Encoder(ArrayDiscrete(self.size, 0, division - 1), _quantize, _dequantize)
            # route through ArrayDiscrete's DISCRETE encoder: it picks the exact
            # mixed-radix index when division**size fits, the hashed fallback for
            # huge joint grids (e.g. images), and rejects hashed ACTION encodes —
            # a raw flat_index here would silently overflow int32 strides
            ad = ArrayDiscrete(self.size, 0, division - 1)
            sub = ad.encoder(RLBaseTypes.DISCRETE, **kwargs)
            return Encoder(
                sub.space,
                lambda x: sub.encode(_quantize(x)),
                lambda y: _dequantize(sub.decode(y)),
            )
        if target & RLBaseTypes.CONTINUOUS and self.size == 1:
            return Encoder(
                Continuous(float(self.low_arr[0]), float(self.high_arr[0])),
                lambda x: jnp.asarray(x).reshape(())[()],
                lambda y: jnp.asarray(y).reshape(1),
            )
        if target & (RLBaseTypes.ARRAY_CONTINUOUS | RLBaseTypes.NP_ARRAY | RLBaseTypes.BOX):
            lo = float(np.min(self.low_arr)) if self.is_bounded else -np.inf
            hi = float(np.max(self.high_arr)) if self.is_bounded else np.inf
            return Encoder(
                Box((self.size,), lo, hi, jnp.float32),
                lambda x: jnp.asarray(x, jnp.float32),
                lambda y: jnp.asarray(y, jnp.float32).reshape(self.size),
            )
        raise ValueError(f"unsupported encode target {target} for {self}")


# ---------------------------------------------------------------------------
# Box
# ---------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class Box(Space):
    """N-D tensor space; stype carries image semantics (parity:
    srl/base/spaces/box.py — the reference's BoxSpace doubles as its image space)."""

    shape_: Tuple[int, ...]
    low: float = -np.inf
    high: float = np.inf
    dtype_: Any = jnp.float32
    stype: SpaceTypes = SpaceTypes.CONTINUOUS

    def __init__(self, shape, low=-np.inf, high=np.inf, dtype=jnp.float32, stype=SpaceTypes.CONTINUOUS):
        object.__setattr__(self, "shape_", tuple(int(s) for s in shape))
        object.__setattr__(self, "low", float(np.min(low)))
        object.__setattr__(self, "high", float(np.max(high)))
        object.__setattr__(self, "dtype_", dtype)
        object.__setattr__(self, "stype", stype)

    @property
    def shape(self):
        return self.shape_

    @property
    def dtype(self):
        return self.dtype_

    @property
    def is_bounded(self) -> bool:
        return bool(np.isfinite(self.low) and np.isfinite(self.high))

    @property
    def is_image(self) -> bool:
        return self.stype.is_image()

    def sample(self, key, invalid_mask=None):
        if jnp.issubdtype(self.dtype_, jnp.integer):
            return jax.random.randint(key, self.shape_, int(self.low), int(self.high) + 1, self.dtype_)
        if self.is_bounded:
            return jax.random.uniform(key, self.shape_, self.dtype_, self.low, self.high)
        return jax.random.normal(key, self.shape_, self.dtype_)

    def check_val(self, val) -> bool:
        v = np.asarray(val)
        if v.shape != self.shape_:
            return False
        return bool(np.all(v >= self.low - 1e-8) and np.all(v <= self.high + 1e-8))

    def sanitize(self, val):
        v = np.asarray(val, np.dtype(self.dtype_)).reshape(self.shape_)
        if self.is_bounded:
            v = np.clip(v, self.low, self.high)
        return v

    def encoder(self, target: RLBaseTypes, division: int = 10, **kwargs) -> Encoder:
        if target & RLBaseTypes.BOX:
            return Encoder(self, _identity, _identity)
        if target & (RLBaseTypes.NP_ARRAY | RLBaseTypes.ARRAY_CONTINUOUS):
            flat = Box((self.flat_size,), self.low, self.high, jnp.float32, self.stype)
            return Encoder(
                flat,
                lambda x: jnp.asarray(x, jnp.float32).reshape(-1),
                lambda y: jnp.asarray(y, self.dtype_).reshape(self.shape_),
            )
        if target & (RLBaseTypes.DISCRETE | RLBaseTypes.ARRAY_DISCRETE):
            assert self.is_bounded
            ac = ArrayContinuous(self.flat_size, self.low, self.high)
            sub = ac.encoder(target, division=division)
            return Encoder(
                sub.space,
                lambda x: sub.encode(jnp.asarray(x, jnp.float32).reshape(-1)),
                lambda y: jnp.asarray(sub.decode(y), self.dtype_).reshape(self.shape_),
            )
        raise ValueError(f"unsupported encode target {target} for {self}")


# NpArray of the reference (srl/base/spaces/np_array.py) is a rank-1 Box here.
def NpArray(size: int, low=-np.inf, high=np.inf, dtype=jnp.float32, stype=SpaceTypes.CONTINUOUS) -> Box:
    return Box((size,), low, high, dtype, stype)


# ---------------------------------------------------------------------------
# Multi
# ---------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class Multi(Space):
    """Tuple of sub-spaces (parity: srl/base/spaces/multi.py). Values are python tuples
    of jnp arrays (a pytree), which jit handles natively."""

    spaces: Tuple[Space, ...]
    stype: SpaceTypes = SpaceTypes.MULTI

    def __init__(self, spaces: Sequence[Space]):
        object.__setattr__(self, "spaces", tuple(spaces))
        object.__setattr__(self, "stype", SpaceTypes.MULTI)

    @property
    def shape(self):
        return tuple(s.shape for s in self.spaces)

    @property
    def dtype(self):
        return tuple(s.dtype for s in self.spaces)

    @property
    def flat_size(self) -> int:
        return sum(s.flat_size for s in self.spaces)

    def sample(self, key, invalid_mask=None):
        keys = jax.random.split(key, len(self.spaces))
        return tuple(s.sample(k) for s, k in zip(self.spaces, keys))

    def zero(self):
        return tuple(s.zero() for s in self.spaces)

    def check_val(self, val) -> bool:
        if not isinstance(val, (tuple, list)) or len(val) != len(self.spaces):
            return False
        return all(s.check_val(v) for s, v in zip(self.spaces, val))

    def sanitize(self, val):
        return tuple(s.sanitize(v) for s, v in zip(self.spaces, val))

    def to_jnp(self, host_val):
        return tuple(s.to_jnp(v) for s, v in zip(self.spaces, host_val))

    def encoder(self, target: RLBaseTypes, **kwargs) -> Encoder:
        if target & RLBaseTypes.MULTI:
            return Encoder(self, _identity, _identity)
        if target & (RLBaseTypes.BOX | RLBaseTypes.NP_ARRAY | RLBaseTypes.ARRAY_CONTINUOUS):
            subs = [s.encoder(RLBaseTypes.BOX, **kwargs) for s in self.spaces]
            sizes = [e.space.flat_size for e in subs]
            offsets = np.concatenate([[0], np.cumsum(sizes)]).astype(int)
            total = int(offsets[-1])
            lo = min(float(getattr(e.space, "low", 0.0)) for e in subs)
            hi = max(float(getattr(e.space, "high", 1.0)) for e in subs)

            def _enc(x):
                return jnp.concatenate(
                    [jnp.asarray(e.encode(v), jnp.float32).reshape(-1) for e, v in zip(subs, x)]
                )

            def _dec(y):
                y = jnp.asarray(y).reshape(-1)
                return tuple(
                    e.decode(y[offsets[i] : offsets[i + 1]].reshape(e.space.shape))
                    for i, e in enumerate(subs)
                )

            return Encoder(Box((total,), lo, hi, jnp.float32), _enc, _dec)
        if target & (RLBaseTypes.DISCRETE | RLBaseTypes.ARRAY_DISCRETE):
            subs = [s.encoder(RLBaseTypes.ARRAY_DISCRETE, **kwargs) for s in self.spaces]
            sizes = [e.space.flat_size for e in subs]
            offsets = np.concatenate([[0], np.cumsum(sizes)]).astype(int)
            total = int(offsets[-1])
            los = np.concatenate([np.asarray(e.space.low_arr) for e in subs])
            his = np.concatenate([np.asarray(e.space.high_arr) for e in subs])
            joined = ArrayDiscrete(total, tuple(los.tolist()), tuple(his.tolist()))

            def _enc_ad(x):
                return jnp.concatenate([jnp.asarray(e.encode(v)).reshape(-1) for e, v in zip(subs, x)])

            def _dec_ad(y):
                y = jnp.asarray(y).reshape(-1)
                return tuple(e.decode(y[offsets[i] : offsets[i + 1]]) for i, e in enumerate(subs))

            if target & RLBaseTypes.ARRAY_DISCRETE:
                return Encoder(joined, _enc_ad, _dec_ad)
            return Encoder(
                Discrete(joined.n_total),
                lambda x: joined.flat_index(_enc_ad(x)),
                lambda y: _dec_ad(joined.from_flat_index(y)),
            )
        raise ValueError(f"unsupported encode target {target} for {self}")


# ---------------------------------------------------------------------------
# Text / Any — host-side spaces (no device representation; parity:
# srl/base/spaces/text.py, any_space.py). Kept for API compatibility with external
# (gym/user) envs; anything that must reach the compiled path goes through an encoder.
# ---------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class Text(Space):
    max_length: int = 128
    charset: str = "abcdefghijklmnopqrstuvwxyz "
    stype: SpaceTypes = SpaceTypes.TEXT

    @property
    def shape(self):
        return (self.max_length,)

    @property
    def dtype(self):
        return jnp.int32

    def sample(self, key, invalid_mask=None):
        return jax.random.randint(key, (self.max_length,), 0, len(self.charset), jnp.int32)

    def check_val(self, val) -> bool:
        return isinstance(val, str) and len(val) <= self.max_length

    def to_jnp(self, host_val: str) -> Array:
        ids = [self.charset.index(c) if c in self.charset else 0 for c in host_val]
        ids = ids[: self.max_length] + [0] * (self.max_length - len(ids))
        return jnp.asarray(ids, jnp.int32)

    def encoder(self, target: RLBaseTypes, **kwargs) -> Encoder:
        ad = ArrayDiscrete(self.max_length, 0, len(self.charset) - 1)
        sub = ad.encoder(target, **kwargs)
        return Encoder(sub.space, sub.encode, sub.decode)


@dataclasses.dataclass(frozen=True)
class AnySpace(Space):
    """Opaque passthrough (parity: srl/base/spaces/any_space.py); host-only."""

    stype: SpaceTypes = SpaceTypes.UNKNOWN

    @property
    def shape(self):
        return ()

    @property
    def dtype(self):
        return jnp.float32

    def check_val(self, val) -> bool:
        return True

    def encoder(self, target: RLBaseTypes, **kwargs) -> Encoder:
        return Encoder(self, _identity, _identity)
