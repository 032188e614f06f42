"""Core enums and type aliases.

Capability parity with the reference type system (srl/base/define.py:80,102,115 in
pocokhc/simple_distributed_rl), re-expressed for a trace-time framework: every enum here is
resolved statically (at jit-trace time), never inside compiled code.
"""

from __future__ import annotations

import enum


class SpaceTypes(enum.Enum):
    """Semantic tag of a space (parity: srl/base/define.py:102).

    Image semantics (GRAY_2ch/GRAY_3ch/COLOR/FEATURE_MAP) drive which input block the NN
    models build and which image processors apply.
    """

    UNKNOWN = 0
    DISCRETE = enum.auto()
    CONTINUOUS = enum.auto()
    GRAY_2ch = enum.auto()  # (H, W)
    GRAY_3ch = enum.auto()  # (H, W, 1)
    COLOR = enum.auto()  # (H, W, 3)
    FEATURE_MAP = enum.auto()  # (H, W, C)
    TEXT = enum.auto()
    MULTI = enum.auto()

    def is_image(self) -> bool:
        return self in (
            SpaceTypes.GRAY_2ch,
            SpaceTypes.GRAY_3ch,
            SpaceTypes.COLOR,
            SpaceTypes.FEATURE_MAP,
        )


class RLBaseTypes(enum.Flag):
    """Encode-target types an algorithm may request for its observation/action
    representation (parity: srl/base/define.py:115).

    The space encode engine maps any env space to any of these, as a static shape/dtype
    transform resolved at trace time.
    """

    NONE = enum.auto()
    DISCRETE = enum.auto()  # int scalar
    ARRAY_DISCRETE = enum.auto()  # int vector
    CONTINUOUS = enum.auto()  # float scalar
    ARRAY_CONTINUOUS = enum.auto()  # float vector
    NP_ARRAY = enum.auto()  # float vector (jnp)
    BOX = enum.auto()  # float tensor (any shape)
    MULTI = enum.auto()

    @staticmethod
    def to_list(flags: "RLBaseTypes"):
        return [e for e in RLBaseTypes if e in flags and e != RLBaseTypes.NONE]


class DoneTypes(enum.IntEnum):
    """Episode-end discriminator (parity: srl/base/define.py:80).

    Inside compiled code episode end is carried as two booleans (terminated/truncated);
    this enum is only used at the host API boundary.
    """

    NONE = 0
    TERMINATED = 1
    TRUNCATED = 2


class PlayerType:
    """Symbolic player specs for multi-player envs (parity: srl/base/define.py:68).

    A player slot is one of: None (the trained policy), "random", "human",
    an env-provided worker name (e.g. "cpu"), or another algorithm config.
    """

    MAIN = None
    RANDOM = "random"
    HUMAN = "human"
