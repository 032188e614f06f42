from .core import (
    AnySpace,
    ArrayContinuous,
    ArrayDiscrete,
    Box,
    Continuous,
    Discrete,
    Encoder,
    Multi,
    NpArray,
    Space,
    Text,
)

__all__ = [
    "AnySpace",
    "ArrayContinuous",
    "ArrayDiscrete",
    "Box",
    "Continuous",
    "Discrete",
    "Encoder",
    "Multi",
    "NpArray",
    "Space",
    "Text",
]
