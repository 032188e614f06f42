from .blocks import (
    AlphaZeroImageBlock,
    DQNImageBlock,
    DuelingHead,
    FlattenBlock,
    InputBlockConfig,
    MLPBlock,
    NoisyDense,
    QNetwork,
    R2D3ImageBlock,
)

__all__ = [
    "AlphaZeroImageBlock",
    "DQNImageBlock",
    "DuelingHead",
    "FlattenBlock",
    "InputBlockConfig",
    "MLPBlock",
    "NoisyDense",
    "QNetwork",
    "R2D3ImageBlock",
]
