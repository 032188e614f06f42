"""Observation processors — static space remaps + jittable value transforms.

Parity: srl/rl/processors/ (ImageProcessor resize/gray/normalize,
DownSamplingProcessor, NormalizeProcessor) and the env-side AtariProcessor
(srl/envs/processors/atari_processor.py). A processor is a pure pair
(remap_space, remap) applied between the env observation space and the RL encode —
the whole pipeline is resolved at trace time (the TPU form of the reference's
processor chain, srl/base/env/env_run.py:40-73 + rl/config get_processors).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from .define import SpaceTypes
from .spaces import Box, Space


class Processor:
    def remap_space(self, space: Space) -> Space:
        return space

    def remap(self, x):
        """Pure, jittable value transform matching remap_space."""
        return x


def _to_gray(x):
    """Collapse ANY channel count to 1 so the remapped space ((h, w, 1)) always
    matches the value — RGB uses luma weights, other widths (e.g. a 4-channel
    feature-map stack) fall back to the mean (round-1 advisor finding)."""
    if x.shape[-1] == 1:
        return x
    if x.shape[-1] == 3:
        return jnp.sum(x * jnp.asarray([0.299, 0.587, 0.114]), axis=-1, keepdims=True)
    return jnp.mean(x, axis=-1, keepdims=True)


@dataclasses.dataclass
class ImageProcessor(Processor):
    """Resize / grayscale / normalize image observations (parity:
    srl/rl/processors/image_processor.py:18)."""

    resize: Tuple[int, int] = (84, 84)  # (H, W)
    grayscale: bool = True
    normalize: bool = False  # -> float32 in [0, 1]

    def remap_space(self, space: Space) -> Space:
        assert isinstance(space, Box) and space.stype.is_image(), f"not an image space: {space}"
        h, w = self.resize
        if self.grayscale:
            shape, stype = (h, w, 1), SpaceTypes.GRAY_3ch
        else:
            c = space.shape[-1] if len(space.shape) == 3 else 1
            shape, stype = (h, w, c), space.stype
        if self.normalize:
            return Box(shape, 0.0, 1.0, jnp.float32, stype)
        return Box(shape, 0, 255, jnp.uint8, stype)

    def remap(self, x):
        x = jnp.asarray(x, jnp.float32)
        if x.ndim == 2:
            x = x[..., None]
        x = _to_gray(x) if self.grayscale else x
        h, w = self.resize
        x = jax.image.resize(x, (h, w, x.shape[-1]), method="bilinear")
        if self.normalize:
            return (x / 255.0).astype(jnp.float32)
        return jnp.clip(x, 0, 255).astype(jnp.uint8)


@dataclasses.dataclass
class DownSamplingProcessor(Processor):
    """Stride-subsample an image (parity: srl/rl/processors/download... the
    reference's DownSamplingProcessor)."""

    factor: int = 2

    def remap_space(self, space: Space) -> Space:
        assert isinstance(space, Box)
        h, w = space.shape[0] // self.factor, space.shape[1] // self.factor
        rest = tuple(space.shape[2:])
        return Box((h, w) + rest, space.low, space.high, space.dtype, space.stype)

    def remap(self, x):
        return x[:: self.factor, :: self.factor]


@dataclasses.dataclass
class NormalizeProcessor(Processor):
    """Affine-normalize a bounded space to [0, 1] (parity: NormalizeProcessor)."""

    def remap_space(self, space: Space) -> Space:
        assert isinstance(space, Box) and space.is_bounded
        self._low, self._high = space.low, space.high
        return Box(space.shape, 0.0, 1.0, jnp.float32, space.stype)

    def remap(self, x):
        return ((jnp.asarray(x, jnp.float32) - self._low) / (self._high - self._low)).astype(
            jnp.float32
        )


@dataclasses.dataclass
class AtariProcessor(Processor):
    """Atari observation preset (parity: srl/envs/processors/atari_processor.py:16
    AtariProcessor: grayscale + resize + optional binarize). `terminal_on_life_loss`
    is an env-side episode semantic, handled by the gym adapter's
    ``terminal_on_life_loss`` option (the host boundary), not here — this processor
    covers the pure observation transform, which on TPU runs inside the jitted chunk."""

    resize: Tuple[int, int] = (84, 84)
    grayscale: bool = True
    binarize: bool = False
    #: optional (top, bottom, left, right) pixel crop applied BEFORE the resize
    #: (parity: AtariPongProcessor trimming to the playfield, atari_processor.py)
    crop: Optional[Tuple[int, int, int, int]] = None

    def remap_space(self, space: Space) -> Space:
        assert isinstance(space, Box) and space.stype.is_image(), f"not an image space: {space}"
        h, w = self.resize
        c = 1 if self.grayscale else (space.shape[-1] if len(space.shape) == 3 else 1)
        stype = SpaceTypes.GRAY_3ch if self.grayscale else space.stype
        return Box((h, w, c), 0, 255, jnp.uint8, stype)

    def remap(self, x):
        x = jnp.asarray(x, jnp.float32)
        if x.ndim == 2:
            x = x[..., None]
        if self.crop is not None:
            t, b, l, r = self.crop
            x = x[t:b, l:r]
        x = _to_gray(x) if self.grayscale else x
        h, w = self.resize
        x = jax.image.resize(x, (h, w, x.shape[-1]), method="bilinear")
        if self.binarize:
            x = jnp.where(x > 127.0, 255.0, 0.0)
        return jnp.clip(x, 0, 255).astype(jnp.uint8)


class AtariPongProcessor(AtariProcessor):
    """Pong preset (parity: atari_processor.py AtariPongProcessor): trim to the
    (35:195, 10:150) playfield, then 64x64 gray binarized two-tone."""

    def __init__(self, resize: Tuple[int, int] = (64, 64)):
        super().__init__(resize=resize, grayscale=True, binarize=True, crop=(35, 195, 10, 150))


def apply_processors(space: Space, processors: List[Processor]):
    """Resolve the full pipeline. Returns (final_space, jittable transform fn)."""
    out_space = space
    for p in processors:
        out_space = p.remap_space(out_space)

    def fn(x):
        for p in processors:
            x = p.remap(x)
        return x

    return out_space, fn
