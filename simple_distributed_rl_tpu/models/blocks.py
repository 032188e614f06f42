"""Flax NN block zoo — the TPU backend replacing the reference's twin tf/torch zoos.

Parity targets: srl/rl/models/config/input_block.py:16-305 (declarative input tower
with dqn/r2d3/alphazero/muzero presets), hidden_block.py (MLP stack),
dueling_network.py (dueling head with noisy option), srl/rl/tf/blocks/* and
srl/rl/torch_/blocks/*. One implementation instead of two: flax modules compiled by
XLA onto the MXU; compute in bfloat16 where safe, params in float32.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..define import SpaceTypes
from ..spaces import Box, Space


def _activation(name: str) -> Callable:
    return {
        "relu": nn.relu,
        "silu": nn.silu,
        "swish": nn.silu,
        "tanh": jnp.tanh,
        "gelu": nn.gelu,
        "elu": nn.elu,
    }[name.lower()]


class MLPBlock(nn.Module):
    """Hidden MLP stack (parity: HiddenBlockConfig, srl/rl/models/config/hidden_block.py:8)."""

    features: Sequence[int] = (64, 64)
    activation: str = "relu"
    kernel_init: Any = nn.initializers.he_normal()
    dtype: Any = None  # computation dtype (bfloat16 feeds the MXU; params stay f32)

    @nn.compact
    def __call__(self, x):
        act = _activation(self.activation)
        for f in self.features:
            x = nn.Dense(f, kernel_init=self.kernel_init, dtype=self.dtype)(x)
            x = act(x)
        return x


class DQNImageBlock(nn.Module):
    """The Nature-DQN conv tower (parity: input_block set_dqn_block preset,
    srl/rl/models/config/input_block.py:100)."""

    filters: Sequence[int] = (32, 64, 64)
    activation: str = "relu"
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        act = _activation(self.activation)
        x = act(nn.Conv(self.filters[0], (8, 8), strides=(4, 4), padding="SAME", dtype=self.dtype)(x))
        x = act(nn.Conv(self.filters[1], (4, 4), strides=(2, 2), padding="SAME", dtype=self.dtype)(x))
        x = act(nn.Conv(self.filters[2], (3, 3), strides=(1, 1), padding="SAME", dtype=self.dtype)(x))
        return x.reshape((x.shape[0], -1))


class R2D3ImageBlock(nn.Module):
    """IMPALA-style resnet tower (parity: set_r2d3_block preset)."""

    filters: Sequence[int] = (16, 32, 32)
    activation: str = "relu"
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        act = _activation(self.activation)
        for f in self.filters:
            x = nn.Conv(f, (3, 3), padding="SAME", dtype=self.dtype)(x)
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
            for _ in range(2):
                block_in = x
                y = act(x)
                y = nn.Conv(f, (3, 3), padding="SAME", dtype=self.dtype)(y)
                y = act(y)
                y = nn.Conv(f, (3, 3), padding="SAME", dtype=self.dtype)(y)
                x = block_in + y
        x = act(x)
        return x.reshape((x.shape[0], -1))


class AlphaZeroImageBlock(nn.Module):
    """Conv+BN resnet tower (parity: set_alphazero_block preset)."""

    filters: int = 256
    blocks: int = 19

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.filters, (3, 3), padding="SAME", use_bias=False)(x)
        x = nn.LayerNorm()(x)
        x = nn.relu(x)
        for _ in range(self.blocks):
            y = nn.Conv(self.filters, (3, 3), padding="SAME", use_bias=False)(x)
            y = nn.LayerNorm()(y)
            y = nn.relu(y)
            y = nn.Conv(self.filters, (3, 3), padding="SAME", use_bias=False)(y)
            y = nn.LayerNorm()(y)
            x = nn.relu(x + y)
        return x


class _MuZeroResBlock(nn.Module):
    filters: int
    activation: str = "relu"
    use_layer_normalization: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        act = _activation(self.activation)
        y = nn.Conv(self.filters, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype)(x)
        if self.use_layer_normalization:
            y = nn.LayerNorm()(y)
        y = act(y)
        y = nn.Conv(self.filters, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype)(y)
        if self.use_layer_normalization:
            y = nn.LayerNorm()(y)
        return act(x + y)


class MuZeroAtariBlock(nn.Module):
    """The MuZero Atari representation downsampler (parity: set_muzero_atari_block,
    srl/rl/models/config/input_block.py:161 / srl/rl/tf/blocks/muzero_atari_block.py:16):
    stride-2 conv(F) -> 2 res -> stride-2 conv(2F) -> 3 res -> avgpool/2 -> 3 res ->
    avgpool/2, i.e. a 16x spatial reduction keeping the output as a feature map for the
    latent dynamics model. All convs 3x3 so XLA tiles them onto the MXU."""

    filters: int = 128
    activation: str = "relu"
    use_layer_normalization: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        act = _activation(self.activation)
        res = lambda f: _MuZeroResBlock(
            f, self.activation, self.use_layer_normalization, dtype=self.dtype)
        x = act(nn.Conv(self.filters, (3, 3), strides=(2, 2), padding="SAME", use_bias=False,
                        dtype=self.dtype)(x))
        x = res(self.filters)(x)
        x = res(self.filters)(x)
        x = act(nn.Conv(self.filters * 2, (3, 3), strides=(2, 2), padding="SAME", use_bias=False,
                        dtype=self.dtype)(x))
        for _ in range(3):
            x = res(self.filters * 2)(x)
        x = nn.avg_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        for _ in range(3):
            x = res(self.filters * 2)(x)
        x = nn.avg_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        return x


class NoisyDense(nn.Module):
    """Factorized-gaussian noisy linear layer (parity: the noisy dense layers in
    srl/rl/tf/blocks/dueling_network.py / Fortunato et al.). Noise is resampled per
    call from an explicit rng collection 'noise'."""

    features: int
    sigma0: float = 0.5

    @nn.compact
    def __call__(self, x, deterministic: bool = False):
        in_f = x.shape[-1]
        mu_init = nn.initializers.uniform(scale=2.0 / np.sqrt(in_f))
        sigma_init = nn.initializers.constant(self.sigma0 / np.sqrt(in_f))
        w_mu = self.param("w_mu", mu_init, (in_f, self.features))
        w_sigma = self.param("w_sigma", sigma_init, (in_f, self.features))
        b_mu = self.param("b_mu", mu_init, (self.features,))
        b_sigma = self.param("b_sigma", sigma_init, (self.features,))
        if deterministic or not self.has_rng("noise"):
            return x @ w_mu + b_mu
        key = self.make_rng("noise")
        k1, k2 = jax.random.split(key)

        def f(e):
            return jnp.sign(e) * jnp.sqrt(jnp.abs(e))

        eps_in = f(jax.random.normal(k1, (in_f, 1)))
        eps_out = f(jax.random.normal(k2, (1, self.features)))
        w = w_mu + w_sigma * (eps_in @ eps_out)
        b = b_mu + b_sigma * eps_out[0]
        return x @ w + b


class DuelingHead(nn.Module):
    """Dueling value/advantage head (parity: DuelingNetworkConfig,
    srl/rl/models/config/dueling_network.py:8)."""

    num_actions: int
    hidden: int = 64
    activation: str = "relu"
    noisy: bool = False
    dueling_type: str = "average"  # "average" | "max" | "naive"
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        act = _activation(self.activation)
        dense = (lambda f: NoisyDense(f)) if self.noisy else (
            lambda f: nn.Dense(f, dtype=self.dtype))
        v = act(dense(self.hidden)(x))
        v = dense(1)(v)
        a = act(dense(self.hidden)(x))
        a = dense(self.num_actions)(a)
        if self.dueling_type == "average":
            return v + a - jnp.mean(a, axis=-1, keepdims=True)
        if self.dueling_type == "max":
            return v + a - jnp.max(a, axis=-1, keepdims=True)
        return v + a


@dataclasses.dataclass
class InputBlockConfig:
    """Declarative input tower (parity: InputBlockConfig,
    srl/rl/models/config/input_block.py:16): image obs -> conv preset, vector obs ->
    flatten(+MLP). ``create_block(obs_space)`` resolves statically from the space's
    stype."""

    image_preset: str = "dqn"  # "dqn" | "r2d3" | "alphazero"
    value_features: Tuple[int, ...] = ()
    activation: str = "relu"

    def set_dqn_block(self):
        self.image_preset = "dqn"
        return self

    def set_r2d3_block(self):
        self.image_preset = "r2d3"
        return self

    def set_alphazero_block(self):
        self.image_preset = "alphazero"
        return self

    def set_muzero_atari_block(self, filters: int = 128, use_layer_normalization: bool = False):
        self.image_preset = "muzero_atari"
        self.muzero_filters = filters
        self.muzero_layer_norm = use_layer_normalization
        return self

    def create_block(self, obs_space: Space, dtype: Any = None) -> nn.Module:
        if isinstance(obs_space, Box) and obs_space.stype.is_image():
            if self.image_preset == "dqn":
                return DQNImageBlock(activation=self.activation, dtype=dtype)
            if self.image_preset == "r2d3":
                return R2D3ImageBlock(activation=self.activation, dtype=dtype)
            if self.image_preset == "muzero_atari":
                return MuZeroAtariBlock(
                    filters=getattr(self, "muzero_filters", 128),
                    activation=self.activation,
                    use_layer_normalization=getattr(self, "muzero_layer_norm", False),
                    dtype=dtype,
                )
            return AlphaZeroImageBlock()
        return FlattenBlock(features=self.value_features, activation=self.activation)


class FlattenBlock(nn.Module):
    features: Tuple[int, ...] = ()
    activation: str = "relu"

    @nn.compact
    def __call__(self, x):
        x = x.reshape((x.shape[0], -1)).astype(jnp.float32)
        if self.features:
            x = MLPBlock(self.features, self.activation)(x)
        return x


class QNetwork(nn.Module):
    """input block -> hidden MLP -> (dueling) Q head. The flagship DQN-family model."""

    num_actions: int
    obs_space: Any = None
    input_block: Optional[InputBlockConfig] = None
    hidden: Sequence[int] = (64, 64)
    activation: str = "relu"
    dueling: bool = False
    noisy: bool = False
    #: computation dtype for matmuls/convs (params stay float32); "bfloat16"
    #: feeds the MXU at full rate (parity: the reference's tf mixed-precision
    #: policy, srl/base/system/device.py)
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        ib = self.input_block or InputBlockConfig(activation=self.activation)
        x = ib.create_block(self.obs_space, dtype=self.dtype)(x)
        if x.ndim > 2:
            # spatial-map input towers (muzero_atari / alphazero keep their
            # feature map for the latent-dynamics use case) flatten before the
            # MLP head when composed into a Q network
            x = x.reshape((x.shape[0], -1))
        x = MLPBlock(self.hidden, self.activation, dtype=self.dtype)(x)
        if self.dueling:
            q = DuelingHead(self.num_actions, noisy=self.noisy,
                            activation=self.activation, dtype=self.dtype)(x)
        elif self.noisy:
            q = NoisyDense(self.num_actions)(x)
        else:
            q = nn.Dense(self.num_actions, dtype=self.dtype)(x)
        return q.astype(jnp.float32)
