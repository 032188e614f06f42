"""Probability-distribution heads, jittable (parity: srl/rl/tf/distributions/* and
srl/rl/torch_/distributions/*: categorical, gumbel-categorical, normal incl. squashed,
bernoulli, twohot, linear).

Plain pytree-of-arrays objects with log_prob/entropy/sample/kl — no framework classes,
so they compose freely inside jitted losses.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..utils.rl_functions import twohot_decode, twohot_encode

Array = jax.Array


class Categorical:
    def __init__(self, logits: Array):
        self.logits = logits  # [..., A]

    @property
    def probs(self) -> Array:
        return jax.nn.softmax(self.logits, axis=-1)

    def log_probs(self) -> Array:
        return jax.nn.log_softmax(self.logits, axis=-1)

    def log_prob(self, a: Array) -> Array:
        lp = self.log_probs()
        return jnp.take_along_axis(lp, a[..., None], axis=-1)[..., 0]

    def entropy(self) -> Array:
        lp = self.log_probs()
        return -jnp.sum(jnp.exp(lp) * lp, axis=-1)

    def sample(self, key: Array) -> Array:
        return jax.random.categorical(key, self.logits, axis=-1).astype(jnp.int32)

    def mode(self) -> Array:
        return jnp.argmax(self.logits, axis=-1).astype(jnp.int32)

    def kl(self, other: "Categorical") -> Array:
        lp, lq = self.log_probs(), other.log_probs()
        return jnp.sum(jnp.exp(lp) * (lp - lq), axis=-1)


class GumbelCategorical(Categorical):
    """Reparameterized categorical via gumbel-softmax (straight-through sample used by
    the reference's tf gumbel distribution block)."""

    def __init__(self, logits: Array, temperature: float = 1.0):
        super().__init__(logits)
        self.temperature = temperature

    def rsample(self, key: Array) -> Array:
        g = jax.random.gumbel(key, self.logits.shape)
        y = jax.nn.softmax((self.logits + g) / self.temperature, axis=-1)
        hard = jax.nn.one_hot(jnp.argmax(y, axis=-1), self.logits.shape[-1])
        return hard + y - jax.lax.stop_gradient(y)  # straight-through


class Normal:
    def __init__(self, loc: Array, log_scale: Array):
        self.loc = loc
        self.log_scale = jnp.clip(log_scale, -10.0, 2.0)
        self.scale = jnp.exp(self.log_scale)

    def log_prob(self, x: Array) -> Array:
        z = (x - self.loc) / self.scale
        return -0.5 * (z**2 + jnp.log(2.0 * jnp.pi)) - self.log_scale

    def entropy(self) -> Array:
        return 0.5 * (1.0 + jnp.log(2.0 * jnp.pi)) + self.log_scale

    def sample(self, key: Array) -> Array:
        return self.loc + self.scale * jax.random.normal(key, self.loc.shape)

    rsample = sample  # reparameterized by construction

    def mode(self) -> Array:
        return self.loc

    def kl(self, other: "Normal") -> Array:
        return (
            other.log_scale
            - self.log_scale
            + (self.scale**2 + (self.loc - other.loc) ** 2) / (2.0 * other.scale**2)
            - 0.5
        )


class SquashedNormal(Normal):
    """tanh-squashed gaussian with change-of-variables log-prob (SAC; parity:
    srl/rl/tf/distributions normal squashed variant)."""

    def sample_and_log_prob(self, key: Array) -> Tuple[Array, Array]:
        u = super().sample(key)
        a = jnp.tanh(u)
        lp = super().log_prob(u) - jnp.log(1.0 - a**2 + 1e-6)
        return a, lp

    def sample(self, key: Array) -> Array:
        return jnp.tanh(super().sample(key))

    def mode(self) -> Array:
        return jnp.tanh(self.loc)


class Bernoulli:
    def __init__(self, logits: Array):
        self.logits = logits

    @property
    def probs(self) -> Array:
        return jax.nn.sigmoid(self.logits)

    def log_prob(self, x: Array) -> Array:
        return -optax_sigmoid_bce(self.logits, x)

    def sample(self, key: Array) -> Array:
        return (jax.random.uniform(key, self.logits.shape) < self.probs).astype(jnp.float32)

    def mode(self) -> Array:
        return (self.logits > 0).astype(jnp.float32)


def optax_sigmoid_bce(logits: Array, labels: Array) -> Array:
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    return -labels * log_p - (1.0 - labels) * log_not_p


class TwoHot:
    """Scalar regression as a categorical over fixed bins (DreamerV3/MuZero heads;
    parity: srl/rl/tf/distributions twohot)."""

    def __init__(self, logits: Array, low: float, high: float):
        self.logits = logits
        self.low, self.high = low, high
        self.bins = logits.shape[-1]

    def mean(self) -> Array:
        return twohot_decode(jax.nn.softmax(self.logits, axis=-1), self.bins, self.low, self.high)

    def log_prob_of_scalar(self, x: Array) -> Array:
        target = twohot_encode(x, self.bins, self.low, self.high)
        return jnp.sum(target * jax.nn.log_softmax(self.logits, axis=-1), axis=-1)
