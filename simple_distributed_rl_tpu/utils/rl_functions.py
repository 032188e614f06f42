"""Shared RL math, jittable (parity: srl/rl/functions.py:1-312).

rescaling (R2D2), symlog/symexp (DreamerV3), twohot encode/decode, the Agent57
beta/gamma/epsilon actor ladders (srl/rl/functions.py:113-155), and masked random
argmax (get_random_max_index, srl/rl/functions.py:157).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def rescaling(x: Array, eps: float = 1e-3) -> Array:
    return jnp.sign(x) * (jnp.sqrt(jnp.abs(x) + 1.0) - 1.0) + eps * x


def inverse_rescaling(x: Array, eps: float = 1e-3) -> Array:
    n = jnp.sqrt(1.0 + 4.0 * eps * (jnp.abs(x) + 1.0 + eps)) - 1.0
    return jnp.sign(x) * (jnp.square(n / (2.0 * eps)) - 1.0)


def huber(err: Array, delta: float = 1.0) -> Array:
    """Elementwise Huber loss on a residual (keras.losses.Huber semantics)."""
    a = jnp.abs(err)
    return jnp.where(a <= delta, 0.5 * jnp.square(err), delta * (a - 0.5 * delta))


def symlog(x: Array) -> Array:
    return jnp.sign(x) * jnp.log(jnp.abs(x) + 1.0)


def symexp(x: Array) -> Array:
    return jnp.sign(x) * (jnp.exp(jnp.abs(x)) - 1.0)


def linear_symlog(x: Array) -> Array:
    """Identity inside |x|<=1, symlog outside (parity: linear_symlog,
    srl/rl/functions.py:50-53 — the GoDQ family's Q-value rescale)."""
    a = jnp.abs(x)
    return jnp.where(a <= 1.0, x, jnp.sign(x) * (jnp.log(jnp.maximum(a, 1.0)) + 1.0))


def inverse_linear_symlog(x: Array) -> Array:
    a = jnp.abs(x)
    return jnp.where(a <= 1.0, x, jnp.sign(x) * jnp.exp(jnp.minimum(a, 30.0) - 1.0))


def twohot_encode(x: Array, bins: int, low: float, high: float) -> Array:
    """Distribute scalars (any batch shape) onto the two nearest of ``bins`` uniform
    bins. Returns x.shape + (bins,)."""
    x = jnp.clip(x, low, high)
    pos = (x - low) / (high - low) * (bins - 1)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, bins - 1)
    w_hi = (pos - lo)[..., None]
    grid = jnp.arange(bins)
    onehot_lo = (grid == lo[..., None]).astype(jnp.float32)
    onehot_hi = (grid == hi[..., None]).astype(jnp.float32)
    return onehot_lo * (1.0 - w_hi) + onehot_hi * w_hi


def twohot_decode(probs: Array, bins: int, low: float, high: float) -> Array:
    centers = jnp.linspace(low, high, bins)
    return jnp.sum(probs * centers, axis=-1)


def random_max_index(q: Array, invalid_mask: Array, key: Array) -> Array:
    """Argmax with uniform tie-breaking among exact maxima and invalid actions
    excluded (parity: funcs.get_random_max_index used by QL,
    srl/algorithms/ql.py:162)."""
    q = jnp.where(invalid_mask, -jnp.inf, q)
    qmax = jnp.max(q, axis=-1, keepdims=True)
    ties = q >= qmax
    u = jax.random.uniform(key, q.shape)
    return jnp.argmax(jnp.where(ties, u, -1.0), axis=-1).astype(jnp.int32)


def epsilon_greedy(
    q: Array, invalid_mask: Array, epsilon: Array, key: Array, tie_break: bool = False
) -> Array:
    """Batched ε-greedy over [B, A] q-values with invalid-action masks."""
    k_eps, k_rand, k_tie = jax.random.split(key, 3)
    b = q.shape[0]
    explore = jax.random.uniform(k_eps, (b,)) < epsilon
    # width comes from q, not the mask: a continuous env's mask is [B, 1] (its raw
    # action count) while the algorithm explores the ENCODED Discrete(division)
    # space — zeros_like(q) broadcasts the mask up (round-3 finding: exploration
    # collapsed to action 0 on discretized Pendulum)
    rand_logits = jnp.where(invalid_mask, -jnp.inf, jnp.zeros_like(q))
    a_rand = jax.random.categorical(k_rand, rand_logits, axis=-1).astype(jnp.int32)
    if tie_break:
        a_greedy = random_max_index(q, invalid_mask, k_tie)
    else:
        a_greedy = jnp.argmax(jnp.where(invalid_mask, -jnp.inf, q), axis=-1).astype(jnp.int32)
    return jnp.where(explore, a_rand, a_greedy)


def agent57_epsilon_list(num_actors: int, epsilon: float = 0.4, alpha: float = 7.0) -> np.ndarray:
    """Per-actor exploration ladder (parity: funcs.create_epsilon_list,
    srl/rl/functions.py:113-155 / Ape-X appendix)."""
    if num_actors <= 1:
        return np.asarray([epsilon**alpha], np.float32)
    i = np.arange(num_actors)
    return (epsilon ** (1.0 + i / (num_actors - 1) * alpha)).astype(np.float32)


def agent57_beta_list(num_actors: int, max_beta: float = 0.3) -> np.ndarray:
    if num_actors <= 1:
        return np.asarray([max_beta], np.float32)
    out = []
    n = num_actors
    for i in range(n):
        if i == 0:
            out.append(0.0)
        elif i == n - 1:
            out.append(max_beta)
        else:
            x = 10.0 * (2.0 * i - (n - 2)) / (n - 2)
            out.append(max_beta * (1.0 / (1.0 + np.exp(-x))))
    return np.asarray(out, np.float32)


def agent57_gamma_list(num_actors: int, gamma0: float = 0.9999, gamma1: float = 0.997, gamma2: float = 0.99) -> np.ndarray:
    if num_actors <= 1:
        return np.asarray([gamma0], np.float32)
    out = []
    n = num_actors
    for i in range(n):
        frac = i / max(n - 1, 1)
        out.append(1.0 - np.exp((1 - frac) * np.log(1 - gamma0) + frac * np.log(1 - gamma2)))
    return np.asarray(out, np.float32)
