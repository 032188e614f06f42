"""Shared building blocks for the algorithm zoo: chronological chunk views, n-step
returns, masked GAE, target-network updates.

The play engine emits transitions as [T, B*(1+P)] slot grids (see PlayEngine). For an
env b the slots (t, b*(1+P)+s) in (t, s) lexicographic order are CHRONOLOGICAL: slot 0
(T1) completes the previous action before the step; the T2 slots fire at episode end
after it. Most slots are invalid most steps (T2 only fires at done), so consumers
either pass accumulators through invalid entries (masked_gae) or compact valid entries
first (nstep_returns). This replaces the reference's per-worker python accumulation
(multistep in srl/algorithms/rainbow/, GAE in srl/algorithms/ppo/ppo.py) with
vectorized scans.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp

from .base import Transition

Array = jax.Array


def to_env_sequences(transitions: Transition, mask: Array, num_envs: int):
    """[T, B*S, ...] slot grid -> per-env chronological sequences [B, T*S, ...].

    Returns (seq, valid, is_final): ``is_final`` marks entries emitted from the T2
    (episode-flush) slots — the LAST transition of an episode whether it terminated or
    truncated. Truncated finals have undone=1 (they may bootstrap) but are still hard
    sequence boundaries: n-step windows, lambda-chains and MC returns must not cross
    them."""
    T, N = mask.shape
    S = N // num_envs

    def r(x):
        y = x.reshape((T, num_envs, S) + x.shape[2:])
        y = jnp.moveaxis(y, 0, 1)
        return y.reshape((num_envs, T * S) + x.shape[2:])

    # slot 0 is the T1 (mid-episode) slot; slots 1..S-1 are T2 flush slots
    slot_final = jnp.tile(
        jnp.arange(S)[None, :] > 0, (T, num_envs)
    ).reshape(T, num_envs * S)
    valid = r(mask)
    return jax.tree.map(r, transitions), valid, r(slot_final) & valid


def compact_sequences(seq: Any, valid: Array) -> Tuple[Any, Array]:
    """Per-row stable compaction: move valid entries to the front, preserving order.
    Returns (compacted pytree, count-mask [B, L] with True for the first count_b
    entries). After compaction each row is the env's episodes laid out back-to-back."""
    order = jnp.argsort(jnp.logical_not(valid), axis=1, stable=True)  # [B, L]

    def g(x):
        return jnp.take_along_axis(
            x, order.reshape(order.shape + (1,) * (x.ndim - 2)), axis=1
        )

    counts = valid.sum(axis=1, keepdims=True)
    in_range = jnp.arange(valid.shape[1])[None, :] < counts
    return jax.tree.map(g, seq), in_range


def nstep_returns(
    seq: Transition, valid: Array, n: int, discount: float, is_final: Array = None
) -> Tuple[Transition, Array, Array]:
    """n-step transitions from per-env chronological 1-step sequences [B, L] (parity:
    Rainbow multistep, srl/algorithms/rainbow/).

    Compacts valid entries first; then for each base index i consumes up to n
    consecutive transitions, stopping after a terminal (undone=0). Returns
    (transitions, mask, bootstrap_discount) where reward holds the n-step return and
    next_obs/undone come from the last consumed entry; bootstrap_discount is
    gamma^k for the Q-bootstrap. Windows that run off the chunk tail without closing
    are masked out (< (n-1)/L of samples for typical chunks)."""
    if is_final is None:
        is_final = (seq.undone == 0.0) & valid
    (seq, is_final_c), in_range = compact_sequences((seq, is_final), valid)
    B, L = in_range.shape

    def shift(x, j):
        if j == 0:
            return x
        pad = jnp.zeros_like(x[:, :1])
        return jnp.concatenate([x[:, j:], jnp.repeat(pad, j, axis=1)], axis=1)

    # alive_j: entry i+j is consumed by window i
    reward = jnp.zeros((B, L), jnp.float32)
    alive = in_range.astype(jnp.float32)  # j = 0
    k_last = jnp.zeros((B, L), jnp.int32)
    closed = jnp.zeros((B, L), jnp.bool_)
    undone_out = jnp.zeros((B, L), jnp.float32)

    for j in range(n):
        rj = shift(seq.reward, j)
        uj = shift(seq.undone, j)
        fj = shift(is_final_c.astype(jnp.float32), j)
        inr = shift(in_range.astype(jnp.float32), j)
        take = alive * inr  # [B, L] 0/1
        reward = reward + (discount**j) * rj * take
        k_last = jnp.where(take > 0, j, k_last)
        undone_out = jnp.where(take > 0, uj, undone_out)
        # the window closes at any episode-final entry (terminated OR truncated);
        # truncated finals keep undone=1 so the bootstrap still applies
        closed = jnp.logical_or(closed, (take > 0) & (fj > 0))
        alive = take * uj * (1.0 - fj)

    consumed = k_last + 1
    # valid window: base entry in range AND (closed by a terminal OR n full entries)
    out_mask = in_range & (closed | (consumed >= n))

    idx = jnp.minimum(jnp.arange(L)[None, :] + k_last, L - 1)

    def gather_last(x):
        return jnp.take_along_axis(x, idx.reshape((B, L) + (1,) * (x.ndim - 2)), axis=1)

    out = Transition(
        obs=seq.obs,
        action=seq.action,
        reward=reward,
        next_obs=jax.tree.map(gather_last, seq.next_obs),
        undone=undone_out,
        invalid_mask=seq.invalid_mask,
        next_invalid_mask=gather_last(seq.next_invalid_mask),
    )
    bootstrap_discount = discount ** consumed.astype(jnp.float32)
    return out, out_mask, bootstrap_discount


def masked_gae(
    rewards: Array,
    values: Array,
    next_values: Array,
    undone: Array,
    valid: Array,
    discount: float,
    gae_lambda: float,
    is_final: Array = None,
) -> Tuple[Array, Array]:
    """GAE over per-env chronological sequences [B, L] with invalid slots (parity: the
    GAE path of srl/algorithms/ppo/ppo.py). Backward scan; invalid entries pass the
    accumulator through unchanged (chronology makes this exact: within an episode the
    next valid entry IS the next transition, and terminals stop the recursion via
    undone=0). Returns (advantages, returns), zero at invalid entries."""
    if is_final is None:
        is_final = (undone == 0.0) & valid
    delta = rewards + discount * undone * next_values - values
    delta = jnp.where(valid, delta, 0.0)

    # the lambda-chain must break at EVERY episode-final entry: terminated (undone=0
    # kills the term anyway) and truncated (undone=1, bootstrap stays in delta, but
    # the accumulator must not leak into the previous episode)
    chain = undone * (1.0 - is_final.astype(jnp.float32))

    def step(carry, x):
        d, u, v = x
        a = d + discount * gae_lambda * u * carry
        a = jnp.where(v, a, carry)
        return a, a

    _, adv_rev = jax.lax.scan(
        step,
        jnp.zeros(rewards.shape[0]),
        (delta.T[::-1], chain.T[::-1], valid.T[::-1]),
    )
    adv = adv_rev[::-1].T
    adv = jnp.where(valid, adv, 0.0)
    return adv, adv + values


def periodic_target_sync(target_params: Any, params: Any, train_count: Array, interval: int) -> Any:
    sync = (train_count % interval) == 0
    return jax.tree.map(lambda t, p: jnp.where(sync, p, t), target_params, params)


def soft_target_update(target_params: Any, params: Any, tau: float) -> Any:
    return jax.tree.map(lambda t, p: (1.0 - tau) * t + tau * p, target_params, params)


def masked_update(ready: Array, new_tree: Any, old_tree: Any) -> Any:
    """Warmup gate without control flow (see DQN.train)."""
    return jax.tree.map(lambda n, o: jnp.where(ready, n, o), new_tree, old_tree)
