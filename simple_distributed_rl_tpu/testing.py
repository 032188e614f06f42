"""Public test harness for user envs and algorithms.

Parity: the reference ships srl.test (srl/test/env.py:10-130 env contract checks,
srl/test/rl.py:13-112 algorithm quick-train checks) so downstream users can validate
their own components; this module is the same idea for the functional protocol.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .envs.core import EnvCore
from .spaces import Discrete


def check_env(env: EnvCore, steps: int = 200, seed: int = 0) -> None:
    """Validate the env contract: space/value consistency, determinism of the pure
    step function, reward/done shapes, invalid-mask correctness, vmap-ability
    (the functional analog of srl/test/env.py's checks incl. the backup/restore
    determinism requirement — here determinism of step given (state, action, key))."""
    key = jax.random.PRNGKey(seed)
    aspace, ospace = env.action_space, env.observation_space
    P, A = env.player_num, env.num_actions

    # reset contract
    k1, key = jax.random.split(key)
    state, ts = env.reset(k1)
    assert ts.rewards.shape == (P,), f"rewards must be [{P}]"
    assert ts.invalid_mask.shape == (A,)
    assert not bool(ts.terminated), "reset must not be terminal"
    chex_shape = jax.tree.map(jnp.shape, ts.obs)
    del chex_shape

    # determinism: same (state, action, key) -> identical results (host-backed envs
    # are stateful on the host, so the pure-function property doesn't apply there)
    is_host = bool(getattr(env, "is_host_env", False))
    if not is_host:
        k2, key = jax.random.split(key)
        a = aspace.sample(k2, ts.invalid_mask)
        s1, t1 = env.step(state, a, k2)
        s2, t2 = env.step(state, a, k2)
        for x, y in zip(jax.tree.leaves((s1, t1.obs)), jax.tree.leaves((s2, t2.obs))):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    # random rollout obeys the declared spaces
    state, ts = env.reset(k1)
    for i in range(steps):
        key, ka, ks = jax.random.split(key, 3)
        if isinstance(aspace, Discrete):
            # invalid actions must be masked consistently
            assert not bool(ts.invalid_mask.all()), "every action invalid"
        a = aspace.sample(ka, ts.invalid_mask)
        state, ts = env.step(state, a, ks)
        assert np.isfinite(np.asarray(ts.rewards)).all()
        assert 0 <= int(ts.next_player) < P
        if bool(ts.terminated) or bool(ts.truncated):
            key, kr = jax.random.split(key)
            state, ts = env.reset(kr)

    if is_host:
        # host envs vectorize through the batched pool transform instead of vmap
        bar = env.make_batched_autoreset(4)
        b_state, b_ts = bar.reset_batch(jax.random.split(key, 4))
        b_a = jax.vmap(aspace.sample)(jax.random.split(key, 4), b_ts.invalid_mask)
        key, kb = jax.random.split(key)
        b_state2, b_ts2 = bar.step_batch(b_state, b_ts, b_a, jax.random.split(kb, 4))
        assert b_ts2.rewards.shape == (4, P)
        return

    # vmap-ability: the core TPU requirement
    B = 8
    keys = jax.random.split(key, B)
    v_state, v_ts = jax.vmap(env.reset)(keys)
    v_a = jax.vmap(aspace.sample)(jax.random.split(key, B), v_ts.invalid_mask)
    v_state2, v_ts2 = jax.vmap(env.step)(v_state, v_a, jax.random.split(key, B))
    assert v_ts2.rewards.shape == (B, P)

    # jit-ability
    jitted = jax.jit(env.step)
    jitted(state, a, key)


def check_algorithm(
    algo,
    env_id: str = "Grid",
    train_steps: int = 2000,
    players: Optional[Sequence] = None,
    seed: int = 0,
) -> None:
    """Smoke-validate a user algorithm end-to-end: setup, short train, eval,
    save/load round-trip (parity: srl/test/rl.py test_rl quick tier)."""
    import os
    import tempfile

    from .runner import Runner

    r = Runner(env_id, algo, num_envs=8, players=players, seed=seed)
    r.train(max_steps=train_steps, progress=False)
    rewards = r.evaluate(8)
    assert np.isfinite(rewards).all(), f"non-finite eval reward: {rewards}"

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "params.pkl.xz")
        r.save_parameter(p)
        r.load_parameter(p)
    r.train(max_steps=train_steps // 2, progress=False)
