"""Functional env protocol — the TPU-native re-expression of the reference env runtime.

The reference (pocokhc/simple_distributed_rl) models envs as stateful objects with
``reset()/step()/backup()/restore()`` (srl/base/env/base.py:18,60-133) wrapped by a
bookkeeping EnvRun (srl/base/env/env_run.py:28). Here an env is a pair of PURE functions

    reset(key)               -> (state, TimeStep)
    step(state, action, key) -> (state, TimeStep)

over an explicit state pytree, so that:
  - thousands of env instances run in lockstep under ``jax.vmap`` + ``jit``;
  - ``backup/restore`` (required by MCTS/Go-Explore, srl/base/env/base.py:86) is free —
    the state pytree IS the backup;
  - episode bookkeeping (step counting, truncation, auto-reset — env_run.py:361-368,
    :228) is a wrapper transform, not object state.

Multi-player turn-based envs (srl/base/env/base.py:75,36) carry ``next_player`` in every
TimeStep and emit per-player reward vectors; the play engine turns player rotation into
masked lockstep updates.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..spaces import Discrete, Space

Array = jax.Array


@struct.dataclass
class TimeStep:
    """One observable step of an env instance. All leaves have static shapes."""

    obs: Any  # value of observation_space
    rewards: Array  # [player_num] float32
    terminated: Array  # bool scalar
    truncated: Array  # bool scalar
    invalid_mask: Array  # [num_actions] bool (all-False when not applicable)
    next_player: Array  # int32 scalar

    @property
    def done(self) -> Array:
        return jnp.logical_or(self.terminated, self.truncated)


class EnvCore:
    """Base class for functional envs. Subclasses are cheap static-config objects
    (hashable via id) whose methods are pure functions of (state, action, key)."""

    # --- static metadata --------------------------------------------------
    @property
    def action_space(self) -> Space:
        raise NotImplementedError()

    @property
    def observation_space(self) -> Space:
        raise NotImplementedError()

    @property
    def player_num(self) -> int:
        return 1

    @property
    def max_episode_steps(self) -> int:
        return 99_999

    @property
    def reward_baseline(self):
        """Quality baseline for eval regression tests (parity:
        EnvBase.reward_baseline, srl/base/env/base.py:173)."""
        return None

    @property
    def num_actions(self) -> int:
        a = self.action_space
        return a.n if isinstance(a, Discrete) else 1

    # --- pure functions ---------------------------------------------------
    def reset(self, key: Array) -> Tuple[Any, TimeStep]:
        raise NotImplementedError()

    def step(self, state: Any, action: Any, key: Array) -> Tuple[Any, TimeStep]:
        raise NotImplementedError()

    # --- env-provided opponents (parity: EnvBase.make_worker env workers,
    # e.g. Othello "cpu" negamax, srl/envs/othello.py:404-446, and kaggle
    # "greedy", srl/envs/kaggle/hungry_geese.py:118). Jittable policies so they
    # run INSIDE the vectorized engine: players=[None, "cpu"] works at full
    # lockstep throughput. -------------------------------------------------
    @property
    def worker_names(self) -> Tuple[str, ...]:
        return ()

    def worker_policy(self, name: str, state: Any, ts: TimeStep, key: Array):
        """Pure jittable policy for a named env worker: (state, ts, key) -> env
        action for ``ts.next_player``."""
        raise NotImplementedError(f"{type(self).__name__} has no worker {name!r}")

    # --- host-side helpers (never jitted) ---------------------------------
    def render_terminal(self, state: Any) -> None:
        pass

    def action_to_str(self, action) -> str:
        return str(action)

    # --- convenience ------------------------------------------------------
    def timestep(
        self,
        obs: Any,
        rewards: Any = 0.0,
        terminated: Any = False,
        truncated: Any = False,
        invalid_mask: Optional[Array] = None,
        next_player: Any = 0,
    ) -> TimeStep:
        r = jnp.broadcast_to(jnp.asarray(rewards, jnp.float32), (self.player_num,))
        if invalid_mask is None:
            invalid_mask = jnp.zeros((self.num_actions,), jnp.bool_)
        return TimeStep(
            obs=obs,
            rewards=r,
            terminated=jnp.asarray(terminated, jnp.bool_),
            truncated=jnp.asarray(truncated, jnp.bool_),
            invalid_mask=invalid_mask,
            next_player=jnp.asarray(next_player, jnp.int32),
        )


@struct.dataclass
class AutoResetState:
    """Carried state of the auto-reset transform."""

    env_state: Any
    step_num: Array  # int32, steps taken in current episode
    episode_reward: Array  # [P] accumulated
    # snapshot of the finished episode, populated at the step that ended it
    last_episode_reward: Array  # [P]
    last_episode_steps: Array  # int32


class AutoResetEnv:
    """Episode bookkeeping + auto-reset as a pure transform.

    Replaces EnvRun's step-count truncation and episode restart
    (srl/base/env/env_run.py:361-368 and core_play.py:138-159): when a step ends the
    episode (terminated or step-count truncation), the NEXT step resets instead of
    stepping, so the terminal TimeStep is still observable by the algorithm. Under vmap
    each instance resets independently — the lockstep analog of per-env episode ends.
    """

    def __init__(
        self,
        env: EnvCore,
        max_episode_steps: Optional[int] = None,
        frameskip: int = 0,
        random_noop_max: int = 0,
    ):
        """``frameskip`` repeats each action N extra env steps accumulating rewards
        (parity: EnvConfig.frameskip + reward accumulation,
        srl/base/env/env_run.py:281-291); ``random_noop_max`` takes 0..N random
        actions after each reset before handing control to the policy (parity:
        EnvConfig.random_noop_max, env_run.py:228)."""
        self.env = env
        self.max_episode_steps = int(max_episode_steps or env.max_episode_steps)
        self.frameskip = int(frameskip)
        self.random_noop_max = int(random_noop_max)
        # truncation convention: the reference's EnvRun rule is strictly-greater
        # (env_run.py:361 — an episode runs max+1 steps), but envs that mirror a
        # gymnasium id (native CartPole/Pendulum/...) declare gym_time_limit so
        # episodes truncate AT max like gym's TimeLimit wrapper does — otherwise
        # the native env scores one extra step of reward/cost per episode vs the
        # gym env the reference actually runs (round-4 parity finding)
        self.gym_time_limit = bool(getattr(env, "gym_time_limit", False))

    def _noop_reset(self, key: Array):
        env_state, ts = self.env.reset(key)
        if self.random_noop_max <= 0:
            return env_state, ts
        k_n, key = jax.random.split(key)
        n = jax.random.randint(k_n, (), 0, self.random_noop_max + 1)

        def body(i, carry):
            env_state, ts, key = carry
            key, k_a, k_s = jax.random.split(key, 3)
            a = self.env.action_space.sample(k_a, ts.invalid_mask)
            ns, nts = self.env.step(env_state, a, k_s)
            # stop advancing once done or past n noops
            use = jnp.logical_and(i < n, jnp.logical_not(nts.done))
            env_state = jax.tree.map(
                lambda new, old: jnp.where(use, new, old) if new.ndim == 0
                else jnp.where(jnp.reshape(use, (1,) * new.ndim), new, old),
                ns, env_state,
            )
            ts = jax.tree.map(
                lambda new, old: jnp.where(use, new, old) if new.ndim == 0
                else jnp.where(jnp.reshape(use, (1,) * new.ndim), new, old),
                nts, ts,
            )
            return env_state, ts, key

        env_state, ts, _ = jax.lax.fori_loop(
            0, self.random_noop_max, body, (env_state, ts, key)
        )
        return env_state, ts

    def _skip_step(self, env_state, action, key):
        """One policy action = 1 + frameskip env steps with accumulated rewards."""
        env_state, ts = self.env.step(env_state, action, key)
        if self.frameskip <= 0:
            return env_state, ts
        acc = ts.rewards

        def body(i, carry):
            env_state, ts, acc, key = carry
            key, k_s = jax.random.split(key)
            ns, nts = self.env.step(env_state, action, k_s)
            use = jnp.logical_not(ts.done)

            def sel(new, old):
                m = jnp.reshape(use, (1,) * new.ndim) if new.ndim else use
                return jnp.where(m, new, old)

            env_state = jax.tree.map(sel, ns, env_state)
            acc = acc + jnp.where(use, nts.rewards, 0.0)
            ts = jax.tree.map(sel, nts, ts)
            return env_state, ts, acc, key

        env_state, ts, acc, _ = jax.lax.fori_loop(
            0, self.frameskip, body, (env_state, ts, acc, key)
        )
        return env_state, ts.replace(rewards=acc)

    def reset(self, key: Array) -> Tuple[AutoResetState, TimeStep]:
        env_state, ts = self._noop_reset(key)
        p = self.env.player_num
        state = AutoResetState(
            env_state=env_state,
            step_num=jnp.asarray(0, jnp.int32),
            episode_reward=jnp.zeros((p,), jnp.float32),
            last_episode_reward=jnp.zeros((p,), jnp.float32),
            last_episode_steps=jnp.asarray(0, jnp.int32),
        )
        return state, ts

    def step(
        self, state: AutoResetState, prev_ts: TimeStep, action: Any, key: Array
    ) -> Tuple[AutoResetState, TimeStep]:
        key_step, key_reset = jax.random.split(key)

        def do_reset(_):
            env_state, ts = self._noop_reset(key_reset)
            # envs may declare state fields that survive auto-reset (cross-episode
            # counters: procedural-generation cursors, the parity harness's
            # injected-decision index, ...)
            persist = getattr(self.env, "persistent_fields", ())
            if persist:
                env_state = env_state.replace(
                    **{f: getattr(state.env_state, f) for f in persist}
                )
            new = AutoResetState(
                env_state=env_state,
                step_num=jnp.asarray(0, jnp.int32),
                episode_reward=jnp.zeros_like(state.episode_reward),
                last_episode_reward=state.last_episode_reward,
                last_episode_steps=state.last_episode_steps,
            )
            return new, ts

        def do_step(_):
            env_state, ts = self._skip_step(state.env_state, action, key_step)
            step_num = state.step_num + 1
            # strictly-greater comparison matches the reference (env_run.py:361): an episode
            # runs at most max_episode_steps + 1 steps; gym_time_limit envs instead
            # truncate AT max, matching gymnasium's TimeLimit (see __init__)
            cap = self.max_episode_steps - 1 if self.gym_time_limit else self.max_episode_steps
            truncated = jnp.logical_or(ts.truncated, step_num > cap)
            ts = ts.replace(truncated=jnp.logical_and(truncated, jnp.logical_not(ts.terminated)))
            ep_reward = state.episode_reward + ts.rewards
            done = jnp.logical_or(ts.terminated, ts.truncated)
            new = AutoResetState(
                env_state=env_state,
                step_num=step_num,
                episode_reward=ep_reward,
                last_episode_reward=jnp.where(done, ep_reward, state.last_episode_reward),
                last_episode_steps=jnp.where(done, step_num, state.last_episode_steps),
            )
            return new, ts

        return jax.lax.cond(prev_ts.done, do_reset, do_step, None)
