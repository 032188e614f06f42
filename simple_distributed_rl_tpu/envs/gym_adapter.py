"""Gymnasium interop — the escape hatch for host-side (non-jittable) envs.

Parity target: srl/base/env/gymnasium_wrapper.py:31-228 (recursive space
auto-conversion incl. Dict/Tuple -> Multi, value encode/decode, seed plumbing, render
passthrough). Unlike the built-in pure-function envs this wrapper steps on the HOST —
it exists for capability coverage (any gymnasium env runs), not for the TPU fast path.
Prefer the native envs in this package (CartPole/Pendulum/... are re-implemented as
pure JAX) for throughput.

Vectorization design (round-2 rebuild): the engine cannot ``vmap`` an ordered host
callback, and unordered callbacks cannot drive a stateful env pool safely. Instead the
adapter provides a NATIVELY BATCHED auto-reset transform (``HostBatchedAutoReset``):
one ordered ``io_callback`` per lockstep step carries the whole [B] batch of actions
to the host, where a pool of B dedicated env instances (indexed by slot id) steps
sequentially — reset-on-done, frameskip, noop-reset and ALE life-loss handled next to
the envs themselves. The play engine detects ``is_host_batched`` and skips its own
vmap/AutoResetEnv for these envs.
"""

from __future__ import annotations

import importlib.util
import logging
import threading
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

logger = logging.getLogger(__name__)

from ..define import SpaceTypes
from ..spaces import ArrayDiscrete, Box, Discrete, Multi, Space, Text
from .core import EnvCore, TimeStep

_HAS_GYMNASIUM = importlib.util.find_spec("gymnasium") is not None
_HAS_GYM = importlib.util.find_spec("gym") is not None


def is_available(env_id: str) -> bool:
    if not _HAS_GYMNASIUM:
        return False
    import gymnasium

    return env_id in gymnasium.registry


# ---------------------------------------------------------------------------
# Recursive space/value conversion (parity: gymnasium_wrapper.py:31-226)
# ---------------------------------------------------------------------------

def convert_space(gym_space) -> Space:
    """gymnasium space -> native space, recursing through Dict/Tuple into Multi
    (parity: the reference's recursive flatten to MultiSpace,
    srl/base/env/gymnasium_wrapper.py:31-136)."""
    import gymnasium

    if isinstance(gym_space, gymnasium.spaces.Discrete):
        return Discrete(int(gym_space.n), start=int(gym_space.start))
    if isinstance(gym_space, gymnasium.spaces.MultiDiscrete):
        nvec = np.asarray(gym_space.nvec).reshape(-1)
        return ArrayDiscrete(int(nvec.size), 0, tuple((nvec - 1).tolist()))
    if isinstance(gym_space, gymnasium.spaces.MultiBinary):
        n = int(np.prod(gym_space.shape))
        return ArrayDiscrete(n, 0, 1)
    if isinstance(gym_space, gymnasium.spaces.Box):
        stype = SpaceTypes.CONTINUOUS
        if len(gym_space.shape) == 3 and gym_space.dtype == np.uint8:
            stype = SpaceTypes.COLOR if gym_space.shape[-1] == 3 else SpaceTypes.FEATURE_MAP
        elif len(gym_space.shape) == 2 and gym_space.dtype == np.uint8:
            stype = SpaceTypes.GRAY_2ch
        return Box(
            gym_space.shape,
            float(np.min(gym_space.low)),
            float(np.max(gym_space.high)),
            jnp.dtype(gym_space.dtype),
            stype,
        )
    if isinstance(gym_space, gymnasium.spaces.Text):
        return Text(max_length=int(gym_space.max_length))
    if isinstance(gym_space, gymnasium.spaces.Tuple):
        return Multi([convert_space(s) for s in gym_space.spaces])
    if isinstance(gym_space, gymnasium.spaces.Dict):
        return Multi([convert_space(gym_space.spaces[k]) for k in sorted(gym_space.spaces)])
    raise ValueError(f"unsupported gymnasium space: {gym_space}")


def make_obs_converter(gym_space, native: Space) -> Callable[[Any], Any]:
    """host gym observation value -> native space value (numpy pytree)."""
    import gymnasium

    if isinstance(gym_space, gymnasium.spaces.Tuple):
        subs = [make_obs_converter(s, n) for s, n in zip(gym_space.spaces, native.spaces)]
        return lambda v: tuple(f(x) for f, x in zip(subs, v))
    if isinstance(gym_space, gymnasium.spaces.Dict):
        keys = sorted(gym_space.spaces)
        subs = [make_obs_converter(gym_space.spaces[k], n) for k, n in zip(keys, native.spaces)]
        return lambda v: tuple(f(v[k]) for f, k in zip(subs, keys))
    if isinstance(gym_space, (gymnasium.spaces.MultiDiscrete, gymnasium.spaces.MultiBinary)):
        return lambda v: np.asarray(v, np.int32).reshape(-1)
    if isinstance(gym_space, gymnasium.spaces.Discrete):
        return lambda v: np.asarray(v, np.int32)
    if isinstance(gym_space, gymnasium.spaces.Text):
        # string -> charset-index int32 ids padded to max_length (the host-side
        # twin of Text.to_jnp; round-2 advisor: np.asarray(str) raised at reset)
        return lambda v: np.asarray(native.to_jnp(v), np.int32)
    dtype = native.dtype
    return lambda v: np.asarray(v, dtype)


def make_action_converter(gym_space) -> Callable[[Any], Any]:
    """native action value -> host gym action value (the decode direction,
    parity: gymnasium_wrapper.py action decode)."""
    import gymnasium

    if isinstance(gym_space, gymnasium.spaces.Tuple):
        subs = [make_action_converter(s) for s in gym_space.spaces]
        return lambda v: tuple(f(x) for f, x in zip(subs, v))
    if isinstance(gym_space, gymnasium.spaces.Dict):
        keys = sorted(gym_space.spaces)
        subs = [make_action_converter(gym_space.spaces[k]) for k in keys]
        return lambda v: {k: f(x) for k, f, x in zip(keys, subs, v)}
    if isinstance(gym_space, gymnasium.spaces.Discrete):
        return lambda v: int(np.asarray(v))
    if isinstance(gym_space, (gymnasium.spaces.MultiDiscrete, gymnasium.spaces.MultiBinary)):
        return lambda v: np.asarray(v, gym_space.dtype).reshape(gym_space.shape)
    return lambda v: np.asarray(v, gym_space.dtype).reshape(gym_space.shape)


def _obs_shape_dtypes(space: Space):
    """ShapeDtypeStruct pytree for a native obs space value."""
    if isinstance(space, Multi):
        return tuple(_obs_shape_dtypes(s) for s in space.spaces)
    if isinstance(space, ArrayDiscrete):
        return jax.ShapeDtypeStruct((space.size,), jnp.int32)
    if isinstance(space, Discrete):
        return jax.ShapeDtypeStruct((), jnp.int32)
    return jax.ShapeDtypeStruct(space.shape, space.dtype)


def _batched(sds, B):
    return jax.tree.map(lambda s: jax.ShapeDtypeStruct((B,) + s.shape, s.dtype), sds)


@struct.dataclass
class HostEnvState:
    slot: jax.Array  # int32 instance slot managed host-side


class GymnasiumEnv(EnvCore):
    """Host env bridged into the functional protocol, backed by a POOL of instances
    (one per vectorized slot). Single-instance ``reset/step`` serve the host-driven
    paths (render/play/check_env); the play engine uses ``make_batched_autoreset``
    for vectorized lockstep."""

    is_host_env = True  # check_env: skip pure-function determinism checks
    is_host_batched = True  # play engine: use HostBatchedAutoReset, not vmap

    def __init__(
        self,
        env_id: Optional[str] = None,
        terminal_on_life_loss: bool = False,
        env_factory: Optional[Callable[[], Any]] = None,
        render_mode: Optional[str] = None,
        enable_sanitize: bool = True,
        enable_assertion: bool = False,
        **kwargs,
    ):
        import gymnasium

        assert env_id or env_factory, "need env_id or env_factory"
        self.env_id = env_id or "custom"
        if env_factory is None:
            env_factory = lambda: gymnasium.make(env_id, **kwargs)  # noqa: E731
        self._factory = env_factory
        self._render_mode = render_mode
        self._kwargs = kwargs
        self._terminal_on_life_loss = bool(terminal_on_life_loss)
        # runtime robustness modes (parity: EnvRun enable_sanitize/enable_assertion,
        # srl/base/env/env_run.py:373-440): sanitize coerces malformed step values
        # with a logged warning; assertion raises instead (the test-harness mode)
        self.enable_sanitize = bool(enable_sanitize)
        self.enable_assertion = bool(enable_assertion)
        self.remake_count = 0  # number of per-slot env rebuilds after exceptions

        self._lock = threading.Lock()
        self._pool: dict = {}  # slot -> (env, lives)
        self._slot_base = 0
        template = self._make_instance(render=False)
        self._template = template
        self._gym_aspace = template.action_space
        self._gym_ospace = template.observation_space
        self._aspace = convert_space(self._gym_aspace)
        self._ospace = convert_space(self._gym_ospace)
        self._obs_conv = make_obs_converter(self._gym_ospace, self._ospace)
        self._act_conv = make_action_converter(self._gym_aspace)
        spec = getattr(template, "spec", None)
        spec_steps = getattr(spec, "max_episode_steps", None) if spec else None
        self._max_steps = int(spec_steps or 99_999)
        self._interactive_slot = self.allocate_slots(1)
        self._obs_sds = _obs_shape_dtypes(self._ospace)

    def _default_obs(self):
        """Well-formed zero observation (parity: space.get_default on sanitize
        failure, env_run.py:388-394)."""
        return jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), self._obs_sds)

    # --- sanitize / remake (parity: env_run.py:313-322, 373-440) -------------
    def _sanitize_obs(self, obs):
        """Coerce a converted observation onto the declared shape/dtype; malformed
        leaves fall back to the space default with a logged error."""

        def fix(x, sds):
            try:
                a = np.asarray(x, sds.dtype)
                if a.shape != sds.shape:
                    if a.size == int(np.prod(sds.shape)):
                        a = a.reshape(sds.shape)
                    else:
                        raise ValueError(f"shape {a.shape} != {sds.shape}")
                if np.issubdtype(a.dtype, np.floating) and not np.all(np.isfinite(a)):
                    a = np.nan_to_num(a)
                return a
            except Exception as e:
                logger.error(
                    "%s: 'state' in 'env.step' may not be SpaceType (%s); "
                    "using the space default", self.env_id, e,
                )
                return np.zeros(sds.shape, sds.dtype)

        return jax.tree.map(fix, obs, self._obs_sds)

    def _coerce_step(self, obs, reward, terminated, truncated):
        """Convert + validate one step result under the active mode."""
        if self.enable_assertion:
            out = self._obs_conv(obs)
            for leaf, sds in zip(jax.tree.leaves(out), jax.tree.leaves(self._obs_sds)):
                got = np.asarray(leaf)
                assert got.shape == sds.shape, f"state shape {got.shape} != {sds.shape}"
            assert isinstance(reward, (int, float, np.integer, np.floating)), (
                f"reward type {type(reward)}"
            )
            assert isinstance(terminated, (bool, np.bool_)), f"terminated {type(terminated)}"
            assert isinstance(truncated, (bool, np.bool_)), f"truncated {type(truncated)}"
            return out, float(reward), bool(terminated), bool(truncated)
        if not self.enable_sanitize:
            return self._obs_conv(obs), float(reward), bool(terminated), bool(truncated)
        try:
            out = self._sanitize_obs(self._obs_conv(obs))
        except Exception as e:
            logger.error("%s: obs conversion failed (%s); using default", self.env_id, e)
            out = self._default_obs()
        try:
            reward = float(reward)
        except Exception as e:
            logger.error(
                "%s: 'reward' in 'env.step' may not be float (%s); using 0.0",
                self.env_id, e,
            )
            reward = 0.0
        try:
            terminated = bool(terminated)
        except Exception:
            terminated = False
        try:
            truncated = bool(truncated)
        except Exception:
            truncated = False
        return out, reward, terminated, truncated

    def _remake_slot(self, slot: int, seed: int):
        """Rebuild one pool slot after an exception and reset it (parity:
        EnvRun.remake, env_run.py:313-322). Returns (entry, fresh obs)."""
        ent = self._pool.pop(slot, None)
        if ent is not None:
            try:
                ent["env"].close()
            except Exception:
                pass
        self.remake_count += 1
        ent = self._get(slot)
        try:
            obs = self._do_reset(ent, seed)
        except Exception:
            logger.error(
                "%s: reset after remake also raised on slot %d; default obs",
                self.env_id, slot, exc_info=True,
            )
            obs = self._default_obs()
        return ent, obs

    # --- pool management ---------------------------------------------------
    def _make_instance(self, render: bool):
        if render:
            try:
                import gymnasium

                if self.env_id != "custom":
                    return gymnasium.make(
                        self.env_id, render_mode=self._render_mode or "rgb_array", **self._kwargs
                    )
            except Exception:
                pass
        return self._factory()

    def allocate_slots(self, n: int) -> int:
        """Reserve ``n`` consecutive slot ids; returns the first. Each engine (train /
        eval / interactive) gets its own range, so pools never collide."""
        with self._lock:
            base = self._slot_base
            self._slot_base += n
        return base

    def _get(self, slot: int):
        ent = self._pool.get(slot)
        if ent is None:
            # the interactive slot renders (frames for gif/play windows)
            env = self._make_instance(render=(slot == self._interactive_slot))
            ent = {"env": env, "lives": 0}
            self._pool[slot] = ent
        return ent

    def _ale_lives(self, env) -> int:
        ale = getattr(getattr(env, "unwrapped", env), "ale", None)
        return int(ale.lives()) if ale is not None else 0

    def _do_reset(self, ent, seed: int):
        obs, _ = ent["env"].reset(seed=int(seed) & 0x7FFFFFFF)
        if self._terminal_on_life_loss:
            ent["lives"] = self._ale_lives(ent["env"])
        if self.enable_sanitize and not self.enable_assertion:
            try:
                out = self._sanitize_obs(self._obs_conv(obs))
            except Exception as e:
                logger.error("%s: reset obs conversion failed (%s)", self.env_id, e)
                out = self._default_obs()
        else:
            out = self._obs_conv(obs)
        ent["last_obs"] = out
        return out

    def _do_step(self, ent, action):
        obs, reward, terminated, truncated, _ = ent["env"].step(self._act_conv(action))
        if self._terminal_on_life_loss:
            lives = self._ale_lives(ent["env"])
            if lives < ent["lives"]:
                terminated = True
            ent["lives"] = lives
        out = self._coerce_step(obs, reward, terminated, truncated)
        ent["last_obs"] = out[0]
        return out

    def _safe_step(self, slot: int, ent, action, seed: int):
        """Step one pool slot; an exception remakes the env and truncates the
        episode ("step exception") instead of killing the whole compiled program
        (parity: env_run.py:313-322). Under enable_assertion, raise instead."""
        if self.enable_assertion:
            return self._do_step(ent, action)
        try:
            return self._do_step(ent, action)
        except Exception:
            logger.warning(
                "%s: exception in env.step on slot %d — recreating the env, "
                "episode truncated (step exception)",
                self.env_id, slot, exc_info=True,
            )
            # report the slot's LAST GOOD observation as the truncated episode's
            # final state — truncation bootstraps (undone=1), so handing back the
            # rebuilt env's reset obs would regress Q toward a cross-episode
            # value (round-4 reviewer finding)
            last = ent.get("last_obs")
            self._remake_slot(slot, seed)
            return (last if last is not None else self._default_obs()), 0.0, False, True

    # --- static metadata ----------------------------------------------------
    @property
    def action_space(self):
        return self._aspace

    @property
    def observation_space(self):
        return self._ospace

    @property
    def max_episode_steps(self) -> int:
        return self._max_steps

    # --- single-instance protocol (host player / check_env; NOT vmappable) ---
    def _host_reset(self, seed):
        with self._lock:
            ent = self._get(self._interactive_slot)
            return self._do_reset(ent, int(seed))

    def _host_step(self, action):
        with self._lock:
            ent = self._get(self._interactive_slot)
            obs, r, te, tr = self._do_step(ent, action)
            return obs, np.float32(r), np.bool_(te), np.bool_(tr)

    def reset(self, key) -> Tuple[HostEnvState, TimeStep]:
        seed = jax.random.randint(key, (), 0, 2**31 - 1)
        obs = jax.experimental.io_callback(self._host_reset, self._obs_sds, seed, ordered=True)
        return HostEnvState(slot=jnp.asarray(self._interactive_slot, jnp.int32)), self.timestep(obs)

    def step(self, state, action, key) -> Tuple[HostEnvState, TimeStep]:
        obs, reward, terminated, truncated = jax.experimental.io_callback(
            self._host_step,
            (
                self._obs_sds,
                jax.ShapeDtypeStruct((), jnp.float32),
                jax.ShapeDtypeStruct((), jnp.bool_),
                jax.ShapeDtypeStruct((), jnp.bool_),
            ),
            action,
            ordered=True,
        )
        return state, self.timestep(obs, reward, terminated, truncated)

    # --- render passthrough (parity: gymnasium_wrapper render) ---------------
    def render_rgb(self, state) -> Optional[np.ndarray]:
        ent = self._pool.get(self._interactive_slot)
        if ent is None:
            return None
        try:
            frame = ent["env"].render()
        except Exception:
            return None
        if frame is None:
            return None
        return np.asarray(frame)

    # --- engine hook ---------------------------------------------------------
    def make_batched_autoreset(
        self,
        num_envs: int,
        max_episode_steps: Optional[int] = None,
        frameskip: int = 0,
        random_noop_max: int = 0,
    ) -> "HostBatchedAutoReset":
        return HostBatchedAutoReset(
            self, num_envs, max_episode_steps, frameskip, random_noop_max
        )


@struct.dataclass
class HostBatchState:
    """Batched carried state mirroring AutoResetState for host envs."""

    env_state: HostEnvState  # slot [B]
    step_num: jax.Array  # [B] int32
    episode_reward: jax.Array  # [B, P]
    last_episode_reward: jax.Array  # [B, P]
    last_episode_steps: jax.Array  # [B] int32


class HostBatchedAutoReset:
    """Batched auto-reset transform over a host env pool: ONE ordered io_callback per
    lockstep step (reset-on-done + frameskip + noop-reset handled host-side, next to
    the env instances). Drop-in for the engine's vmapped AutoResetEnv — same
    truncation/accounting semantics (env_run.py:361-368 strictly-greater rule)."""

    def __init__(self, env: GymnasiumEnv, num_envs: int, max_episode_steps=None,
                 frameskip: int = 0, random_noop_max: int = 0):
        self.env = env
        self.B = int(num_envs)
        self.max_episode_steps = int(max_episode_steps or env.max_episode_steps)
        self.frameskip = int(frameskip)
        self.random_noop_max = int(random_noop_max)
        self.slot0 = env.allocate_slots(self.B)
        self._rng = np.random.RandomState()
        self._obs_sds_b = _batched(env._obs_sds, self.B)

    # --- host side ------------------------------------------------------------
    def _host_reset_batch(self, seeds):
        env = self.env
        with env._lock:
            obs = []
            for i in range(self.B):
                ent = env._get(self.slot0 + i)
                obs.append(self._reset_with_noops(ent, int(seeds[i])))
            return jax.tree.map(lambda *xs: np.stack(xs), *obs)

    def _safe_reset(self, slot, ent, seed):
        """Reset one slot; an exception remakes the env (parity: remake covers
        reset-time failures of flaky host envs too). Assertion mode raises."""
        if self.env.enable_assertion:
            return self._reset_with_noops(ent, seed)
        try:
            return self._reset_with_noops(ent, seed)
        except Exception:
            logger.warning(
                "%s: exception in env.reset on slot %d — recreating the env",
                self.env.env_id, slot, exc_info=True,
            )
            _, obs = self.env._remake_slot(slot, seed)
            return obs

    def _reset_with_noops(self, ent, seed):
        obs = self.env._do_reset(ent, seed)
        if self.random_noop_max > 0:
            rng = np.random.RandomState(seed & 0x7FFFFFFF)
            for _ in range(rng.randint(0, self.random_noop_max + 1)):
                a = self.env._gym_aspace.sample()
                o, _, te, tr, _ = ent["env"].step(a)
                if te or tr:
                    obs = self.env._do_reset(ent, seed + 1)
                    break
                obs = self.env._obs_conv(o)
        return obs

    def _host_step_batch(self, prev_done, actions, seeds):
        env = self.env
        with env._lock:
            obs_l, rew_l, te_l, tr_l = [], [], [], []
            for i in range(self.B):
                slot = self.slot0 + i
                ent = env._get(slot)
                if bool(prev_done[i]):
                    obs = self._safe_reset(slot, ent, int(seeds[i]))
                    r, te, tr = 0.0, False, False
                else:
                    a = jax.tree.map(lambda x: np.asarray(x)[i], actions)
                    obs, r, te, tr = env._safe_step(slot, ent, a, int(seeds[i]))
                    for _ in range(self.frameskip):
                        if te or tr:
                            break
                        # a remake mid-frameskip truncates, exiting this loop
                        ent = env._get(slot)
                        obs, r2, te, tr = env._safe_step(slot, ent, a, int(seeds[i]))
                        r += r2
                obs_l.append(obs)
                rew_l.append(r)
                te_l.append(te)
                tr_l.append(tr)
            return (
                jax.tree.map(lambda *xs: np.stack(xs), *obs_l),
                np.asarray(rew_l, np.float32),
                np.asarray(te_l, np.bool_),
                np.asarray(tr_l, np.bool_),
            )

    # --- jit side (same signatures as vmapped AutoResetEnv.reset/step) ---------
    def reset_batch(self, keys) -> Tuple[HostBatchState, TimeStep]:
        B = self.B
        seeds = jax.vmap(lambda k: jax.random.randint(k, (), 0, 2**31 - 1))(keys)
        obs = jax.experimental.io_callback(
            self._host_reset_batch, self._obs_sds_b, seeds, ordered=True
        )
        A = self.env.num_actions
        ts = TimeStep(
            obs=obs,
            rewards=jnp.zeros((B, 1), jnp.float32),
            terminated=jnp.zeros((B,), jnp.bool_),
            truncated=jnp.zeros((B,), jnp.bool_),
            invalid_mask=jnp.zeros((B, A), jnp.bool_),
            next_player=jnp.zeros((B,), jnp.int32),
        )
        state = HostBatchState(
            env_state=HostEnvState(
                slot=jnp.arange(self.slot0, self.slot0 + B, dtype=jnp.int32)
            ),
            step_num=jnp.zeros((B,), jnp.int32),
            episode_reward=jnp.zeros((B, 1), jnp.float32),
            last_episode_reward=jnp.zeros((B, 1), jnp.float32),
            last_episode_steps=jnp.zeros((B,), jnp.int32),
        )
        return state, ts

    def step_batch(self, state: HostBatchState, prev_ts: TimeStep, action, keys):
        B = self.B
        seeds = jax.vmap(lambda k: jax.random.randint(k, (), 0, 2**31 - 1))(keys)
        was_reset = jnp.logical_or(prev_ts.terminated, prev_ts.truncated)
        obs, rewards, terminated, truncated = jax.experimental.io_callback(
            self._host_step_batch,
            (
                self._obs_sds_b,
                jax.ShapeDtypeStruct((B,), jnp.float32),
                jax.ShapeDtypeStruct((B,), jnp.bool_),
                jax.ShapeDtypeStruct((B,), jnp.bool_),
            ),
            was_reset,
            action,
            seeds,
            ordered=True,
        )
        step_num = jnp.where(was_reset, 0, state.step_num + 1)
        # strictly-greater truncation rule (env_run.py:361); reset rows are fresh
        truncated = jnp.logical_or(truncated, step_num > self.max_episode_steps)
        truncated = jnp.where(
            was_reset, False, jnp.logical_and(truncated, jnp.logical_not(terminated))
        )
        terminated = jnp.where(was_reset, False, terminated)
        rewards_vec = jnp.where(was_reset, 0.0, rewards)[:, None]
        ep_reward = jnp.where(was_reset[:, None], 0.0, state.episode_reward) + rewards_vec
        done = jnp.logical_or(terminated, truncated)
        A = self.env.num_actions
        ts = TimeStep(
            obs=obs,
            rewards=rewards_vec,
            terminated=terminated,
            truncated=truncated,
            invalid_mask=jnp.zeros((B, A), jnp.bool_),
            next_player=jnp.zeros((B,), jnp.int32),
        )
        new = HostBatchState(
            env_state=state.env_state,
            step_num=step_num,
            episode_reward=ep_reward,
            last_episode_reward=jnp.where(
                done[:, None], ep_reward, state.last_episode_reward
            ),
            last_episode_steps=jnp.where(done, step_num, state.last_episode_steps),
        )
        return new, ts


class GymLegacyEnv(GymnasiumEnv):
    """Legacy ``gym`` (pre-gymnasium) adapter (parity: srl/base/env/gym_wrapper.py):
    translates the 4-tuple step API and seed-on-construct reset. Import-gated — only
    usable when the legacy ``gym`` package is installed."""

    def __init__(self, env_id: str, **kwargs):
        assert _HAS_GYM, "legacy gym is not installed"
        import gym

        def factory():
            return _LegacyShim(gym.make(env_id, **kwargs))

        super().__init__(env_id=env_id, env_factory=factory)


class _LegacyShim:
    """Wrap a legacy gym env in the gymnasium 5-tuple protocol."""

    def __init__(self, env):
        self._env = env
        self.action_space = env.action_space
        self.observation_space = env.observation_space
        self.spec = getattr(env, "spec", None)
        self.unwrapped = getattr(env, "unwrapped", env)

    def reset(self, seed=None):
        try:
            out = self._env.reset(seed=seed)
        except TypeError:
            if seed is not None and hasattr(self._env, "seed"):
                self._env.seed(seed)
            out = self._env.reset()
        if isinstance(out, tuple) and len(out) == 2:
            return out
        return out, {}

    def step(self, action):
        out = self._env.step(action)
        if len(out) == 5:
            return out
        obs, reward, done, info = out
        truncated = bool(info.get("TimeLimit.truncated", False))
        return obs, reward, done and not truncated, truncated, info

    def render(self):
        return self._env.render()


def make(env_id: str, **kwargs) -> GymnasiumEnv:
    return GymnasiumEnv(env_id, **kwargs)
