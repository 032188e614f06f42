"""User-facing Runner (parity: srl.Runner, srl/runner/runner.py:25 + runner_base.py:28).

Same surface: construct with (env id | EnvCore, algo config), then ``train`` /
``evaluate`` / ``rollout`` / ``render_terminal`` / ``save_parameter`` /
``load_parameter`` / ``evaluate_compare_to_baseline_*``. The body is different by
design: instead of wiring worker/trainer objects into a python loop, the Runner builds
jitted engine chunks and drives them from a thin host loop whose only per-iteration
work is reading back a handful of scalars and firing callbacks.
"""

from __future__ import annotations

import time
from typing import Any, Dict, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..algorithms.base import AlgoConfig
from ..envs.core import EnvCore
from ..envs.registration import make as make_env
from .callbacks import PrintProgress, RunCallback, load_compressed, save_compressed
from .engine import PlayEngine


class Runner:
    def __init__(
        self,
        env: Union[str, EnvCore],
        algo: AlgoConfig,
        num_envs: int = 128,
        players: Optional[Sequence] = None,
        seed: Optional[int] = None,
    ):
        self.env_id = env if isinstance(env, str) else type(env).__name__
        self.env = make_env(env) if isinstance(env, str) else env
        self.algo = algo
        self.num_envs = int(num_envs)
        self.players = players
        self.seed = seed if seed is not None else int(time.time()) % (2**31)

        self.algo.setup(self.env)
        self.engine = PlayEngine(self.env, self.algo, self.num_envs, players)
        self._carry = None
        self._chunk_fn = None
        self._chunk_steps = None
        self._eval_fns: Dict[tuple, Any] = {}

    # --- state ------------------------------------------------------------
    @property
    def carry(self):
        if self._carry is None:
            self._carry = self.engine.init(jax.random.PRNGKey(self.seed))
        return self._carry

    @property
    def algo_state(self):
        return self.carry.algo_state

    # --- training ---------------------------------------------------------
    def train(
        self,
        max_steps: Optional[int] = None,
        max_train_count: Optional[int] = None,
        timeout: Optional[float] = None,
        chunk_steps: int = 32,
        train_steps_per_chunk: Optional[int] = None,
        callbacks: Optional[List[RunCallback]] = None,
        progress: bool = True,
    ) -> Dict[str, Any]:
        """Train until any stop condition hits (parity: Runner.train stop conditions,
        srl/base/context.py max_steps/max_train_count/timeout). ``max_steps`` counts
        TOTAL env steps across the vectorized batch."""
        assert max_steps or max_train_count or timeout, "need a stop condition"
        if self._chunk_fn is None or self._chunk_steps != chunk_steps:
            self._chunk_fn = self.engine.build_chunk(chunk_steps, train_steps_per_chunk, training=True)
            self._chunk_steps = chunk_steps

        callbacks = list(callbacks or [])
        if progress:
            callbacks.append(PrintProgress())
        for c in callbacks:
            c.on_start(self)

        t0 = time.time()
        carry = self.carry
        stats: Dict[str, Any] = {}
        ep0 = int(carry.episode_count)
        while True:
            carry, metrics = self._chunk_fn(carry)
            stats = {
                "env_steps": int(carry.env_steps),
                "episode_count": int(carry.episode_count),
                "elapsed": time.time() - t0,
            }
            ep = int(carry.episode_count)
            if ep > ep0:
                # per-player mean over finished episodes (cumulative)
                stats["mean_episode_reward"] = float(carry.episode_reward_sum[0]) / ep
            for k, v in metrics.items():
                stats[k] = float(np.asarray(v))
            stop = False
            for c in callbacks:
                if c.on_chunk_end(self, stats) is False:
                    stop = True
            if timeout and stats["elapsed"] >= timeout:
                stop = True
            if max_steps and stats["env_steps"] >= max_steps:
                stop = True
            if max_train_count and stats.get("train_count", 0) >= max_train_count:
                stop = True
            if stop:
                break
        self._carry = carry
        for c in callbacks:
            c.on_end(self)
        return stats

    def rollout(self, max_steps: int, chunk_steps: int = 32) -> Dict[str, Any]:
        """Collect experience without training (parity: Runner.rollout,
        runner/runner.py:185)."""
        fn = self.engine.build_chunk(chunk_steps, 0, training=True)
        carry = self.carry
        while int(carry.env_steps) < max_steps:
            carry, _ = fn(carry)
        self._carry = carry
        return {"env_steps": int(carry.env_steps)}

    # --- evaluation -------------------------------------------------------
    def evaluate(
        self,
        max_episodes: int = 100,
        players: Optional[Sequence] = None,
    ) -> np.ndarray:
        """Mean episode reward per player over ``max_episodes`` parallel episodes
        (parity: Runner.evaluate, runner/runner.py:724)."""
        key = (max_episodes, tuple(players) if players else None)
        if key not in self._eval_fns:
            engine = PlayEngine(self.env, self.algo, max_episodes, players or self.players)
            self._eval_fns[key] = engine.build_eval(max_episodes)
        rewards, complete = self._eval_fns[key](self.algo_state, jax.random.PRNGKey(self.seed + 1))
        return np.asarray(rewards)

    def evaluate_compare_to_baseline_single_player(
        self, baseline: Optional[float] = None, episodes: Optional[int] = None
    ) -> bool:
        """(parity: runner/runner.py:1357)"""
        info = self.env.reward_baseline or {}
        baseline = baseline if baseline is not None else info.get("baseline", 0.0)
        episodes = episodes or info.get("episode", 100)
        rewards = self.evaluate(episodes)
        print(f"eval: {rewards[0]:.4f} (baseline {baseline})")
        return bool(rewards[0] >= baseline)

    def evaluate_compare_to_baseline_multiplayer(self) -> List[bool]:
        """(parity: runner/runner.py:1394)"""
        results = []
        for entry in self.env.reward_baseline or []:
            players = entry["players"]
            episodes = entry["episode"]
            baseline = entry["baseline"]
            rewards = self.evaluate(episodes, players=players)
            ok = all(
                rewards[i] >= b for i, b in enumerate(baseline) if b is not None
            )
            print(f"eval {players}: {rewards} vs baseline {baseline} -> {ok}")
            results.append(ok)
        return results

    # --- render -----------------------------------------------------------
    def render_terminal(self, max_steps: int = 100) -> float:
        """Play one host-driven episode, printing env frames (parity:
        Runner.render_terminal via the render cache, runner/runner.py:801)."""
        key = jax.random.PRNGKey(self.seed + 2)
        k_reset, key = jax.random.split(key)
        state, ts = self.env.reset(k_reset)
        total = 0.0
        self.env.render_terminal(state)
        for _ in range(max_steps):
            from ..algorithms.base import PolicyContext

            key, k_pol = jax.random.split(key)
            enc = self.algo.obs_encoder.encode(ts.obs)
            ctx = PolicyContext(
                step=jnp.asarray(0),
                training=jnp.asarray(False),
                env_ids=jnp.zeros((1,), jnp.int32),
            )
            batched = jax.tree.map(lambda x: x[None], enc)
            a_rl = self.algo.policy(self.algo_state, batched, ts.invalid_mask[None], ctx, k_pol)
            a_env = self.algo.action_encoder.decode(jax.tree.map(lambda x: x[0], a_rl))
            key, k_step = jax.random.split(key)
            state, ts = self.env.step(state, a_env, k_step)
            total += float(ts.rewards[0])
            print(f"action: {self.env.action_to_str(np.asarray(a_env))} reward: {float(ts.rewards[0]):.3f}")
            self.env.render_terminal(state)
            if bool(ts.terminated) or bool(ts.truncated):
                break
        return total

    # --- persistence ------------------------------------------------------
    def save_parameter(self, path: str) -> None:
        params = jax.device_get(self.algo.params_of(self.algo_state))
        save_compressed(params, path)

    def load_parameter(self, path: str) -> None:
        params = load_compressed(path)
        self._carry = self.carry.replace(
            algo_state=self.algo.restore_params(self.algo_state, params)
        )
