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
        env: Union[str, EnvCore, "EnvConfig"],
        algo: AlgoConfig,
        num_envs: int = 128,
        players: Optional[Sequence] = None,
        seed: Optional[int] = None,
        frameskip: int = 0,
        random_noop_max: int = 0,
        max_episode_steps: Optional[int] = None,
        compilation_cache_dir: Optional[str] = None,
    ):
        from ..envs import EnvConfig
        from ..utils import compilation_cache

        # persistent XLA cache: explicit dir wins; otherwise the
        # SRL_TPU_COMPILATION_CACHE env var opts in (utils/compilation_cache.py)
        if compilation_cache_dir:
            compilation_cache.enable_compilation_cache(compilation_cache_dir)
        else:
            compilation_cache.maybe_enable_from_env()

        if isinstance(env, EnvConfig):
            # episode options from the config unless overridden here
            self.env_id = env.id
            self._env_config = env
            frameskip = frameskip or env.frameskip
            random_noop_max = random_noop_max or env.random_noop_max
            max_episode_steps = max_episode_steps or env.max_episode_steps
            env = env.make()
        else:
            self.env_id = env if isinstance(env, str) else type(env).__name__
            self._env_config = EnvConfig(self.env_id) if isinstance(env, str) else None
        self.env = make_env(env) if isinstance(env, str) else env
        self.algo = algo
        self.num_envs = int(num_envs)
        self.players = players
        self.seed = seed if seed is not None else int(time.time()) % (2**31)

        self.algo.setup(self.env)
        self.engine = PlayEngine(
            self.env, self.algo, self.num_envs, players,
            frameskip=frameskip, random_noop_max=random_noop_max,
            max_episode_steps=max_episode_steps,
        )
        self._carry = None
        self._chunk_fn = None
        self._chunk_steps = None
        self._eval_fns: Dict[tuple, Any] = {}
        self._eval_calls = 0
        self._train_only_calls = 0
        self._host_replay = None
        self._host_fns = None
        self.last_eval_info: Optional[Dict[str, int]] = None
        self._history_cb = None

    # --- history (parity: Runner.set_history_on_memory/get_history) --------
    def set_history_on_memory(self):
        """Record per-chunk stats in memory for every subsequent train call
        (parity: runner.set_history_on_memory, callbacks/history_on_memory.py)."""
        from .callbacks import HistoryOnMemory

        self._history_cb = HistoryOnMemory()
        return self._history_cb

    def get_history(self):
        """HistoryViewer over the in-memory records (parity: runner.get_history)."""
        from .history_viewer import HistoryViewer

        assert self._history_cb is not None, "call set_history_on_memory() first"
        return HistoryViewer(records=self._history_cb.records)

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
        chunks_per_call: int = 1,
        callbacks: Optional[List[RunCallback]] = None,
        progress: bool = True,
        profile_dir: Optional[str] = None,
        pipeline_overlap: bool = True,
    ) -> Dict[str, Any]:
        """Train until any stop condition hits (parity: Runner.train stop conditions,
        srl/base/context.py max_steps/max_train_count/timeout). ``max_steps`` counts
        TOTAL env steps across the vectorized batch. ``chunks_per_call`` > 1 scans
        several chunks inside one jit call, amortizing the host-call boundary
        (callbacks/stop checks then fire once per call, i.e. every
        ``chunk_steps * chunks_per_call`` lockstep rows). ``profile_dir`` captures a
        jax.profiler trace of the run (the tracing hook the reference lacks —
        SURVEY.md §5)."""
        assert max_steps or max_train_count or timeout, "need a stop condition"
        if getattr(self.algo, "uses_host_replay", False):
            assert chunks_per_call == 1, (
                "host-replay training ingests on the host between chunks; "
                "chunks_per_call amortization does not apply"
            )
            return self._train_host_replay(
                max_steps=max_steps, max_train_count=max_train_count,
                timeout=timeout, chunk_steps=chunk_steps,
                train_steps_per_chunk=train_steps_per_chunk,
                callbacks=callbacks, progress=progress, profile_dir=profile_dir,
                pipeline_overlap=pipeline_overlap,
            )
        # sequence algorithms (R2D2 family) pin the chunk length to their window size
        required = getattr(self.algo, "required_chunk_steps", None)
        if required is not None:
            chunk_steps = required
        cache_key = (chunk_steps, train_steps_per_chunk, chunks_per_call)
        if self._chunk_fn is None or self._chunk_steps != cache_key:
            self._chunk_fn = self.engine.build_chunk(
                chunk_steps, train_steps_per_chunk, training=True,
                chunks_per_call=chunks_per_call,
            )
            self._chunk_steps = cache_key

        callbacks = list(callbacks or [])
        if self._history_cb is not None:
            callbacks.append(self._history_cb)
        if progress:
            callbacks.append(PrintProgress())
        for c in callbacks:
            c.on_start(self)

        t0 = time.time()
        carry = self.carry
        stats: Dict[str, Any] = {}
        ep0 = int(carry.episode_count)
        # max_train_count counts THIS call's updates (parity: the reference's
        # RunState.train_count restarts per play call, base/context.py:346) — a
        # staged recipe calling train() after train_only() must not stop instantly
        tc0 = int(getattr(carry.algo_state, "train_count", 0))
        if profile_dir:
            jax.profiler.start_trace(profile_dir)
        while True:
            carry, metrics = self._chunk_fn(carry)
            # publish the live carry BEFORE callbacks fire so interval checkpoints
            # (Checkpoint/OrbaxCheckpoint) persist the current state, not the
            # pre-training one (round-1 advisor finding: mid-loop saves equaled init)
            self._carry = carry
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
            if max_train_count and stats.get("train_count", 0) - tc0 >= max_train_count:
                stop = True
            if stop:
                break
        if profile_dir:
            jax.block_until_ready(carry.env_steps)
            jax.profiler.stop_trace()
        self._carry = carry
        for c in callbacks:
            c.on_end(self)
        return stats

    def _train_host_replay(
        self,
        max_steps: Optional[int] = None,
        max_train_count: Optional[int] = None,
        timeout: Optional[float] = None,
        chunk_steps: int = 32,
        train_steps_per_chunk: Optional[int] = None,
        callbacks: Optional[List[RunCallback]] = None,
        progress: bool = True,
        profile_dir: Optional[str] = None,
        pipeline_overlap: bool = True,
    ) -> Dict[str, Any]:
        """Atari-scale train loop: jitted collect chunk -> host frame-dedup ring
        ingest -> staged-batch jitted updates (memories/host_replay.py; parity:
        the reference's 1M host ReplayBuffer driven by core_play,
        srl/algorithms/dqn/dqn.py:89-102). The only host<->device traffic per
        chunk is the collected uint8 transition pytree down and one [K, batch]
        uint8 staging pytree up — no io_callback inside either graph.

        ``pipeline_overlap=True`` double-buffers the chunks (parity: the whole
        point of the reference's memory-server process, play_mp_memory.py:253-350
        — memory service overlapping acting/training): chunk N+1's collect is
        DISPATCHED before any host work on chunk N, chunk N's d2h streams via
        copy_to_host_async while the device rolls out, and ingest + sample + h2d
        happen while the device queue drains. Wall per chunk drops from
        sum(collect, d2h, ingest, sample, train) to ~max(device work, host work).
        Cost: the rollout policy is one extra chunk (K updates) staler, the same
        regime knob the chunked engine already trades on — set False for the
        strictly-serial order."""
        assert self.engine.P == 1, "host replay supports single-player envs"
        K = train_steps_per_chunk
        if K is None:
            K = max(1, chunk_steps // self.algo.train_interval)
        replay = self._ensure_host_replay()
        # cache the compiled pair like the regular train path does — repeated
        # train() calls (checkpoint curves, staged recipes) must not retrace
        if self._host_fns is None or self._host_fns[0] != (chunk_steps, K):
            self._host_fns = (
                (chunk_steps, K),
                self.engine.build_collect_chunk(chunk_steps, compact_frames=True),
                jax.jit(self.algo.train_on_staged),
            )
        _, collect_fn, train_fn = self._host_fns
        warmup = self.algo.memory.warmup_size
        batch_size = self.algo.batch_size

        callbacks = list(callbacks or [])
        if self._history_cb is not None:
            callbacks.append(self._history_cb)
        if progress:
            callbacks.append(PrintProgress())
        for c in callbacks:
            c.on_start(self)

        t0 = time.time()
        carry = self.carry
        tc0 = int(getattr(carry.algo_state, "train_count", 0))
        stats: Dict[str, Any] = {}
        ep0 = int(carry.episode_count)
        if profile_dir:
            jax.profiler.start_trace(profile_dir)

        def _start_d2h(tree):
            # kick the device->host DMA off immediately; device_get later only
            # waits for completion instead of starting the transfer then
            jax.tree.map(lambda x: x.copy_to_host_async(), tree)

        pending = None
        if pipeline_overlap:
            carry, pending = collect_fn(carry)  # prime chunk 0
            _start_d2h(pending)
        while True:
            if pipeline_overlap:
                # dispatch chunk N+1 BEFORE touching chunk N on the host: the
                # device rolls out while we ingest/sample/stage below
                carry, nxt = collect_fn(carry)
                _start_d2h(nxt)
                replay.ingest(*jax.device_get(pending))
                pending = nxt
            else:
                carry, (compact, masks) = collect_fn(carry)
                replay.ingest(*jax.device_get((compact, masks)))
            metrics = {}
            if replay.size >= max(warmup, batch_size) and replay.ready:
                staged = jax.device_put(replay.sample_batches(K, batch_size))
                algo_state, metrics = train_fn(carry.algo_state, staged)
                carry = carry.replace(algo_state=algo_state)
            self._carry = carry
            stats = {
                "env_steps": int(carry.env_steps),
                "episode_count": int(carry.episode_count),
                "memory_size": replay.size,
                "elapsed": time.time() - t0,
            }
            ep = int(carry.episode_count)
            if ep > ep0:
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
            if max_train_count and stats.get("train_count", 0) - tc0 >= max_train_count:
                stop = True
            if stop:
                break
        if pending is not None:
            # the in-flight chunk was collected but not yet ingested — keep it
            replay.ingest(*jax.device_get(pending))
        if profile_dir:
            jax.block_until_ready(carry.env_steps)
            jax.profiler.stop_trace()
        self._carry = carry
        for c in callbacks:
            c.on_end(self)
        return stats

    def _ensure_host_replay(self):
        if self._host_replay is None:
            self._host_replay = self.algo.make_host_replay(
                self.num_envs, seed=self.seed ^ 0x51F1
            )
        return self._host_replay

    def train_mp(
        self,
        max_steps: Optional[int] = None,
        timeout: Optional[float] = None,
        chunk_steps: int = 32,
        train_steps_per_chunk: Optional[int] = None,
        num_devices: Optional[int] = None,
        callbacks: Optional[List[RunCallback]] = None,
        progress: bool = True,
    ) -> Dict[str, Any]:
        """Data-parallel training over the device mesh — the TPU-native successor of
        the reference's multiprocess actor-learner (Runner.train_mp,
        srl/runner/runner.py:310 + base/run/play_mp.py): env shards and replay shards
        per device, gradients pmean'd over ICI, replicas never diverge. Collapses back
        to ``train`` when only one device is visible."""
        from ..parallel import DataParallelEngine, make_mesh

        assert max_steps or timeout, "need a stop condition"
        mesh = make_mesh(num_devices)
        if mesh.devices.size <= 1:
            return self.train(
                max_steps=max_steps, timeout=timeout, chunk_steps=chunk_steps,
                train_steps_per_chunk=train_steps_per_chunk, progress=progress,
            )
        per_shard = max(1, self.num_envs // mesh.devices.size)
        dp = DataParallelEngine(self.env, self.algo, per_shard, mesh=mesh, players=self.players)
        required = getattr(self.algo, "required_chunk_steps", None)
        if required is not None:
            chunk_steps = required
        callbacks = list(callbacks or [])
        if self._history_cb is not None:
            callbacks.append(self._history_cb)
        from ..parallel.multihost import read_local_shard

        def sync_carry(carry):
            # adopt one replica's learner state into the single-device carry —
            # replicas are pmean-identical, so the local shard IS the state. Used
            # both mid-run (before callbacks, so Checkpoint/Orbax persist the live
            # state) and at the end.
            params = jax.tree.map(
                jnp.asarray, read_local_shard(self.algo.params_of(carry.algo_state))
            )
            self._carry = self.carry.replace(
                algo_state=self.algo.restore_params(self.algo_state, params)
            )

        for c in callbacks:
            c.on_start(self)
        try:
            fn = dp.build_chunk(chunk_steps, train_steps_per_chunk, training=True)
            # continue from previously trained/loaded parameters (parity: the
            # reference's train_mp shipping the runner's current parameter,
            # srl/runner/runner.py:361-367); fresh runs init inside the mesh
            init_params = (
                jax.device_get(self.algo.params_of(self.algo_state))
                if self._carry is not None
                else None
            )
            carry = dp.init(jax.random.PRNGKey(self.seed), init_params)
            t0 = time.time()
            if progress:
                print(f"### train_mp: {mesh.devices.size} devices x {per_shard} envs")
            while True:
                carry, metrics = fn(carry)
                steps = dp.total_env_steps(carry)
                stop = False
                if callbacks:
                    sync_carry(carry)
                    stats = {"env_steps": steps, "elapsed": time.time() - t0}
                    from ..parallel.data_parallel import _host_read

                    for k, v in metrics.items():
                        stats[k] = float(np.asarray(_host_read(v)).mean())
                    for c in callbacks:
                        if c.on_chunk_end(self, stats) is False:
                            stop = True
                if max_steps and steps >= max_steps:
                    stop = True
                if timeout and time.time() - t0 >= timeout:
                    stop = True
                if stop:
                    break
            sync_carry(carry)
            for c in callbacks:
                c.on_end(self)
        finally:
            # the dp engine pins algo.pmean_axis for its traces; clear it so later
            # single-device train/rollout/eval traces don't reference an unbound axis
            self.algo.pmean_axis = None
        elapsed = time.time() - t0
        if progress:
            print(f"### train_mp done: {steps:,} steps in {elapsed:.1f}s ({steps/elapsed:,.0f} st/s)")
        return {"env_steps": steps, "elapsed": elapsed}

    def train_distribution(
        self,
        connector_params,
        actor_num: int = 1,
        max_train_count: Optional[int] = None,
        timeout: Optional[float] = None,
        chunk_steps: int = 32,
        train_steps_per_chunk: int = 1,
        trainer_train_steps: int = 16,
        progress: bool = True,
        wait_callbacks: Optional[list] = None,
        **task_overrides,
    ) -> str:
        """Blocking cross-machine training (parity: Runner.train_distribution,
        srl/runner/runner.py:547-723): publish a task (env + algo config + current
        params) on the coordination backend, wait for remote server_actor /
        server_trainer daemons to run it, then pull the trained parameters back into
        this Runner. Returns the end reason."""
        tm = self.train_distribution_start(
            connector_params, actor_num=actor_num, max_train_count=max_train_count,
            timeout=timeout, chunk_steps=chunk_steps,
            train_steps_per_chunk=train_steps_per_chunk,
            trainer_train_steps=trainer_train_steps, **task_overrides,
        )
        reason = tm.train_wait(timeout=timeout, progress=progress, callbacks=wait_callbacks)
        self.load_distributed_parameter(tm)
        return reason

    def train_distribution_start(
        self,
        connector_params,
        actor_num: int = 1,
        **task_overrides,
    ):
        """Non-blocking variant (parity: Runner.train_distribution_start): create the
        task and return the TaskManager; call ``tm.train_wait()`` +
        ``runner.load_distributed_parameter(tm)`` yourself."""
        from .distribution import TaskConfig, TaskManager, dumps

        assert task_overrides.get("max_train_count") or task_overrides.get("timeout"), \
            "need a stop condition (max_train_count or timeout)"
        tc = TaskConfig.from_runner(self, **task_overrides)
        tm = TaskManager(connector_params.create_connector())
        params = jax.device_get(self.algo.params_of(self.algo_state))
        tm.create_task(tc, dumps(params), actor_num=actor_num)
        return tm

    def load_distributed_parameter(self, tm) -> None:
        """Pull the latest parameters from the task's param board into this Runner."""
        from .distribution import loads

        payload, _ = tm.read_parameter()
        if payload is not None:
            params = jax.tree.map(jnp.asarray, loads(payload))
            self._carry = self.carry.replace(
                algo_state=self.algo.restore_params(self.algo_state, params)
            )

    def model_summary(self) -> str:
        """Tabulated model summary (parity: Runner.model_summary,
        runner/runner.py:1323, via flax tabulate when the algorithm has a model)."""
        model = getattr(self.algo, "model", None)
        if model is None:
            s = f"{self.algo.get_name()}: tabular/parametric state "
            s += str(jax.tree.map(jnp.shape, self.algo.params_of(self.algo_state)))
            print(s)
            return s
        import flax.linen as nn

        obs0 = jax.tree.map(lambda x: x[None], self.algo.obs_space.zero())
        try:
            s = nn.tabulate(model, jax.random.PRNGKey(0))(obs0)
        except TypeError:
            s = f"{model}"
        print(s)
        return s

    def save_memory(self, path: str) -> None:
        """(parity: Runner.save_memory / RLMemory backup, srl/base/rl/memory.py:119-150)"""
        if getattr(self.algo, "uses_host_replay", False):
            save_compressed(self._ensure_host_replay().state_dict(), path)
            return
        mem = getattr(self.algo_state, "memory", None)
        assert mem is not None, f"{self.algo.get_name()} has no memory"
        save_compressed(jax.device_get(mem), path)

    def load_memory(self, path: str) -> None:
        if getattr(self.algo, "uses_host_replay", False):
            self._ensure_host_replay().load_state_dict(load_compressed(path))
            return
        mem = load_compressed(path)
        mem = jax.tree.map(jnp.asarray, mem)
        self._carry = self.carry.replace(algo_state=self.algo_state.replace(memory=mem))

    def memory_size(self) -> int:
        """Live replay size (parity: RLMemory.length, srl/base/rl/memory.py)."""
        if getattr(self.algo, "uses_host_replay", False):
            return self._ensure_host_replay().size
        mem = getattr(self.algo_state, "memory", None)
        assert mem is not None, f"{self.algo.get_name()} has no memory"
        size = getattr(mem, "size", None)
        assert size is not None, "memory state exposes no .size"
        return int(size)

    def rollout(
        self,
        max_steps: Optional[int] = None,
        max_memory: Optional[int] = None,
        chunk_steps: int = 32,
    ) -> Dict[str, Any]:
        """Collect experience without training (parity: Runner.rollout,
        srl/runner/runner.py:185 — supports both ``max_steps`` and the reference's
        ``max_memory`` stop condition). On a host-replay config (storage
        "host_frames") the collected chunks are ingested into the host ring."""
        assert max_steps or max_memory, "need a stop condition"
        required = getattr(self.algo, "required_chunk_steps", None)
        if required is not None:
            chunk_steps = required
        host = getattr(self.algo, "uses_host_replay", False)
        if host:
            replay = self._ensure_host_replay()
            fn = self.engine.build_collect_chunk(chunk_steps, compact_frames=True)
        else:
            fn = self.engine.build_chunk(chunk_steps, 0, training=True)
        carry = self.carry
        stalled = 0
        prev_size = -1
        while True:
            if max_steps and int(carry.env_steps) >= max_steps:
                break
            if max_memory:
                self._carry = carry
                size = self.memory_size()
                if size >= max_memory:
                    break
                # a ring buffer at capacity stops growing — fail loudly instead of
                # spinning forever when max_memory exceeds the memory's capacity
                stalled = stalled + 1 if size == prev_size else 0
                prev_size = size
                if stalled > 200:
                    raise RuntimeError(
                        f"rollout: memory size stuck at {size} < max_memory="
                        f"{max_memory} (capacity too small?)"
                    )
            if host:
                carry, (compact, masks) = fn(carry)
                replay.ingest(*jax.device_get((compact, masks)))
            else:
                carry, _ = fn(carry)
        self._carry = carry
        out = {"env_steps": int(carry.env_steps)}
        if max_memory:
            out["memory_size"] = self.memory_size()
        return out

    def train_only(
        self,
        max_train_count: Optional[int] = None,
        timeout: Optional[float] = None,
        train_steps_per_call: int = 32,
        callbacks: Optional[List[RunCallback]] = None,
        progress: bool = True,
    ) -> Dict[str, Any]:
        """Train from the existing replay memory without collecting new experience
        (parity: Runner.train_only, srl/runner/runner.py:254 +
        base/run/core_train_only.py:12). The jitted step is rebuilt per call so
        config-flag mutations between stages (e.g. DIAMOND's
        train_diffusion/train_reward_end/train_actor_critic staged recipe,
        /root/reference/tests/algorithms_/base_diamond.py:53-77) take effect."""
        assert max_train_count or timeout, "need a stop condition"
        from functools import partial

        train_fn = jax.jit(partial(self.algo.train, num_steps=train_steps_per_call))
        callbacks = list(callbacks or [])
        if self._history_cb is not None:
            callbacks.append(self._history_cb)
        if progress:
            callbacks.append(PrintProgress())
        for c in callbacks:
            c.on_start(self)
        t0 = time.time()
        carry = self.carry
        # distinct key stream per call (round-3 advisor: a fixed fold_in constant
        # replayed identical batch-sampling keys across consecutive train_only calls)
        key = jax.random.fold_in(carry.key, 0x7FA1 + self._train_only_calls)
        self._train_only_calls += 1
        tc0 = int(carry.algo_state.train_count)
        stats: Dict[str, Any] = {}
        stalled = 0
        prev_trains = 0
        while True:
            key, k = jax.random.split(key)
            algo_state, metrics = train_fn(carry.algo_state, k)
            carry = carry.replace(algo_state=algo_state)
            self._carry = carry
            stats = {"elapsed": time.time() - t0, "env_steps": int(carry.env_steps)}
            for k2, v in metrics.items():
                stats[k2] = float(np.asarray(v))
            stop = False
            for c in callbacks:
                if c.on_chunk_end(self, stats) is False:
                    stop = True
            done_trains = int(carry.algo_state.train_count) - tc0
            if max_train_count and done_trains >= max_train_count:
                stop = True
            if timeout and stats["elapsed"] >= timeout:
                stop = True
            # in-graph warmup gate: below warmup_size, train_count never advances —
            # without a timeout that would spin forever (round-3 advisor; mirrors
            # rollout(max_memory=)'s stalled check)
            stalled = stalled + 1 if done_trains == prev_trains else 0
            prev_trains = done_trains
            if not timeout and stalled > 200:
                raise RuntimeError(
                    f"train_only: train_count stuck at {done_trains} — memory "
                    f"size below warmup_size? (memory_size={self.memory_size()})"
                )
            if stop:
                break
        for c in callbacks:
            c.on_end(self)
        return stats

    # --- evaluation -------------------------------------------------------
    def evaluate(
        self,
        max_episodes: int = 100,
        players: Optional[Sequence] = None,
        on_incomplete: str = "raise",
    ) -> np.ndarray:
        """Mean episode reward per player over ``max_episodes`` parallel episodes
        (parity: Runner.evaluate, runner/runner.py:724).

        Each call advances the eval PRNG (fold_in on a per-runner counter) so
        repeated evaluations — e.g. the ``Evaluate`` callback — sample fresh
        episodes instead of replaying the identical set. Episodes that fail to
        finish within the eval scan are excluded: by default we ``raise``; with
        ``on_incomplete="ignore"`` the mean is over the RECORDED episodes only
        (never zeros-diluted — the reference averages finished episodes only),
        and ``self.last_eval_info`` reports ``{"recorded": n, "episodes": B}``."""
        cache_key = (
            max_episodes,
            tuple(p if (p is None or isinstance(p, str)) else id(p) for p in players)
            if players
            else None,
        )
        # the cached entry keeps a strong reference to the player specs so their
        # id()s can't be recycled onto new objects (round-1 advisor finding)
        if cache_key not in self._eval_fns:
            engine = PlayEngine(self.env, self.algo, max_episodes, players or self.players)
            self._eval_fns[cache_key] = (engine.build_eval(max_episodes), players)
        fn, _specs = self._eval_fns[cache_key]
        key = jax.random.fold_in(jax.random.PRNGKey(self.seed + 1), self._eval_calls)
        self._eval_calls += 1
        rewards, recorded, _steps = fn(self.algo_state, key)
        rewards = np.asarray(rewards)  # [B, P] first-episode reward per eval env
        recorded = np.asarray(recorded)  # [B] which envs finished an episode
        n = int(recorded.sum())
        self.last_eval_info = {"recorded": n, "episodes": int(recorded.shape[0])}
        if n < recorded.shape[0]:
            if on_incomplete == "raise":
                raise RuntimeError(
                    f"evaluate: {recorded.shape[0] - n} episodes did not finish "
                    "within the eval scan (env never terminates/truncates inside "
                    'max_episode_steps?); pass on_incomplete="ignore" to average '
                    "the recorded episodes only"
                )
            if n == 0:
                raise RuntimeError("evaluate: no episode finished — nothing to average")
            return rewards[recorded].mean(axis=0)
        return rewards.mean(axis=0)

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
    def _play_episode_host(self, max_steps: int, on_frame=None) -> float:
        """Host-driven single episode with the trained policy (greedy); calls
        ``on_frame(env, state, info_line, rl_text)`` after reset and each step.
        ``rl_text`` is the algorithm's per-action diagnostic view of the state the
        upcoming action is chosen from (parity: the reference's composite of env
        render + worker render, srl/base/rl/worker_run.py:413-543)."""
        from ..algorithms.base import PolicyContext

        key = jax.random.PRNGKey(self.seed + 2)
        k_reset, key = jax.random.split(key)
        state, ts = self.env.reset(k_reset)
        win = None
        W = getattr(self.algo, "window_length", 1)
        total = 0.0
        actor = None
        if self.algo.has_actor_state:
            actor = self.algo.init_actor_state(key, 1)
        prev_enc = None
        if on_frame:
            on_frame(self.env, state, "", "")
        for step_i in range(max_steps):
            key, k_pol, k_step = jax.random.split(key, 3)
            enc = self.algo.obs_encoder.encode(ts.obs)
            if W > 1:
                if win is None:
                    win = jax.tree.map(
                        lambda x: jnp.zeros((W,) + x.shape, x.dtype), enc
                    )
                win = jax.tree.map(lambda w, s: jnp.roll(w, -1, 0).at[-1].set(s), win, enc)
                enc = self.algo.stack_to_obs(win)
            prev_enc = enc
            batched = jax.tree.map(lambda x: x[None], enc)
            ctx = PolicyContext(
                step=jnp.asarray(0),
                training=jnp.asarray(False),
                env_ids=jnp.zeros((1,), jnp.int32),
                env_state=jax.tree.map(lambda x: x[None], state)
                if self.algo.needs_env_state
                else None,
                timestep=jax.tree.map(lambda x: x[None], ts)
                if self.algo.needs_env_state
                else None,
            )
            if self.algo.has_actor_state:
                a_rl, actor = self.algo.policy_step(
                    self.algo_state, actor, batched, ts.invalid_mask[None], ctx, k_pol,
                    jnp.asarray([step_i == 0]),
                )
            elif self.algo.policy_updates_state:
                a_rl, _ = self.algo.policy(
                    self.algo_state, batched, ts.invalid_mask[None], ctx, k_pol
                )
            else:
                a_rl = self.algo.policy(
                    self.algo_state, batched, ts.invalid_mask[None], ctx, k_pol
                )
            a_env = self.algo.action_encoder.decode(jax.tree.map(lambda x: x[0], a_rl))
            rl_text = ""
            if on_frame:
                try:
                    rl_text = self.algo.render_info(
                        self.algo_state, prev_enc, ts.invalid_mask, self.env.action_to_str
                    )
                except Exception:
                    pass
            state, ts = self.env.step(state, a_env, k_step)
            total += float(ts.rewards[0])
            info = (
                f"action: {self.env.action_to_str(np.asarray(a_env))}"
                f" reward: {float(ts.rewards[0]):.3f}"
            )
            if on_frame:
                on_frame(self.env, state, info, rl_text)
            if bool(ts.terminated) or bool(ts.truncated):
                break
        return total

    def render_terminal(self, max_steps: int = 100, render_rl: bool = True) -> float:
        """Play one host-driven episode, printing env frames and the algorithm's
        per-action view (parity: Runner.render_terminal + RL-side worker render,
        runner/runner.py:801 / worker_run.py:413-543)."""

        def on_frame(env, state, info, rl_text):
            if rl_text and render_rl:
                print(rl_text)
            if info:
                print(info)
            env.render_terminal(state)

        return self._play_episode_host(max_steps, on_frame)

    def animation_save_gif(
        self, path: str, max_steps: int = 100, fps: float = 2.0, render_rl: bool = True
    ) -> float:
        """Replay one greedy episode and save it as a gif, compositing the env frame
        with the RL-side per-action view (parity: Runner.animation_save_gif +
        create_render_image, runner/runner.py:1019 / worker_run.py:413-543)."""
        from .render import composite_frame, env_frame, save_gif

        frames = []

        def on_frame(env, state, info, rl_text):
            f = env_frame(env, state)
            if render_rl and (rl_text or info):
                f = composite_frame(f, (info + "\n" + rl_text).strip())
            frames.append(f)

        total = self._play_episode_host(max_steps, on_frame)
        save_gif(frames, path, fps)
        return total

    def _host_policy_action(self, state, ts, actor, k_pol, step_i):
        """One greedy policy action for the current seat (host-driven play paths)."""
        from ..algorithms.base import PolicyContext

        enc = self.algo.obs_encoder.encode(ts.obs)
        batched = jax.tree.map(lambda x: x[None], enc)
        ctx = PolicyContext(
            step=jnp.asarray(0), training=jnp.asarray(False),
            env_ids=jnp.zeros((1,), jnp.int32),
            env_state=jax.tree.map(lambda x: x[None], state)
            if self.algo.needs_env_state else None,
            timestep=jax.tree.map(lambda x: x[None], ts)
            if self.algo.needs_env_state else None,
        )
        if self.algo.has_actor_state:
            a_rl, actor = self.algo.policy_step(
                self.algo_state, actor, batched, ts.invalid_mask[None], ctx,
                k_pol, jnp.asarray([step_i == 0]),
            )
        elif self.algo.policy_updates_state:
            a_rl, _ = self.algo.policy(
                self.algo_state, batched, ts.invalid_mask[None], ctx, k_pol
            )
        else:
            a_rl = self.algo.policy(
                self.algo_state, batched, ts.invalid_mask[None], ctx, k_pol
            )
        a_env = self.algo.action_encoder.decode(jax.tree.map(lambda x: x[0], a_rl))
        return a_env, actor

    def play_terminal(self, max_steps: int = 100, human_player: int = 0) -> float:
        """Interactive terminal play: the human controls ``human_player`` via stdin,
        the trained policy plays the other seats (parity: Runner.play_terminal,
        runner/runner.py:1255). Actions are entered as integers; invalid entries
        re-prompt."""
        from ..algorithms.base import PolicyContext

        key = jax.random.PRNGKey(self.seed + 3)
        k_reset, key = jax.random.split(key)
        state, ts = self.env.reset(k_reset)
        total = 0.0
        self.env.render_terminal(state)
        actor = None
        if self.algo.has_actor_state:
            actor = self.algo.init_actor_state(key, 1)
        for step_i in range(max_steps):
            key, k_pol, k_step = jax.random.split(key, 3)
            if int(ts.next_player) == human_player:
                valid = [
                    a for a in range(self.env.num_actions)
                    if not bool(ts.invalid_mask[a])
                ]
                while True:
                    try:
                        raw = input(f"your move {valid}: ")
                        a = int(raw)
                        if a in valid:
                            break
                    except (ValueError, EOFError):
                        return total
                a_env = jnp.asarray(a, jnp.int32)
            else:
                a_env, actor = self._host_policy_action(state, ts, actor, k_pol, step_i)
            state, ts = self.env.step(state, a_env, k_step)
            total += float(ts.rewards[human_player])
            print(f"action: {self.env.action_to_str(np.asarray(a_env))}  rewards: {np.asarray(ts.rewards)}")
            self.env.render_terminal(state)
            if bool(ts.terminated) or bool(ts.truncated):
                break
        return total

    def render_window(
        self,
        max_steps: int = 200,
        render_interval: float = 0.2,
        num_episodes: int = 1,
        render_rl: bool = True,
    ):
        """Play greedy episodes LIVE in a pygame window with the current policy
        (parity: Runner.render_window, runner/runner.py:866-900 — one episode,
        trainer disabled, frame per step at ``render_interval`` seconds).
        Headless environments fall back to returning the frame list."""
        from .render import composite_frame, env_frame

        frames = []
        screen = [None]

        def on_frame(env, state, info, rl_text):
            img = env_frame(env, state)
            if render_rl and (rl_text or info):
                img = composite_frame(img, "\n".join(t for t in (info, rl_text) if t))
            frames.append(img)
            if screen[0] is False:
                return
            try:
                import os

                if not os.environ.get("DISPLAY"):
                    raise RuntimeError("headless")
                import pygame

                if screen[0] is None:
                    pygame.init()
                    h, w = img.shape[:2]
                    screen[0] = pygame.display.set_mode((w, h))
                    pygame.display.set_caption("render_window")
                surf = pygame.surfarray.make_surface(img.swapaxes(0, 1))
                screen[0].blit(surf, (0, 0))
                pygame.display.flip()
                pygame.event.pump()
                time.sleep(max(render_interval, 0.0))
            except Exception:
                screen[0] = False  # headless: record frames only

        for _ in range(num_episodes):
            self._play_episode_host(max_steps, on_frame)
        if screen[0] not in (None, False):
            import pygame

            pygame.quit()
        return frames

    def replay_window(self, max_steps: int = 200):
        """Record one greedy episode and open a pygame scrubber over its frames
        (parity: Runner.replay_window, runner/runner.py:1121 / RePlayableGame).
        Headless environments fall back to returning the frame list."""
        from .render import env_frame

        frames = []

        def on_frame(env, state, info, rl_text):
            frames.append(env_frame(env, state))

        self._play_episode_host(max_steps, on_frame)
        try:
            import os

            if not os.environ.get("DISPLAY"):
                raise RuntimeError("headless")
            import pygame

            pygame.init()
            h, w = frames[0].shape[:2]
            screen = pygame.display.set_mode((w, h))
            i, run = 0, True
            while run:
                surf = pygame.surfarray.make_surface(frames[i].swapaxes(0, 1))
                screen.blit(surf, (0, 0))
                pygame.display.flip()
                for ev in pygame.event.get():
                    if ev.type == pygame.QUIT:
                        run = False
                    elif ev.type == pygame.KEYDOWN:
                        if ev.key == pygame.K_RIGHT:
                            i = min(i + 1, len(frames) - 1)
                        elif ev.key == pygame.K_LEFT:
                            i = max(i - 1, 0)
                        elif ev.key == pygame.K_ESCAPE:
                            run = False
            pygame.quit()
        except Exception:
            pass
        return frames

    def play_window(
        self,
        max_steps: int = 1000,
        human_player: int = 0,
        key_bind: Optional[Dict[int, int]] = None,
        fps: float = 10.0,
    ) -> float:
        """Live interactive pygame play: the human drives ``human_player`` with the
        keyboard while the trained policy plays the other seats (parity:
        Runner.play_window, runner/runner.py:1182 / PlayableGame). ``key_bind`` maps
        pygame key constants to env actions; default binds arrows to actions 0-3 and
        digit keys to actions 0-9. Headless environments fall back to
        ``play_terminal`` (same control contract, stdin instead of keys)."""
        import os as _os

        if not _os.environ.get("DISPLAY"):
            return self.play_terminal(max_steps=max_steps, human_player=human_player)
        import pygame

        from .render import env_frame

        if key_bind is None:
            key_bind = {
                pygame.K_LEFT: 0, pygame.K_RIGHT: 1, pygame.K_UP: 2, pygame.K_DOWN: 3,
            }
            for d in range(10):
                key_bind[getattr(pygame, f"K_{d}")] = d

        key = jax.random.PRNGKey(self.seed + 5)
        k_reset, key = jax.random.split(key)
        state, ts = self.env.reset(k_reset)
        actor = None
        if self.algo.has_actor_state:
            actor = self.algo.init_actor_state(key, 1)

        pygame.init()
        frame = env_frame(self.env, state)
        h, w = frame.shape[:2]
        screen = pygame.display.set_mode((w, h))
        clock = pygame.time.Clock()
        total, step_i, run = 0.0, 0, True
        while run and step_i < max_steps:
            screen.blit(pygame.surfarray.make_surface(frame.swapaxes(0, 1)), (0, 0))
            pygame.display.flip()
            a_env = None
            if int(ts.next_player) == human_player:
                # block until a bound, valid key (or quit)
                while a_env is None and run:
                    for ev in pygame.event.get():
                        if ev.type == pygame.QUIT or (
                            ev.type == pygame.KEYDOWN and ev.key == pygame.K_ESCAPE
                        ):
                            run = False
                        elif ev.type == pygame.KEYDOWN and ev.key in key_bind:
                            a = key_bind[ev.key]
                            if a < self.env.num_actions and not bool(ts.invalid_mask[a]):
                                a_env = jnp.asarray(a, jnp.int32)
                    clock.tick(60)
                if not run:
                    break
            else:
                for ev in pygame.event.get():
                    if ev.type == pygame.QUIT:
                        run = False
                key, k_pol = jax.random.split(key)
                a_env, actor = self._host_policy_action(state, ts, actor, k_pol, step_i)
                clock.tick(fps)
            key, k_step = jax.random.split(key)
            state, ts = self.env.step(state, a_env, k_step)
            total += float(ts.rewards[human_player])
            frame = env_frame(self.env, state)
            step_i += 1
            if bool(ts.terminated) or bool(ts.truncated):
                screen.blit(pygame.surfarray.make_surface(frame.swapaxes(0, 1)), (0, 0))
                pygame.display.flip()
                break
        pygame.quit()
        return total

    # --- external-env drive -------------------------------------------------
    def make_external_agent(self, greedy: bool = True):
        """Drive the trained policy from an EXTERNAL environment loop (parity:
        EnvBase.direct_step + examples/external_env/srl_agent.py in the reference:
        the external system owns reset/step; this agent owns policy, window
        stacking and recurrent actor state).

        Returns ``agent(obs, episode_start=False, invalid_mask=None) -> action``
        where ``obs`` is a value of the env's observation space (the external
        system translates its raw state into that format — the role of the
        reference's ``direct_step``) and the returned action is an
        env-space host value."""
        from ..algorithms.base import PolicyContext

        assert not self.algo.needs_env_state, (
            "search algorithms simulate with the env model and cannot be driven "
            "by an external environment"
        )
        algo = self.algo
        W = getattr(algo, "window_length", 1)
        st = {
            "key": jax.random.PRNGKey(self.seed + 7),
            "win": None,
            "actor": None,
            "step": 0,
        }

        def agent(obs, episode_start: bool = False, invalid_mask=None):
            if episode_start:
                st["win"] = None
                st["actor"] = None
                st["step"] = 0
            st["key"], k_pol = jax.random.split(st["key"])
            enc = algo.obs_encoder.encode(self.env.observation_space.to_jnp(obs))
            if W > 1:
                if st["win"] is None:
                    st["win"] = jax.tree.map(
                        lambda x: jnp.zeros((W,) + x.shape, x.dtype), enc
                    )
                st["win"] = jax.tree.map(
                    lambda w, s: jnp.roll(w, -1, 0).at[-1].set(s), st["win"], enc
                )
                enc = algo.stack_to_obs(st["win"])
            if invalid_mask is None:
                invalid_mask = jnp.zeros((self.env.num_actions,), jnp.bool_)
            else:
                invalid_mask = jnp.asarray(invalid_mask, jnp.bool_)
            batched = jax.tree.map(lambda x: x[None], enc)
            ctx = PolicyContext(
                step=jnp.asarray(st["step"]),
                training=jnp.asarray(not greedy),
                env_ids=jnp.zeros((1,), jnp.int32),
            )
            if algo.has_actor_state:
                if st["actor"] is None:
                    st["actor"] = algo.init_actor_state(st["key"], 1)
                a_rl, st["actor"] = algo.policy_step(
                    self.algo_state, st["actor"], batched, invalid_mask[None], ctx,
                    k_pol, jnp.asarray([st["step"] == 0]),
                )
            elif algo.policy_updates_state:
                a_rl, _ = algo.policy(
                    self.algo_state, batched, invalid_mask[None], ctx, k_pol
                )
            else:
                a_rl = algo.policy(self.algo_state, batched, invalid_mask[None], ctx, k_pol)
            st["step"] += 1
            a_env = algo.action_encoder.decode(jax.tree.map(lambda x: x[0], a_rl))
            return jax.tree.map(np.asarray, jax.device_get(a_env))

        return agent

    # --- config serialization ---------------------------------------------
    def save_config(self, path: str) -> None:
        """yaml round-trip of the algorithm config (parity: Runner/RLConfig yaml
        save, srl/base/context.py:211-260)."""
        from ..utils import serialize

        serialize.save_yaml(self.algo, path)

    def save(self, path: str) -> None:
        """Save the FULL run as one yaml document with ``env:``/``rl:``/``context:``
        sections (parity: RunContext.load's merged document,
        srl/base/context.py:211-251 + configs/algorithms/dqn_atari.yaml). Restore
        with ``srl.load(path)`` / ``Runner.load(path)``."""
        import yaml

        from ..utils import serialize

        assert self._env_config is not None, (
            "save() needs the env as an id or EnvConfig (a bare EnvCore instance "
            "has no serializable construction recipe)"
        )
        players = None
        if self.players is not None:
            assert all(p is None or isinstance(p, str) for p in self.players), (
                "nested-algorithm opponents are not yaml-serializable"
            )
            players = list(self.players)
        data = {
            "env": serialize.dataclass_to_dict(self._env_config),
            "rl": serialize.dataclass_to_dict(self.algo),
            "context": {
                "num_envs": self.num_envs,
                "seed": self.seed,
                "players": players,
            },
        }
        with open(path, "w") as f:
            yaml.safe_dump(data, f, sort_keys=False)

    @classmethod
    def load(cls, path: str) -> "Runner":
        """Rebuild a Runner from a full-run yaml (parity: srl.load /
        RunContext.load, srl/base/context.py:211-251). Sections may be partial:
        ``env:`` needs at least an id, ``rl:`` a ``_target_`` algorithm config,
        ``context:`` is optional."""
        import yaml

        from ..envs import EnvConfig
        from ..utils import serialize

        with open(path) as f:
            data = yaml.safe_load(f)
        env_cfg = serialize.instantiate(data["env"], EnvConfig)
        algo = serialize.instantiate(data["rl"])
        ctx = data.get("context") or {}
        return cls(
            env_cfg,
            algo,
            num_envs=ctx.get("num_envs", 128),
            players=ctx.get("players"),
            seed=ctx.get("seed"),
        )

    # --- persistence ------------------------------------------------------
    def save_parameter(self, path: str) -> None:
        params = jax.device_get(self.algo.params_of(self.algo_state))
        save_compressed(params, path)

    def load_parameter(self, path: str) -> None:
        params = load_compressed(path)
        self._carry = self.carry.replace(
            algo_state=self.algo.restore_params(self.algo_state, params)
        )
