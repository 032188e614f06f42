"""Run callbacks: progress / history / checkpoint / evaluation hooks.

Parity: RunCallback (srl/base/run/callback.py:11), PrintProgress
(srl/runner/callbacks/print_progress.py:21-500), HistoryOnFile
(history_on_file.py:66-381), Checkpoint (checkpoint.py:20-94). Callbacks fire at CHUNK
boundaries — the only host-sync points of the jitted engine — instead of per step.
"""

from __future__ import annotations

import json
import lzma
import os
import pickle
import time
from typing import Any, Dict, List, Optional


class RunCallback:
    """Hook interface. ``on_chunk_end`` may return False to stop training early
    (parity: on_step_end bool early-stop, callback.py:11)."""

    def on_start(self, runner) -> None:
        pass

    def on_chunk_end(self, runner, stats: Dict[str, Any]) -> Optional[bool]:
        return None

    def on_end(self, runner) -> None:
        pass


def system_stats() -> Dict[str, float]:
    """Host + device utilization snapshot (parity: the psutil/pynvml sampling in
    srl/base/system/psutil_.py:17-25 + pynvml_.py:13-42; the TPU equivalent of the
    GPU counters is per-device HBM usage from jax memory_stats)."""
    out: Dict[str, float] = {}
    try:
        import psutil

        out["cpu_pct"] = float(psutil.cpu_percent(interval=None))
        out["mem_pct"] = float(psutil.virtual_memory().percent)
    except Exception:
        pass
    try:
        import jax

        ms = jax.local_devices()[0].memory_stats()
        if ms:
            used = float(ms.get("bytes_in_use", 0.0))
            limit = float(ms.get("bytes_limit", 0.0) or 0.0)
            out["dev_mem_gb"] = used / 2**30
            if limit > 0:
                out["dev_mem_pct"] = 100.0 * used / limit
    except Exception:
        pass
    return out


class PrintProgress(RunCallback):
    """Adaptive-interval progress lines: env-steps/s, episodes, mean reward, train
    count, loss, CPU/host-memory and device-HBM utilization (parity:
    print_progress.py:135-500 incl. its enable_stats system columns)."""

    def __init__(self, interval: float = 5.0, max_interval: float = 60.0, enable_stats: bool = True):
        self.interval = interval
        self.max_interval = max_interval
        self.enable_stats = enable_stats
        self._t_last = 0.0
        self._steps_last = 0

    def on_start(self, runner) -> None:
        self._t0 = time.time()
        self._t_last = self._t0
        self._steps_last = 0
        print(f"### start: env={runner.env_id} rl={runner.algo.get_name()} envs={runner.num_envs}")

    def on_chunk_end(self, runner, stats) -> None:
        now = time.time()
        if now - self._t_last < self.interval:
            return
        dt = now - self._t_last
        steps = stats["env_steps"]
        sps = (steps - self._steps_last) / dt
        self._t_last = now
        self._steps_last = steps
        self.interval = min(self.interval * 1.5, self.max_interval)
        msg = (
            f"{now - self._t0:7.1f}s {steps:>12,}st {sps:>12,.0f}st/s"
            f" {stats.get('episode_count', 0):>8}ep"
        )
        rew = stats.get("mean_episode_reward")
        if rew is not None:
            msg += f" reward {rew:8.3f}"
        if "train_count" in stats:
            msg += f" train {int(stats['train_count']):>9,}"
        if "loss" in stats:
            msg += f" loss {stats['loss']:.4f}"
        if self.enable_stats:
            sysst = system_stats()
            if "cpu_pct" in sysst:
                msg += f" [CPU {sysst['cpu_pct']:3.0f}% MEM {sysst['mem_pct']:3.0f}%"
                if "dev_mem_gb" in sysst:
                    msg += f" HBM {sysst['dev_mem_gb']:.2f}GB"
                    if "dev_mem_pct" in sysst:
                        msg += f"({sysst['dev_mem_pct']:.0f}%)"
                msg += "]"
            stats.update(sysst)
        print(msg)


class HistoryOnFile(RunCallback):
    """jsonl per-chunk log (parity: history_on_file.py)."""

    def __init__(self, save_dir: str):
        self.save_dir = save_dir
        os.makedirs(save_dir, exist_ok=True)
        self._fp = None

    def on_start(self, runner) -> None:
        self._fp = open(os.path.join(self.save_dir, "history.jsonl"), "w")
        self._t0 = time.time()

    def on_chunk_end(self, runner, stats) -> None:
        if self._fp:
            rec = {"time": time.time() - self._t0}
            rec.update({k: v for k, v in stats.items() if isinstance(v, (int, float))})
            self._fp.write(json.dumps(rec) + "\n")

    def on_end(self, runner) -> None:
        if self._fp:
            self._fp.close()
            self._fp = None


class HistoryOnMemory(RunCallback):
    """In-memory per-chunk history (parity: history_on_memory.py HistoryOnMemory
    — same record shape as HistoryOnFile, no disk). Read back via
    ``Runner.get_history()`` which wraps the records in a HistoryViewer."""

    def __init__(self):
        self.records: list = []

    def on_start(self, runner) -> None:
        self._t0 = time.time()

    def on_chunk_end(self, runner, stats) -> None:
        rec = {"time": time.time() - self._t0}
        rec.update({k: v for k, v in stats.items() if isinstance(v, (int, float))})
        self.records.append(rec)


class Checkpoint(RunCallback):
    """Interval parameter snapshots named <time>_<traincount>.pkl.xz (parity:
    checkpoint.py:20-94 naming date_traincount_evalreward)."""

    def __init__(self, save_dir: str, interval: float = 60.0):
        self.save_dir = save_dir
        self.interval = interval
        os.makedirs(save_dir, exist_ok=True)
        self._t_last = 0.0

    def on_chunk_end(self, runner, stats) -> None:
        now = time.time()
        if now - self._t_last < self.interval:
            return
        self._t_last = now
        fname = os.path.join(
            self.save_dir,
            time.strftime("%Y%m%d-%H%M%S") + f"_{int(stats.get('train_count', 0))}.pkl.xz",
        )
        runner.save_parameter(fname)

    @staticmethod
    def latest(save_dir: str) -> Optional[str]:
        files = sorted(f for f in os.listdir(save_dir) if f.endswith(".pkl.xz"))
        return os.path.join(save_dir, files[-1]) if files else None


class OrbaxCheckpoint(RunCallback):
    """Interval checkpoints of the FULL algorithm state (params + optimizer + replay +
    counters) via orbax — the TPU-native checkpoint/resume path (the reference's
    equivalent is the pickle+lzma Checkpoint callback, runner/callbacks/checkpoint.py:
    20-94; orbax adds async, sharding-aware, multi-host-safe array storage). Restore
    with ``OrbaxCheckpoint.restore(save_dir, runner)``."""

    def __init__(self, save_dir: str, interval: float = 60.0, max_to_keep: int = 5):
        import orbax.checkpoint as ocp

        self.save_dir = os.path.abspath(save_dir)
        self.interval = interval
        self._mgr = ocp.CheckpointManager(
            self.save_dir,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
        )
        self._t_last = 0.0

    def on_chunk_end(self, runner, stats) -> None:
        now = time.time()
        if now - self._t_last < self.interval:
            return
        self._t_last = now
        import orbax.checkpoint as ocp

        step = int(stats.get("train_count", 0) or stats.get("steps", 0))
        self._mgr.save(step, args=ocp.args.StandardSave(runner.algo_state))
        self._mgr.wait_until_finished()

    def on_end(self, runner) -> None:
        # final snapshot (parity: the reference checkpoints on run end too,
        # runner/callbacks/checkpoint.py:20-94)
        import orbax.checkpoint as ocp

        latest = self._mgr.latest_step()
        step = (latest or 0) + 1
        self._mgr.save(step, args=ocp.args.StandardSave(runner.algo_state))
        self._mgr.wait_until_finished()

    @staticmethod
    def restore(save_dir: str, runner, step: int = None):
        """Load the latest (or a specific) checkpoint back into the runner."""
        import orbax.checkpoint as ocp

        mgr = ocp.CheckpointManager(os.path.abspath(save_dir))
        step = mgr.latest_step() if step is None else step
        restored = mgr.restore(
            step, args=ocp.args.StandardRestore(runner.algo_state)
        )
        runner._carry = runner.carry.replace(algo_state=restored)
        return step


def save_compressed(obj: Any, path: str) -> None:
    """pickle+lzma (parity: RLParameter.save, srl/base/rl/parameter.py:38-51)."""
    with lzma.open(path, "wb") as f:
        pickle.dump(obj, f)


def load_compressed(path: str) -> Any:
    with lzma.open(path, "rb") as f:
        return pickle.load(f)


class Evaluate(RunCallback):
    """Mid-train evaluation at intervals (parity: runner/callbacks/evaluate.py)."""

    def __init__(self, interval: float = 30.0, num_episodes: int = 10):
        self.interval = interval
        self.num_episodes = num_episodes
        self._t_last = 0.0
        self.history: List[tuple] = []

    def on_chunk_end(self, runner, stats) -> None:
        now = time.time()
        if now - self._t_last < self.interval:
            return
        self._t_last = now
        rewards = runner.evaluate(self.num_episodes)
        self.history.append((stats["env_steps"], rewards))
        stats["eval_reward"] = float(rewards[0])
