"""Task lifecycle on the coordination backend (parity: TaskManager,
srl/runner/distribution/server_manager.py:77-455 — create_task, actor-slot
assignment, keepalive/health eviction, train-count board, status, train_wait)."""

from __future__ import annotations

import dataclasses
import time
import uuid
from typing import Any, Dict, List, Optional, Type

from .connectors import IConnector
from .payload import dumps, loads

KEEPALIVE_THRESHOLD = 15.0  # seconds without keepalive -> slot considered dead


@dataclasses.dataclass
class TaskConfig:
    """Everything a remote server needs to rebuild the Runner (parity: the pickled
    RunnerConfig the reference ships over stdin to server_actor_run.py /
    server_trainer_run.py)."""

    env_id: str
    algo_class: Type
    algo_fields: Dict[str, Any]
    num_envs: int = 64
    seed: int = 0
    players: Optional[list] = None
    # loop shape
    chunk_steps: int = 32
    train_steps_per_chunk: int = 1
    trainer_train_steps: int = 16  # train() calls batched per host iteration
    # stop conditions
    max_train_count: Optional[int] = None
    timeout: Optional[float] = None
    # sync cadence (parity: actor_parameter_sync / trainer_parameter_send_interval,
    # runner/distribution/connector_configs.py + server_trainer_run.py)
    actor_parameter_sync: float = 1.0
    trainer_parameter_send_interval: float = 1.0
    # backpressure: actors pause when the queue is deeper than this (parity:
    # memory queue capacity in play_mp_memory.py)
    memory_queue_capacity: int = 64
    # host-side prioritized replay in the trainer daemon via the C++ sum-tree
    # (ops/host_per.py; parity: memory.set_proportional_cpp, the reference's
    # pybind11 ProportionalMemory living in the memory/trainer process). Requires
    # the algorithm to expose train_on_batch (DQN family).
    use_host_per: bool = False
    host_per_alpha: float = 0.6
    host_per_beta_initial: float = 0.4
    host_per_beta_steps: int = 1_000_000
    host_per_capacity: int = 100_000
    host_per_batch_size: int = 64

    @classmethod
    def from_runner(cls, runner, **overrides) -> "TaskConfig":
        algo = runner.algo
        fields = {
            f.name: getattr(algo, f.name)
            for f in dataclasses.fields(type(algo))
            if f.init
        }
        tc = cls(
            env_id=runner.env_id,
            algo_class=type(algo),
            algo_fields=fields,
            num_envs=runner.num_envs,
            seed=runner.seed,
            players=list(runner.players) if runner.players is not None else None,
        )
        for k, v in overrides.items():
            setattr(tc, k, v)
        return tc

    def make_runner(self, actor_id: int = 0, is_actor: bool = False):
        from ..runner import Runner

        algo = self.algo_class(**self.algo_fields)
        r = Runner(
            self.env_id, algo, num_envs=self.num_envs,
            players=self.players, seed=self.seed + actor_id * 7919,
        )
        if is_actor and actor_id > 0:
            # re-point the exploration ladder offset for this actor's engine
            r.engine.env_id_offset = actor_id * self.num_envs
        return r


class TaskManager:
    """All parties (client, trainer, actors) coordinate through these keys:

    =====================  =======================================================
    task:status            "" | "ACTIVE" | "END"
    task:config            TaskConfig payload
    task:actor_num         int
    task:actor{i}          claimed uid ("" = free)
    task:actor{i}:keepalive  float unix time
    task:trainer           claimed uid
    task:trainer:keepalive float unix time
    task:train_count       int board (trainer writes, client reads)
    task:parameter(+count) param board (IConnector.parameter_*)
    task:memory            experience queue (IConnector.memory_*)
    task:end_reason        str
    =====================  =======================================================
    """

    def __init__(self, connector: IConnector, uid: Optional[str] = None):
        self.c = connector
        self.uid = uid or uuid.uuid4().hex[:12]

    # --- client side --------------------------------------------------------
    def create_task(self, task_config: TaskConfig, params_payload: bytes, actor_num: int = 1) -> None:
        self.c.flushall()
        self.c.set("task:config", dumps(task_config))
        self.c.set("task:actor_num", actor_num)
        for i in range(actor_num):
            self.c.set(f"task:actor{i}", "")
            self.c.set(f"task:actor{i}:keepalive", 0.0)
        self.c.set("task:trainer", "")
        self.c.set("task:trainer:keepalive", 0.0)
        self.c.set("task:train_count", 0)
        self.c.set("task:end_reason", "")
        self.c.parameter_write(params_payload)
        self.c.set("task:status", "ACTIVE")

    def status(self) -> str:
        return self.c.get("task:status") or ""

    def is_active(self) -> bool:
        return self.status() == "ACTIVE"

    def is_finished(self) -> bool:
        return self.status() == "END"

    def finished(self, reason: str = "") -> None:
        self.c.set("task:end_reason", reason)
        self.c.set("task:status", "END")

    def end_reason(self) -> str:
        return self.c.get("task:end_reason") or ""

    def get_config(self) -> Optional[TaskConfig]:
        raw = self.c.get("task:config")
        return loads(raw) if raw is not None else None

    def train_count(self) -> int:
        return int(self.c.get("task:train_count") or 0)

    def set_train_count(self, n: int) -> None:
        self.c.set("task:train_count", int(n))

    # --- claims / keepalive (parity: server_manager assign + keepalive) ------
    def _try_lock(self, key: str) -> bool:
        """setnx claim with stale-lock recovery (a crashed claimant can't wedge the
        slot: locks older than the keepalive threshold are broken)."""
        now = time.time()
        if self.c.setnx(key, (self.uid, now)):
            return True
        held = self.c.get(key)
        if held is not None and now - float(held[1]) > KEEPALIVE_THRESHOLD:
            self.c.delete(key)
            return self.c.setnx(key, (self.uid, now))
        return False

    def claim_trainer(self) -> bool:
        if not self.is_active():
            return False
        now = time.time()
        holder = self.c.get("task:trainer")
        alive = now - float(self.c.get("task:trainer:keepalive") or 0) < KEEPALIVE_THRESHOLD
        if holder and alive and holder != self.uid:
            return False
        if self._try_lock("task:trainer:lock"):
            self.c.set("task:trainer", self.uid)
            self.c.set("task:trainer:keepalive", now)
            self.c.delete("task:trainer:lock")
            return True
        return False

    def claim_actor(self) -> Optional[int]:
        if not self.is_active():
            return None
        now = time.time()
        n = int(self.c.get("task:actor_num") or 0)
        for i in range(n):
            holder = self.c.get(f"task:actor{i}")
            alive = now - float(self.c.get(f"task:actor{i}:keepalive") or 0) < KEEPALIVE_THRESHOLD
            if holder and alive and holder != self.uid:
                continue
            if self._try_lock(f"task:actor{i}:lock"):
                self.c.set(f"task:actor{i}", self.uid)
                self.c.set(f"task:actor{i}:keepalive", now)
                self.c.delete(f"task:actor{i}:lock")
                return i
        return None

    def keepalive_actor(self, slot: int) -> None:
        self.c.set(f"task:actor{slot}:keepalive", time.time())

    def keepalive_trainer(self) -> None:
        self.c.set("task:trainer:keepalive", time.time())

    def healthcheck(self) -> Dict[str, Any]:
        """Slot health report; frees slots whose keepalive went stale (parity: the
        threshold eviction in server_manager.py)."""
        now = time.time()
        n = int(self.c.get("task:actor_num") or 0)
        report: Dict[str, Any] = {"actors": [], "trainer": None}
        for i in range(n):
            holder = self.c.get(f"task:actor{i}") or ""
            age = now - float(self.c.get(f"task:actor{i}:keepalive") or 0)
            if holder and age > KEEPALIVE_THRESHOLD:
                self.c.set(f"task:actor{i}", "")
                holder = ""
            report["actors"].append({"slot": i, "uid": holder, "age": age})
        holder = self.c.get("task:trainer") or ""
        age = now - float(self.c.get("task:trainer:keepalive") or 0)
        if holder and age > KEEPALIVE_THRESHOLD:
            self.c.set("task:trainer", "")
            holder = ""
        report["trainer"] = {"uid": holder, "age": age}
        return report

    # --- param board ----------------------------------------------------------
    def write_parameter(self, payload: bytes) -> None:
        self.c.parameter_write(payload)

    def read_parameter(self) -> tuple:
        return self.c.parameter_read(), self.c.parameter_count()

    # --- blocking client wait (parity: train_wait, server_manager.py:390-455) --
    def train_wait(
        self,
        timeout: Optional[float] = None,
        progress: bool = True,
        progress_interval: float = 5.0,
        callbacks: Optional[List] = None,
        raise_exception: bool = False,
    ) -> str:
        from .dist_callbacks import DistributionCallback

        t0 = time.time()
        last = 0.0
        callbacks = callbacks or []
        typed = [c for c in callbacks if isinstance(c, DistributionCallback)]
        plain = [c for c in callbacks if not isinstance(c, DistributionCallback)]
        for cb in typed:
            cb.on_start(self)

        def finish(reason: str) -> str:
            for cb in typed:
                try:
                    cb.on_end(self)
                except Exception:
                    if raise_exception:
                        raise
            return reason

        while True:
            if self.is_finished():
                reason = self.end_reason()
                if progress:
                    print(f"### distributed task finished: {reason}")
                return finish(reason)
            if timeout and time.time() - t0 > timeout:
                self.finished("client timeout")
                return finish("client timeout")
            if time.time() - last >= progress_interval:
                last = time.time()
                if progress:
                    hc = self.healthcheck()
                    actors = sum(1 for a in hc["actors"] if a["uid"])
                    print(
                        f"### train {self.train_count():,} "
                        f"(memory {self.c.memory_size()}, actors {actors}, "
                        f"trainer {'up' if hc['trainer']['uid'] else 'DOWN'}, "
                        f"{time.time() - t0:.0f}s)"
                    )
                for cb in plain:
                    try:
                        cb(self)
                    except Exception:
                        if raise_exception:
                            raise
                for cb in typed:
                    try:
                        if cb.on_polling(self) is False:
                            self.finished("callback stop")
                            return finish("callback stop")
                    except Exception:
                        if raise_exception:
                            raise
            time.sleep(0.2)
