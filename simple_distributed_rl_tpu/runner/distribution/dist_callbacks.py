"""Client-side distribution callbacks (parity: srl/runner/distribution/callback.py
DistributionCallback + callbacks/{checkpoint,history_on_file,print_progress}.py —
typed hooks polled by ``TaskManager.train_wait``: interval parameter checkpoints
pulled off the param board, and a jsonl history of the task health board)."""

from __future__ import annotations

import json
import os
import time
from abc import ABC
from typing import TYPE_CHECKING, Optional

if TYPE_CHECKING:
    from .task_manager import TaskManager


class DistributionCallback(ABC):
    """(parity: distribution/callback.py:8-17)"""

    def on_start(self, task_manager: "TaskManager") -> None:
        pass

    def on_polling(self, task_manager: "TaskManager") -> Optional[bool]:
        """Return False to stop the client wait loop."""
        return None

    def on_end(self, task_manager: "TaskManager") -> None:
        pass


class DistCheckpoint(DistributionCallback):
    """Interval snapshots of the trainer's latest published parameter (parity:
    distribution/callbacks/checkpoint.py Checkpoint — saves the param-board
    payload; loadable via ``Runner.load_parameter``)."""

    def __init__(self, save_dir: str, interval: float = 60.0):
        self.save_dir = save_dir
        self.interval = interval
        os.makedirs(save_dir, exist_ok=True)
        self._t_last = 0.0

    def _save(self, tm: "TaskManager") -> None:
        payload, count = tm.read_parameter()
        if payload is None:
            return
        # the board speaks the zlib wire framing (payload.dumps); re-wrap as the
        # pickle+lzma file format Runner.load_parameter expects
        from ..callbacks import save_compressed
        from .payload import loads

        path = os.path.join(self.save_dir, f"parameter_{count:08d}.pkl.xz")
        save_compressed(loads(payload), path)

    def on_start(self, tm: "TaskManager") -> None:
        self._t_last = time.time()

    def on_polling(self, tm: "TaskManager") -> None:
        if time.time() - self._t_last >= self.interval:
            self._t_last = time.time()
            self._save(tm)

    def on_end(self, tm: "TaskManager") -> None:
        self._save(tm)

    @staticmethod
    def latest(save_dir: str) -> Optional[str]:
        files = sorted(
            f for f in os.listdir(save_dir) if f.startswith("parameter_")
        )
        return os.path.join(save_dir, files[-1]) if files else None


class DistHistoryOnFile(DistributionCallback):
    """jsonl history of the task board during a distributed run (parity:
    distribution/callbacks/history_on_file.py HistoryOnFile)."""

    def __init__(self, save_dir: str, interval: float = 10.0):
        self.save_dir = save_dir
        self.interval = interval
        os.makedirs(save_dir, exist_ok=True)
        self._fp = None
        self._t_last = 0.0

    def _write(self, tm: "TaskManager") -> None:
        hc = tm.healthcheck()
        rec = {
            "time": time.time() - self._t0,
            "train_count": tm.train_count(),
            "memory_size": tm.c.memory_size(),
            "actors_alive": sum(1 for a in hc["actors"] if a["uid"]),
            "trainer_up": bool(hc["trainer"]["uid"]),
        }
        self._fp.write(json.dumps(rec) + "\n")
        self._fp.flush()

    def on_start(self, tm: "TaskManager") -> None:
        self._fp = open(os.path.join(self.save_dir, "history.jsonl"), "w")
        self._t0 = time.time()
        self._t_last = 0.0

    def on_polling(self, tm: "TaskManager") -> None:
        if time.time() - self._t_last >= self.interval:
            self._t_last = time.time()
            self._write(tm)

    def on_end(self, tm: "TaskManager") -> None:
        if self._fp:
            self._write(tm)
            self._fp.close()
            self._fp = None
