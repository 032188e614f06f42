"""Host-side prioritized replay backed by the C++ sum-tree.

Parity with the reference's native module loader + ProportionalMemory surface
(srl/rl/memories/priority_memories/cpp_module/__init__.py:35-96 JIT-compile-on-first-
use, proportional_memory.py:96-205 semantics): alpha-exponentiated priorities,
max-priority insert, beta-annealed IS weights normalized by batch max, backup/restore.
Items are stored as arbitrary python objects (host path — gymnasium adapter envs,
external DCN actors); the on-device path is memories/priority_buffer.py.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import sysconfig
from typing import Any, List, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_LIB = None
_CPP_DIR = os.path.join(os.path.dirname(__file__), "cpp")


def _build_lib() -> str:
    """Compile the shared library on first use (parity: setup_cpp.py subprocess
    build, cpp_module/__init__.py:35-96)."""
    so_path = os.path.join(_CPP_DIR, "libsumtree.so")
    src = os.path.join(_CPP_DIR, "sumtree.cpp")
    if os.path.exists(so_path) and os.path.getmtime(so_path) >= os.path.getmtime(src):
        return so_path
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-o", so_path, src]
    logger.info("building sumtree: %s", " ".join(cmd))
    subprocess.run(cmd, check=True, capture_output=True)
    return so_path


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    lib = ctypes.CDLL(_build_lib())
    lib.sumtree_new.restype = ctypes.c_void_p
    lib.sumtree_new.argtypes = [ctypes.c_int64, ctypes.c_double, ctypes.c_double, ctypes.c_uint64]
    lib.sumtree_free.argtypes = [ctypes.c_void_p]
    lib.sumtree_size.restype = ctypes.c_int64
    lib.sumtree_size.argtypes = [ctypes.c_void_p]
    lib.sumtree_total.restype = ctypes.c_double
    lib.sumtree_total.argtypes = [ctypes.c_void_p]
    lib.sumtree_max_priority.restype = ctypes.c_double
    lib.sumtree_max_priority.argtypes = [ctypes.c_void_p]
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    lib.sumtree_add.argtypes = [ctypes.c_void_p, ctypes.c_int64, i64p]
    lib.sumtree_add_with_priority.argtypes = [ctypes.c_void_p, ctypes.c_int64, f64p, i64p]
    lib.sumtree_update.argtypes = [ctypes.c_void_p, ctypes.c_int64, i64p, f64p]
    lib.sumtree_sample.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_double, i64p, f64p]
    lib.sumtree_get_leaves.argtypes = [ctypes.c_void_p, f64p]
    lib.sumtree_set_leaves.argtypes = [
        ctypes.c_void_p, f64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_double,
    ]
    _LIB = lib
    return lib


def is_available() -> bool:
    try:
        _load()
        return True
    except Exception as e:  # pragma: no cover - toolchain missing
        logger.warning("sumtree build failed: %s", e)
        return False


class HostProportionalMemory:
    """Drop-in host PER (parity: ProportionalMemory, proportional_memory.py:96)."""

    def __init__(
        self,
        capacity: int,
        alpha: float = 0.6,
        beta_initial: float = 0.4,
        beta_steps: int = 1_000_000,
        epsilon: float = 1e-4,
        seed: int = 0,
    ):
        self._lib = _load()
        self.capacity = int(capacity)
        self.alpha = alpha
        self.beta_initial = beta_initial
        self.beta_steps = beta_steps
        self.epsilon = epsilon
        self._h = ctypes.c_void_p(
            self._lib.sumtree_new(self.capacity, alpha, epsilon, seed)
        )
        self._data: List[Any] = [None] * self.capacity

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.sumtree_free(self._h)
            self._h = None

    def length(self) -> int:
        return int(self._lib.sumtree_size(self._h))

    def add(self, item: Any, priority: Optional[float] = None) -> None:
        self.add_batch([item], None if priority is None else np.asarray([priority], np.float64))

    def add_batch(self, items: List[Any], raw_priorities: Optional[np.ndarray] = None) -> None:
        n = len(items)
        slots = np.empty(n, np.int64)
        if raw_priorities is None:
            self._lib.sumtree_add(self._h, n, slots)
        else:
            self._lib.sumtree_add_with_priority(
                self._h, n, np.ascontiguousarray(raw_priorities, np.float64), slots
            )
        for s, it in zip(slots, items):
            self._data[int(s)] = it

    def sample(self, batch_size: int, step: int) -> Tuple[List[Any], np.ndarray, np.ndarray]:
        beta = min(self.beta_initial + (1 - self.beta_initial) * step / self.beta_steps, 1.0)
        slots = np.empty(batch_size, np.int64)
        weights = np.empty(batch_size, np.float64)
        self._lib.sumtree_sample(self._h, batch_size, beta, slots, weights)
        items = [self._data[int(s)] for s in slots]
        return items, weights.astype(np.float32), slots

    def update(self, slots: np.ndarray, raw_priorities: np.ndarray) -> None:
        self._lib.sumtree_update(
            self._h,
            len(slots),
            np.ascontiguousarray(slots, np.int64),
            np.ascontiguousarray(raw_priorities, np.float64),
        )

    # --- checkpoint (parity: proportional_memory.py backup/restore) ----------
    def backup(self):
        leaves = np.empty(self.capacity, np.float64)
        self._lib.sumtree_get_leaves(self._h, leaves)
        return {
            "leaves": leaves,
            "data": list(self._data),
            "size": self.length(),
            "max_priority": float(self._lib.sumtree_max_priority(self._h)),
        }

    def restore(self, d) -> None:
        self._lib.sumtree_set_leaves(
            self._h,
            np.ascontiguousarray(d["leaves"], np.float64),
            len(d["leaves"]),
            d["size"] % self.capacity,
            d["size"],
            d["max_priority"],
        )
        self._data = list(d["data"])
