"""Value schedulers as pure functions of the (traced) step counter.

Parity: srl/rl/schedulers/scheduler.py:11-345 (constant/linear/cosine/polynomial and
chained phases) and lr_scheduler.py. The reference mutates host objects per call; here a
schedule is a closure ``step -> value`` evaluated inside jit, and LR schedules plug
straight into optax (which accepts any callable of the step count).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Tuple

import jax.numpy as jnp

Schedule = Callable  # step: Array -> Array


def constant(value: float) -> Schedule:
    return lambda step: jnp.asarray(value, jnp.float32)


def linear(start: float, end: float, steps: int) -> Schedule:
    def f(step):
        frac = jnp.clip(step / max(steps, 1), 0.0, 1.0)
        return jnp.asarray(start + (end - start) * frac, jnp.float32)

    return f


def cosine(start: float, end: float, steps: int) -> Schedule:
    def f(step):
        frac = jnp.clip(step / max(steps, 1), 0.0, 1.0)
        return jnp.asarray(end + (start - end) * 0.5 * (1 + jnp.cos(jnp.pi * frac)), jnp.float32)

    return f


def cosine_with_hard_restarts(start: float, end: float, steps: int, num_cycles: int = 1) -> Schedule:
    def f(step):
        frac = jnp.clip(step / max(steps, 1), 0.0, 1.0)
        cyc = (frac * num_cycles) % 1.0
        return jnp.asarray(end + (start - end) * 0.5 * (1 + jnp.cos(jnp.pi * cyc)), jnp.float32)

    return f


def polynomial(start: float, end: float, steps: int, power: float = 2.0) -> Schedule:
    def f(step):
        frac = jnp.clip(step / max(steps, 1), 0.0, 1.0)
        return jnp.asarray(end + (start - end) * (1.0 - frac) ** power, jnp.float32)

    return f


def chain(phases: List[Tuple[int, Schedule]]) -> Schedule:
    """Piecewise schedule: phases = [(start_step, schedule), ...] sorted ascending;
    each schedule sees a step counter relative to its phase start (parity:
    scheduler.py:319 chained phases)."""

    starts = [s for s, _ in phases]

    def f(step):
        out = phases[0][1](step - starts[0])
        for s, sch in phases[1:]:
            out = jnp.where(step >= s, sch(step - s), out)
        return out

    return f


@dataclasses.dataclass
class SchedulerConfig:
    """Declarative scheduler config mirroring the reference's SchedulerConfig API
    (set_constant/set_linear/set_cosine/...). ``create(default)`` compiles to a pure
    schedule fn."""

    kind: str = "constant"
    start: float = 0.0
    end: float = 0.0
    steps: int = 1
    power: float = 2.0
    num_cycles: int = 1

    def set_constant(self, value: float = None):
        self.kind = "constant"
        if value is not None:
            self.start = value
        return self

    def set_linear(self, start: float, end: float, steps: int):
        self.kind, self.start, self.end, self.steps = "linear", start, end, steps
        return self

    def set_cosine(self, start: float, end: float, steps: int):
        self.kind, self.start, self.end, self.steps = "cosine", start, end, steps
        return self

    def set_polynomial(self, start: float, end: float, steps: int, power: float = 2.0):
        self.kind, self.start, self.end, self.steps, self.power = "polynomial", start, end, steps, power
        return self

    def create(self, default_value: float) -> Schedule:
        if self.kind == "constant":
            return constant(self.start if self.start else default_value)
        if self.kind == "linear":
            return linear(self.start, self.end, self.steps)
        if self.kind == "cosine":
            return cosine(self.start, self.end, self.steps)
        if self.kind == "polynomial":
            return polynomial(self.start, self.end, self.steps, self.power)
        raise ValueError(self.kind)
