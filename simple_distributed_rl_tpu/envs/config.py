"""EnvConfig — declarative env spec (parity: srl/base/env/config.py:24: env id +
kwargs + episode options + processor list, yaml round-trip).

TPU notes: the reference's ``episode_timeout`` is wall-clock-based, which has no
trace-time analog; per SURVEY it maps to step-count truncation (``max_episode_steps``).
Processors here are ENV-side observation remaps (the reference's EnvProcessor
pipeline, srl/base/env/env_run.py:40-73) applied by a pure wrapper before the RL-side
encode; they run inside the jitted chunk like everything else.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional

from .core import EnvCore, TimeStep
from .registration import make


@dataclasses.dataclass
class EnvConfig:
    """Env id + construction kwargs + episode options. Pass to ``Runner`` in place of
    an id string; ``make()`` builds the (optionally processor-wrapped) EnvCore."""

    id: str = ""
    kwargs: Dict[str, Any] = dataclasses.field(default_factory=dict)
    max_episode_steps: Optional[int] = None
    frameskip: int = 0
    random_noop_max: int = 0
    processors: List[Any] = dataclasses.field(default_factory=list)

    def make(self) -> EnvCore:
        env = make(self.id, **self.kwargs)
        if self.processors:
            env = ProcessedEnv(env, self.processors)
        return env

    # yaml round-trip (parity: EnvConfig save/load, srl/base/env/config.py)
    def save(self, path: str) -> None:
        from ..utils import serialize

        serialize.save_yaml(self, path)

    @staticmethod
    def load(path: str) -> "EnvConfig":
        from ..utils import serialize

        return serialize.load_yaml(path)


class ProcessedEnv(EnvCore):
    """Pure observation-processor wrapper: remaps the observation space statically and
    each TimeStep's obs inside the jitted step (parity: the EnvProcessor chain applied
    in EnvRun, srl/base/env/env_run.py:40-73)."""

    def __init__(self, env: EnvCore, processors: List[Any]):
        from ..processors import apply_processors

        self.inner = env
        self._obs_space, self._obs_fn = apply_processors(
            env.observation_space, list(processors)
        )

    # --- static metadata: delegate everything except observation_space ------
    @property
    def action_space(self):
        return self.inner.action_space

    @property
    def observation_space(self):
        return self._obs_space

    @property
    def player_num(self):
        return self.inner.player_num

    @property
    def max_episode_steps(self):
        return self.inner.max_episode_steps

    @property
    def reward_baseline(self):
        return self.inner.reward_baseline

    @property
    def worker_names(self):
        return self.inner.worker_names

    def worker_policy(self, name, state, ts, key):
        return self.inner.worker_policy(name, state, ts, key)

    def render_terminal(self, state):
        return self.inner.render_terminal(state)

    def action_to_str(self, action):
        return self.inner.action_to_str(action)

    def _remap(self, ts: TimeStep) -> TimeStep:
        return ts.replace(obs=self._obs_fn(ts.obs))

    def reset(self, key):
        state, ts = self.inner.reset(key)
        return state, self._remap(ts)

    def step(self, state, action, key):
        state, ts = self.inner.step(state, action, key)
        return state, self._remap(ts)
