"""Driving a trained policy from an EXTERNAL environment loop.

Parity: /root/reference/examples/external_env/ (EnvBase.direct_step,
srl/base/env/base.py:173): the external system owns reset/step; the framework only
supplies actions. Here the external system is a plain Python random-walk game; the
policy was trained on the built-in Grid env and is driven via
``Runner.make_external_agent()``.

Run:  PYTHONPATH=. python examples/external_env.py
"""

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

import simple_distributed_rl_tpu as srl
from simple_distributed_rl_tpu.algorithms import QLConfig


class ExternalEnv:
    """The reference example's +-5 random walk (examples/external_env/env_external.py):
    action 0 moves left, 1 moves right; reach +5 -> reward 1, -5 -> reward -1."""

    def __init__(self):
        self.pos = 0
        self.reward = 0
        self.done = False

    def step(self, action):
        self.pos += 1 if action else -1
        if self.pos >= 5:
            self.reward, self.done = 1, True
        if self.pos <= -5:
            self.reward, self.done = -1, True


def main():
    # train on the built-in OneRoad-like representation: a 1D ArrayDiscrete obs.
    # For the demo we train QL on a tiny custom env matching the external format.
    from simple_distributed_rl_tpu.envs.core import EnvCore
    from simple_distributed_rl_tpu.spaces import ArrayDiscrete, Discrete

    import jax.numpy as jnp

    class WalkEnv(EnvCore):
        @property
        def action_space(self):
            return Discrete(2)

        @property
        def observation_space(self):
            return ArrayDiscrete(1, -5, 5)

        @property
        def max_episode_steps(self):
            return 30

        def reset(self, key):
            s = jnp.zeros((1,), jnp.int32)
            return s, self.timestep(obs=s)

        def step(self, state, action, key):
            s = state + jnp.where(action > 0, 1, -1)
            done = jnp.abs(s[0]) >= 5
            r = jnp.where(s[0] >= 5, 1.0, jnp.where(s[0] <= -5, -1.0, 0.0))
            return s, self.timestep(obs=s, rewards=r, terminated=done)

    runner = srl.Runner(WalkEnv(), QLConfig(), num_envs=64, seed=1)
    runner.train(max_steps=50_000, progress=False)

    # --- the external loop drives everything; we only answer "what action?"
    agent = runner.make_external_agent()
    for episode in range(3):
        env = ExternalEnv()
        history = [env.pos]
        for step in range(30):
            action = int(agent(np.array([env.pos]), episode_start=(step == 0)))
            env.step(action)
            history.append(env.pos)
            if env.done:
                break
        print(f"episode {episode}: reward={env.reward} path={history}")
        assert env.reward == 1, "trained policy should walk straight to +5"


if __name__ == "__main__":
    main()
