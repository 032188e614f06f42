"""EnvConfig (id + kwargs + episode options + processors + yaml) and ProcessedEnv."""

import os

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")

import simple_distributed_rl_tpu as srl
from simple_distributed_rl_tpu.algorithms import QLConfig
from simple_distributed_rl_tpu.envs import EnvConfig, ProcessedEnv
from simple_distributed_rl_tpu.processors import Processor
from simple_distributed_rl_tpu.spaces import Box


def test_env_config_runner_and_yaml(tmp_path):
    cfg = EnvConfig("Grid", max_episode_steps=20, frameskip=0)
    r = srl.Runner(cfg, QLConfig(), num_envs=16, seed=1)
    r.train(max_steps=2_000, progress=False)
    assert np.isfinite(r.evaluate(8)).all()

    p = str(tmp_path / "env.yaml")
    cfg.save(p)
    cfg2 = EnvConfig.load(p)
    assert cfg2.id == "Grid" and cfg2.max_episode_steps == 20


class _PlusOne(Processor):
    """obs -> float obs + 1 (tiny processor for wrapper plumbing)."""

    def remap_space(self, space):
        return Box(space.shape, -100.0, 100.0, jnp.float32, space.stype)

    def remap(self, x):
        return jnp.asarray(x, jnp.float32) + 1.0


def test_processed_env_remaps_obs():
    inner = srl.make_env("Grid")
    env = ProcessedEnv(inner, [_PlusOne()])
    assert env.observation_space.dtype == jnp.float32
    k = jax.random.PRNGKey(0)
    s, ts = env.reset(k)
    s0, ts0 = inner.reset(k)
    np.testing.assert_allclose(
        np.asarray(ts.obs), np.asarray(ts0.obs).astype(np.float32) + 1.0
    )
    # delegation intact
    assert env.player_num == inner.player_num
    assert env.max_episode_steps == inner.max_episode_steps

    # trains through the Runner with the processor-wrapped env
    cfg = EnvConfig("Grid", processors=[_PlusOne()])
    r = srl.Runner(cfg, QLConfig(), num_envs=16, seed=3)
    r.train(max_steps=1_000, progress=False)
