"""DIAMOND tests (diffusion world model + imagination actor-critic)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import simple_distributed_rl_tpu as srl
from simple_distributed_rl_tpu.algorithms import DiamondConfig, make


def _small(**kw):
    cfg = make("DIAMOND").set_small_params()
    cfg.warmup_size = 10
    for k, v in kw.items():
        setattr(cfg, k, v)
    return cfg


@pytest.mark.slow
def test_diamond_smoke():
    r = srl.Runner("Grid-layer", _small(), num_envs=8, seed=1)
    r.train(max_steps=600, train_steps_per_chunk=1, progress=False)
    assert int(r.algo_state.train_count) > 0
    rewards = r.evaluate(4)
    assert np.isfinite(rewards).all()


def test_diamond_rejects_non_image():
    with pytest.raises(AssertionError):
        srl.Runner("Grid", _small(), num_envs=4, seed=1)


@pytest.mark.slow
def test_diamond_sampler_and_imagine():
    cfg = _small()
    r = srl.Runner("Grid-layer", cfg, num_envs=4, seed=3)
    r.train(max_steps=200, train_steps_per_chunk=1, progress=False)
    C = cfg.denoiser_cfg.num_steps_conditioning
    h, w = cfg.img_shape
    recent_obs = jnp.zeros((C, h, w, cfg.img_ch))
    recent_act = jnp.zeros((C,), jnp.int32)
    frames, rew, done = jax.jit(cfg.imagine_next_frames)(
        r.algo_state, recent_obs, recent_act, jax.random.PRNGKey(0))
    assert frames.shape == (cfg.A, h, w, cfg.img_ch)
    assert np.isfinite(np.asarray(frames)).all()
    assert rew.shape == (cfg.A,) and done.shape == (cfg.A,)
    assert ((np.asarray(done) >= 0) & (np.asarray(done) <= 1)).all()
    img = DiamondConfig.decode_img(frames[0])
    assert img.dtype == np.uint8


@pytest.mark.slow
def test_diamond_heun_order2():
    cfg = _small()
    cfg.sampler_cfg.order = 2
    cfg.sampler_cfg.s_churn = 1.0
    r = srl.Runner("Grid-layer", cfg, num_envs=4, seed=2)
    r.train(max_steps=200, train_steps_per_chunk=1, progress=False)
    assert int(r.algo_state.train_count) > 0


@pytest.mark.slow
def test_diamond_train_flags():
    cfg = _small(train_diffusion=False, train_actor_critic=False)
    r = srl.Runner("Grid-layer", cfg, num_envs=4, seed=4)
    r.train(max_steps=200, train_steps_per_chunk=1, progress=False)
    assert int(r.algo_state.train_count) > 0


@pytest.mark.slow
def test_diamond_save_load(tmp_path):
    cfg = _small()
    r = srl.Runner("Grid-layer", cfg, num_envs=4, seed=5)
    r.train(max_steps=200, train_steps_per_chunk=1, progress=False)
    p = str(tmp_path / "diamond.pkl")
    r.save_parameter(p)
    r2 = srl.Runner("Grid-layer", _small(), num_envs=4, seed=6)
    r2.load_parameter(p)
    a = jax.tree_util.tree_leaves(cfg.params_of(r.algo_state))
    b = jax.tree_util.tree_leaves(r2.algo.params_of(r2.algo_state))
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))
