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


@pytest.mark.slow
def test_diamond_easygrid_staged_baseline():
    """EasyGrid >= 0.9 via the reference's staged recipe (base_diamond.py:53-77):
    random rollout to 10k windows -> diffusion-only train_only -> reward/end-only
    train_only -> actor-critic train. Two round-3 changes made this reach the bar
    (measured 1.0): the reward/end model at the reference's small-params scale
    (config.py:115-122 — the unit-test-sized one had 0% accuracy on the 1%-
    positive reward class) and sampled (not argmax) eval actions like the
    reference worker (worker.py:43). Runtime ~9 min on TPU, ~1 h on idle CPU
    (the diffusion stage dominates)."""
    from simple_distributed_rl_tpu.algorithms import make
    from simple_distributed_rl_tpu.algorithms.diamond import RewardEndModelConfig

    cfg = make("DIAMOND").set_small_params()
    cfg.reward_end_cfg = RewardEndModelConfig(
        lstm_dim=32, condition_channels=32, channels_list=(16, 16),
        res_block_num_list=(2, 2), use_attention_list=(False, False))
    cfg.capacity = 12_000
    cfg.warmup_size = 50
    r = srl.Runner("EasyGrid-layer", cfg, num_envs=16, seed=1)

    cfg.train_diffusion = cfg.train_reward_end = cfg.train_actor_critic = False
    r.rollout(max_memory=10_000)

    cfg.train_diffusion = True
    r.train_only(max_train_count=10_000, train_steps_per_call=500, progress=False)

    cfg.train_diffusion = False
    cfg.train_reward_end = True
    cfg.batch_size = 32
    r.train_only(max_train_count=2_000, train_steps_per_call=200, progress=False)

    cfg.train_actor_critic = True
    cfg.batch_size = 8
    r.train(max_train_count=5_000, train_steps_per_chunk=8, progress=False)

    rewards = r.evaluate(100, on_incomplete="ignore")
    assert float(rewards[0]) >= 0.9


@pytest.mark.slow
def test_diamond_remat_imagination_identical():
    """remat_imagination (jax.checkpoint over the imagination scan body) must be
    numerically identical to the unremated path — it only changes what the
    backward pass stores vs recomputes. This is what lets the reference-default
    Atari scale backprop through imagination on one 16 GB chip (MXU_r05.json
    diamond_atari_default_f32_ac_remat)."""
    outs = {}
    for remat in (False, True):
        cfg = _small(capacity=64, warmup_size=4, remat_imagination=remat)
        r = srl.Runner("Grid-layer", cfg, num_envs=4, seed=3)
        r.train(max_steps=4 * cfg.required_chunk_steps * 3,
                chunk_steps=cfg.required_chunk_steps,
                train_steps_per_chunk=1, progress=False)
        outs[remat] = jax.tree.map(np.asarray, r.algo.params_of(r.algo_state))
    for a, b in zip(jax.tree.leaves(outs[False]), jax.tree.leaves(outs[True])):
        np.testing.assert_allclose(a, b, atol=1e-5)
