"""EasyGrid baselines — bar: mean eval reward >= 0.9 (deterministic 4-cell grid).

Recipes from tests/test_algorithms.py, test_algorithms_zoo.py (PPO_V via
curve_parity.py), test_muzero.py, test_efficient_zero_v2.py, test_diamond.py."""

import simple_distributed_rl_tpu as srl
from simple_distributed_rl_tpu.algorithms import (
    EfficientZeroV2Config,
    MuZeroConfig,
    PPOVConfig,
    QLConfig,
    make,
)


def _finish(r, episodes=100):
    ok = r.evaluate_compare_to_baseline_single_player(episodes=episodes)
    print(f"[{r.algo.get_name()}] baseline {'PASS' if ok else 'FAIL'}")
    return ok


def main_ql():
    r = srl.Runner("EasyGrid", QLConfig(), num_envs=128, seed=1)
    r.train(max_steps=200_000)
    return _finish(r)


def main_ppo_v():
    # the curve-parity recipe (curve_parity.py PPO_V row: parity with the
    # reference band at 2k and 5k cumulative updates)
    cfg = PPOVConfig(batch_size=64, discount=0.9, hidden_sizes=(64, 64))
    r = srl.Runner("EasyGrid", cfg, num_envs=64, seed=1)
    r.train(max_train_count=5_000, max_steps=2_000_000, chunk_steps=16,
            train_steps_per_chunk=64)
    return _finish(r)


def main_muzero():
    cfg = MuZeroConfig(num_simulations=50, capacity=20_000, warmup_size=300,
                       unroll_steps=3, discount=0.9, lr=1e-3,
                       v_min=-2.0, v_max=2.0, batch_size=32)
    r = srl.Runner("EasyGrid", cfg, num_envs=64, seed=1)
    r.train(max_steps=200_000, train_steps_per_chunk=32)
    return _finish(r)


def main_efficient_zero_v2():
    cfg = EfficientZeroV2Config(
        num_simulations=20, num_top_actions=4, unroll_steps=2, batch_size=32,
        warmup_size=100, latent_dim=32, lstm_units=32, value_bins=41,
        v_min=-3.0, v_max=3.0, discount=0.9, lr=1e-3,
        policy_tau_points=((20_000, 1.0), (40_000, 0.5)),
    )
    r = srl.Runner("EasyGrid", cfg, num_envs=16, seed=1)
    r.train(max_steps=150_000, train_steps_per_chunk=16)
    return _finish(r)


def main_diamond():
    """The reference's staged DIAMOND recipe (base_diamond.py:53-77): random
    rollout -> diffusion-only -> reward/end-only -> actor-critic in the dreamed
    env. ~9 min on one TPU chip; ~1 h on an idle 2-core CPU."""
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
    r.train_only(max_train_count=10_000, train_steps_per_call=500)
    cfg.train_diffusion, cfg.train_reward_end = False, True
    cfg.batch_size = 32
    r.train_only(max_train_count=2_000, train_steps_per_call=200)
    cfg.train_actor_critic = True
    cfg.batch_size = 8
    r.train(max_train_count=5_000, train_steps_per_chunk=8)
    rewards = r.evaluate(100, on_incomplete="ignore")
    print(f"[DIAMOND] eval {float(rewards[0]):.2f} (bar 0.9)")
    return float(rewards[0]) >= 0.9


if __name__ == "__main__":
    main_ql()
    main_ppo_v()
