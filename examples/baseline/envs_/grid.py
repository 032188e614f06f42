"""Grid baselines — bar: mean eval reward >= 0.65 (optimal ~0.73).

Tuned recipes matching tests/test_algorithms.py, test_algorithms_zoo.py,
test_exploration_algos.py, test_model_based.py, test_go_explore.py,
test_go_dqn.py, test_godq_v1.py (the slow-tier baseline tests).
Reference layout: examples/baseline/envs_/grid.py."""

import numpy as np

import simple_distributed_rl_tpu as srl
from simple_distributed_rl_tpu.algorithms import (
    C51Config,
    DQNConfig,
    DynaQConfig,
    GoDQNConfig,
    GoDQv1Config,
    QLAgent57Config,
    QLConfig,
    RainbowConfig,
    SearchDynaQConfig,
    SNDConfig,
    VanillaPolicyConfig,
    make,
)


def _finish(r, episodes=300):
    ok = r.evaluate_compare_to_baseline_single_player(episodes=episodes)
    print(f"[{r.algo.get_name()}] baseline {'PASS' if ok else 'FAIL'}")
    return ok


def main_ql():
    r = srl.Runner("Grid", QLConfig(), num_envs=256, seed=1)
    r.train(max_steps=1_000_000)
    return _finish(r, 500)


def main_dqn():
    # lr 2e-3: the Huber loss halves the small-error gradient vs MSE
    cfg = DQNConfig(lr=2e-3, discount=0.9, epsilon=0.2, batch_size=64,
                    target_model_update_interval=500)
    cfg.memory.capacity = 50_000
    cfg.memory.warmup_size = 1000
    r = srl.Runner("Grid", cfg, num_envs=128, seed=3)
    r.train(max_steps=1_000_000, train_steps_per_chunk=128)
    return _finish(r, 500)


def main_c51():
    cfg = C51Config()
    cfg.memory.capacity = 20_000
    cfg.memory.warmup_size = 500
    cfg.epsilon_scheduler.set_linear(1.0, 0.1, 1000)
    r = srl.Runner("Grid", cfg, num_envs=128, seed=3)
    r.train(max_steps=400_000, train_steps_per_chunk=64)
    return _finish(r)


def main_rainbow():
    cfg = RainbowConfig(discount=0.9, multisteps=3)
    cfg.memory.capacity = 20_000
    cfg.memory.warmup_size = 500
    r = srl.Runner("Grid", cfg, num_envs=128, seed=3)
    r.train(max_steps=400_000, train_steps_per_chunk=64)
    return _finish(r)


def main_vanilla_policy():
    r = srl.Runner("Grid", VanillaPolicyConfig(), num_envs=128, seed=3)
    r.train(max_steps=1_000_000)
    return _finish(r)


def main_dynaq():
    r = srl.Runner("Grid", DynaQConfig(), num_envs=64, seed=1)
    r.train(max_steps=200_000)
    return _finish(r)


def main_search_dynaq():
    r = srl.Runner("Grid", SearchDynaQConfig(), num_envs=64, seed=1)
    r.train(max_steps=100_000, train_steps_per_chunk=1)
    return _finish(r)


def main_go_explore():
    cfg = make("Go-Explore", discount=0.9, memory_warmup_size=500, epsilon=0.1,
               lr=1e-3, batch_size=64, target_model_update_interval=500)
    cfg.memory_capacity = 50_000
    r = srl.Runner("Grid", cfg, num_envs=64, seed=1)
    r.train(max_steps=300_000, train_steps_per_chunk=64)
    return _finish(r)


def main_go_dqn():
    cfg = GoDQNConfig(discount=0.9, memory_warmup_size=500, epsilon=0.1, lr=1e-3,
                      batch_size=64, target_model_update_interval=500, go_rate=0.5)
    r = srl.Runner("Grid", cfg, num_envs=64, seed=1)
    r.train(max_steps=500_000, train_steps_per_chunk=64)
    return _finish(r)


def main_godq_v1():
    cfg = GoDQv1Config(base_units=64, batch_size=64, lr=1e-3, discount=0.9,
                       memory_warmup_size=500, reset_net_interval=0, epsilon=0.1)
    r = srl.Runner("Grid", cfg, num_envs=32, seed=1)
    r.train(max_steps=200_000, train_steps_per_chunk=32)
    return _finish(r, 500)


def main_godq_v1_archive():
    # the reference's second parametrization: BYOL feat + go-explore archive
    cfg = GoDQv1Config(base_units=64, batch_size=32, lr=5e-4, discount=0.9,
                       memory_warmup_size=500, reset_net_interval=0, epsilon=0.05,
                       align_loss_coeff=0.1, feat_type="BYOL", enable_archive=True)
    r = srl.Runner("Grid", cfg, num_envs=32, seed=1)
    r.train(max_steps=200_000, train_steps_per_chunk=32)
    return _finish(r, 500)


def main_snd():
    cfg = SNDConfig(discount=0.9, epsilon=0.2, batch_size=64,
                    target_model_update_interval=500, int_reward_scale=0.0, lr=1e-3)
    cfg.memory.capacity = 50_000
    cfg.memory.warmup_size = 1000
    r = srl.Runner("Grid", cfg, num_envs=128, seed=3)
    r.train(max_steps=1_000_000, train_steps_per_chunk=128)
    return _finish(r)


def main_ql_agent57():
    r = srl.Runner("Grid", QLAgent57Config(), num_envs=128, seed=1)
    r.train(max_steps=600_000)
    return _finish(r)


if __name__ == "__main__":
    main_ql()
    main_dqn()
