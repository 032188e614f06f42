"""CartPole-v1 baselines — bar: mean eval reward >= 400 (the gym baseline the
reference asserts). Recipes from bench.py's CartPole workload and
tests/test_algorithms_zoo.py::test_ppo_cartpole_learning.
Reference layout: examples/baseline/gym/classic_control/cart_pole.py."""

import numpy as np

import simple_distributed_rl_tpu as srl
from simple_distributed_rl_tpu.algorithms import DQNConfig, PPOConfig


def main_dqn():
    cfg = DQNConfig(hidden_sizes=(64, 64), batch_size=512, discount=0.9)
    cfg.memory.capacity = 262_144
    cfg.memory.warmup_size = 1_000
    r = srl.Runner("CartPole-v1", cfg, num_envs=8192, seed=1)
    r.train(max_steps=8_000_000, chunk_steps=64, train_steps_per_chunk=64)
    ok = r.evaluate_compare_to_baseline_single_player()
    print(f"[DQN] baseline {'PASS' if ok else 'FAIL'}")
    return ok


def main_ppo():
    cfg = PPOConfig(entropy_coef=0.01)
    r = srl.Runner("CartPole-v1", cfg, num_envs=256, seed=3)
    r.train(max_steps=1_500_000, chunk_steps=64)
    rewards = r.evaluate(64)
    ok = float(rewards[0]) >= 150.0
    print(f"[PPO] {float(np.asarray(rewards)[0]):.0f} {'PASS' if ok else 'FAIL'} (bar 150)")
    return ok


if __name__ == "__main__":
    main_dqn()
    main_ppo()
