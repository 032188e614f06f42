"""Offline workflow: rollout -> save memory -> train_only (parity: the
reference's trainer-only mode, srl/runner/runner.py:254 + its
rollout/train_only examples; also the shape of DIAMOND's staged recipe,
tests/algorithms_/base_diamond.py:53-77)."""

import jax

jax.config.update("jax_platforms", "cpu")

import simple_distributed_rl_tpu as srl
from simple_distributed_rl_tpu.algorithms import DQNConfig


def main():
    cfg = DQNConfig(lr=1e-3, discount=0.9, epsilon=1.0, batch_size=128,
                    target_model_update_interval=500)
    cfg.memory.capacity = 100_000
    cfg.memory.warmup_size = 200

    # 1) collect experience with a (here: fully random) behavior policy
    collector = srl.Runner("Grid", cfg, num_envs=128, seed=1)
    collector.rollout(max_memory=100_000)
    collector.save_memory("/tmp/grid_memory.pkl.xz")

    # 2) train a fresh agent purely offline from the saved replay
    learner = srl.Runner("Grid", cfg, num_envs=128, seed=2)
    learner.load_memory("/tmp/grid_memory.pkl.xz")
    learner.train_only(max_train_count=10_000, train_steps_per_call=512)

    ok = learner.evaluate_compare_to_baseline_single_player(episodes=500)
    print("beats Grid 0.65 baseline:", ok)


if __name__ == "__main__":
    main()
