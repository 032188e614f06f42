"""DQN on Pendulum (parity: /root/reference/examples/algorithms/dqn.py — the
classic-control shrink of the Atari recipe).

Run:  PYTHONPATH=../.. python dqn.py
"""

import simple_distributed_rl_tpu as srl
from simple_distributed_rl_tpu.algorithms import DQNConfig


def main():
    cfg = DQNConfig(hidden_sizes=(64, 64), lr=1e-3,
                    target_model_update_interval=1000)
    cfg.memory.capacity = 100_000
    cfg.memory.warmup_size = 1000
    cfg.epsilon_scheduler.set_constant(0.1)

    runner = srl.Runner("Pendulum-v1", cfg, num_envs=64, seed=1)
    runner.train(max_train_count=20_000, progress=True)
    print(runner.evaluate(20))  # reference bar: >= -500


if __name__ == "__main__":
    main()
