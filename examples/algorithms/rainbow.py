"""Rainbow on Pendulum (parity: /root/reference/examples/algorithms/rainbow.py).

Run:  PYTHONPATH=../.. python rainbow.py
"""

import simple_distributed_rl_tpu as srl
from simple_distributed_rl_tpu.algorithms import RainbowConfig


def main():
    cfg = RainbowConfig(hidden_sizes=(64, 64), multisteps=3)
    cfg.memory.capacity = 100_000
    cfg.memory.warmup_size = 1000
    cfg.memory.set_proportional()

    runner = srl.Runner("Pendulum-v1", cfg, num_envs=64, seed=1)
    runner.train(max_train_count=14_000, progress=True)
    print(runner.evaluate(20))


if __name__ == "__main__":
    main()
