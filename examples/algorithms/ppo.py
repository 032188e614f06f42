"""PPO on Grid, discrete + continuous variants (parity:
/root/reference/examples/algorithms/ppo.py).

Run:  PYTHONPATH=../.. python ppo.py
"""

import simple_distributed_rl_tpu as srl
from simple_distributed_rl_tpu.algorithms import PPOConfig


def main():
    runner = srl.Runner("Grid", PPOConfig(), num_envs=128, seed=1)
    runner.train(max_steps=400_000, progress=True)
    print(runner.evaluate(100))  # Grid baseline 0.65

    # continuous: the same config on a Box action space switches to the
    # gaussian policy automatically
    runner = srl.Runner("Pendulum-v1", PPOConfig(), num_envs=128, seed=1)
    runner.train(max_steps=400_000, progress=True)
    print(runner.evaluate(20))


if __name__ == "__main__":
    main()
