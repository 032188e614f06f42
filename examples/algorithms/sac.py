"""SAC on Pendulum (parity: /root/reference/examples/algorithms/sac.py —
reference recipe scale; measured -151.6 vs the -500 bar).

Run:  PYTHONPATH=../.. python sac.py
"""

import simple_distributed_rl_tpu as srl
from simple_distributed_rl_tpu.algorithms import SACConfig


def main():
    cfg = SACConfig(lr_policy=3e-3, lr_q=3e-3)
    cfg.memory.capacity = 50_000
    cfg.memory.warmup_size = 1000
    runner = srl.Runner("Pendulum-v1", cfg, num_envs=64, seed=1)
    runner.train(max_steps=300_000, progress=True)
    print(runner.evaluate(20))


if __name__ == "__main__":
    main()
