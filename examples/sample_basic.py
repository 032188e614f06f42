"""Minimal train + evaluate (parity: /root/reference/examples/sample_basic.py).

Run:  PYTHONPATH=. python examples/sample_basic.py
"""

import simple_distributed_rl_tpu as srl
from simple_distributed_rl_tpu.algorithms import QLConfig


def main():
    # create Runner: env id + algorithm config (+ how many vectorized env
    # instances to step in lockstep on the accelerator)
    runner = srl.Runner("Grid", QLConfig(), num_envs=256, seed=1)

    # train
    runner.train(timeout=10)

    # evaluate
    rewards = runner.evaluate(100)
    print(f"evaluate episodes (per-player mean): {rewards}")


if __name__ == "__main__":
    main()
