"""Tabular QL on Grid (parity: /root/reference/examples/algorithms/ql.py — the
exact-parity algorithm: trajectories and Q tables match the reference bit-for-bit
under a fixed seed, see tests/test_reference_parity.py).

Run:  PYTHONPATH=../.. python ql.py
"""

import simple_distributed_rl_tpu as srl
from simple_distributed_rl_tpu.algorithms import QLConfig


def main():
    runner = srl.Runner("Grid", QLConfig(), num_envs=256, seed=1)
    runner.train(max_train_count=100_000, progress=True)
    print(runner.evaluate(100))  # baseline 0.65, optimal ~0.73


if __name__ == "__main__":
    main()
