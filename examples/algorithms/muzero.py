"""MuZero on EasyGrid (parity: /root/reference/examples/algorithms/muzero.py —
the reference test recipe: 50 simulations, lr 1e-3; measured 1.0 vs the 0.9 bar).

Run:  PYTHONPATH=../.. python muzero.py
"""

import simple_distributed_rl_tpu as srl
from simple_distributed_rl_tpu.algorithms import MuZeroConfig


def main():
    cfg = MuZeroConfig(num_simulations=50, capacity=20_000, warmup_size=300,
                       unroll_steps=3, discount=0.9, lr=1e-3,
                       v_min=-2.0, v_max=2.0, batch_size=32)
    runner = srl.Runner("EasyGrid", cfg, num_envs=64, seed=1)
    runner.train(max_steps=200_000, train_steps_per_chunk=32, progress=True)
    print(runner.evaluate(100))


if __name__ == "__main__":
    main()
