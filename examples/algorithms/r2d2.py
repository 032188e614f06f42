"""R2D2 on the Tiger POMDP (parity: /root/reference/examples/algorithms/r2d2.py
— the LSTM + burn-in sequence replay path; Tiger needs memory to beat 0.0).

Run:  PYTHONPATH=../.. python r2d2.py
"""

import simple_distributed_rl_tpu as srl
from simple_distributed_rl_tpu.algorithms import R2D2Config


def main():
    cfg = R2D2Config(burnin=5, sequence_length=10, lstm_units=64)
    runner = srl.Runner("Tiger", cfg, num_envs=64, seed=1)
    runner.train(max_steps=500_000, progress=True)
    print(runner.evaluate(200))  # baseline >= 0.0


if __name__ == "__main__":
    main()
