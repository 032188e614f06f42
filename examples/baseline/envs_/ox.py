"""OX (tic-tac-toe) baseline — AlphaZero as player 0 vs the random player,
bar: mean first-player reward >= 0.8 over 200 episodes (reference:
examples/baseline/envs_/ox.py + base_alphazero.py). Recipe from
tests/test_alphazero.py::test_az_ox_beats_random."""

import numpy as np

import simple_distributed_rl_tpu as srl
from simple_distributed_rl_tpu.algorithms import AlphaZeroConfig


def main_alphazero():
    cfg = AlphaZeroConfig(num_simulations=24, capacity=20_000, warmup_size=500,
                          sampling_steps=4, lr=1e-3)
    r = srl.Runner("OX", cfg, num_envs=64, seed=1, players=[None, "random"])
    r.train(max_steps=80_000, train_steps_per_chunk=64)
    rewards = r.evaluate(200, players=[None, "random"])
    ok = float(rewards[0]) >= 0.8
    print(f"[AlphaZero] OX vs random: {float(rewards[0]):.2f} "
          f"{'PASS' if ok else 'FAIL'} (bar 0.8)")
    # both seats (parity: evaluate_compare_to_baseline_multiplayer)
    print("multiplayer baseline:", r.evaluate_compare_to_baseline_multiplayer())
    return ok


if __name__ == "__main__":
    main_alphazero()
