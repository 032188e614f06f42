"""Grid-layer (image-observation Grid) baseline — StochasticMuZero, bar 0.4
(the reference's own bar, base_stochastic_muzero.py:54-58). Recipe from
tests/test_muzero.py::test_stochastic_muzero_grid_layer_baseline (measured
0.61 @10k trains)."""

import simple_distributed_rl_tpu as srl
from simple_distributed_rl_tpu.algorithms import StochasticMuZeroConfig


def main_stochastic_muzero():
    cfg = StochasticMuZeroConfig(
        num_simulations=10, batch_size=16, unroll_steps=2, num_codes=4,
        discount=0.9, lr=1e-3, v_min=-2.0, v_max=2.0, capacity=20_000,
        warmup_size=100,
    )
    r = srl.Runner("Grid-layer", cfg, num_envs=32, seed=1)
    r.train(max_train_count=10_000, max_steps=2_000_000, train_steps_per_chunk=16)
    rewards = r.evaluate(200)
    ok = float(rewards[0]) >= 0.4
    print(f"[StochasticMuZero] {float(rewards[0]):.2f} {'PASS' if ok else 'FAIL'} (bar 0.4)")
    return ok


if __name__ == "__main__":
    main_stochastic_muzero()
