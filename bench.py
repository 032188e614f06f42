"""Headline benchmark: DQN actor-learner on vectorized Grid — env-steps/s per chip.

Runs the full jitted rollout+train chunk (B lockstep envs x T steps, then K learner
updates on device replay) on whatever accelerator is available and prints ONE json
line. Baseline (BASELINE.md): 1M env-steps/s per host.
"""

import json
import time

import jax


def main():
    import simple_distributed_rl_tpu as srl
    from simple_distributed_rl_tpu.algorithms import DQNConfig

    num_envs = 8192
    chunk_steps = 64
    train_steps = 64
    warm_chunks = 3
    bench_chunks = 20

    cfg = DQNConfig(hidden_sizes=(64, 64), batch_size=512, discount=0.9)
    cfg.memory.capacity = 262_144
    cfg.memory.warmup_size = 1_000
    runner = srl.Runner("Grid", cfg, num_envs=num_envs, seed=0)
    chunk_fn = runner.engine.build_chunk(chunk_steps, train_steps, training=True)

    carry = runner.carry
    for _ in range(warm_chunks):
        carry, m = chunk_fn(carry)
    jax.block_until_ready(carry.env_steps)

    t0 = time.perf_counter()
    for _ in range(bench_chunks):
        carry, m = chunk_fn(carry)
    jax.block_until_ready(carry.env_steps)
    dt = time.perf_counter() - t0

    steps = bench_chunks * chunk_steps * num_envs
    sps = steps / dt
    baseline = 1_000_000.0  # env-steps/s per host (BASELINE.md driver target)
    print(
        json.dumps(
            {
                "metric": "dqn_grid_env_steps_per_sec",
                "value": round(sps, 1),
                "unit": "env-steps/s",
                "vs_baseline": round(sps / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
