"""Headline benchmark: DQN actor-learner on vectorized Grid — env-steps/s per chip.

Runs the full jitted rollout+train chunk (B lockstep envs x T steps, then K learner
updates on device replay) on whatever accelerator is available and prints ONE json
line (the Grid headline). Baseline (BASELINE.md): 1M env-steps/s per host, named on
both Grid and CartPole — the CartPole workload plus a chunks_per_call amortization
variant are measured too and written to BENCH_DETAILS.json alongside.
"""

import json
import time

import jax


def bench_workload(env_id, cfg, num_envs, chunk_steps, train_steps,
                   warm_chunks=3, bench_chunks=20, chunks_per_call=1):
    import simple_distributed_rl_tpu as srl

    runner = srl.Runner(env_id, cfg, num_envs=num_envs, seed=0)
    chunk_fn = runner.engine.build_chunk(
        chunk_steps, train_steps, training=True, chunks_per_call=chunks_per_call)

    carry = runner.carry
    t_c0 = time.perf_counter()
    for _ in range(warm_chunks):
        carry, m = chunk_fn(carry)
    jax.block_until_ready(carry.env_steps)
    compile_s = time.perf_counter() - t_c0

    t0 = time.perf_counter()
    for _ in range(bench_chunks):
        carry, m = chunk_fn(carry)
    jax.block_until_ready(carry.env_steps)
    dt = time.perf_counter() - t0

    steps = bench_chunks * chunk_steps * num_envs * chunks_per_call
    return {
        "env": env_id,
        "num_envs": num_envs,
        "chunk_steps": chunk_steps,
        "train_steps_per_chunk": train_steps,
        "chunks_per_call": chunks_per_call,
        "env_steps_per_sec": round(steps / dt, 1),
        "train_updates_per_sec": round(
            bench_chunks * train_steps * chunks_per_call / dt, 1),
        "warmup_and_compile_s": round(compile_s, 1),
    }


def main():
    from simple_distributed_rl_tpu.algorithms import DQNConfig

    baseline = 1_000_000.0  # env-steps/s per host (BASELINE.md driver target)
    on_tpu = jax.devices()[0].platform == "tpu"
    details = {"platform": jax.devices()[0].platform,
               "device": str(jax.devices()[0]), "workloads": []}

    def dqn_cfg():
        cfg = DQNConfig(hidden_sizes=(64, 64), batch_size=512, discount=0.9)
        cfg.memory.capacity = 262_144
        cfg.memory.warmup_size = 1_000
        return cfg

    # headline: Grid (the round-1 configuration, unchanged schema)
    grid = bench_workload("Grid", dqn_cfg(), num_envs=8192, chunk_steps=64,
                          train_steps=64)
    details["workloads"].append(grid)

    # BASELINE names "Grid/CartPole": same recipe on continuous-obs CartPole
    cart = bench_workload("CartPole-v1", dqn_cfg(), num_envs=8192, chunk_steps=64,
                          train_steps=64)
    details["workloads"].append(cart)

    # chunks_per_call amortization variant (CPU/TPU; the axon remote compiler
    # handles >1 pathologically on some program shapes — keep it last so the
    # headline numbers are already recorded if it stalls)
    if not on_tpu:
        grid4 = bench_workload("Grid", dqn_cfg(), num_envs=8192, chunk_steps=64,
                               train_steps=64, bench_chunks=5, chunks_per_call=4)
        details["workloads"].append(grid4)

    sps = grid["env_steps_per_sec"]
    details["headline"] = {
        "metric": "dqn_grid_env_steps_per_sec",
        "value": sps,
        "unit": "env-steps/s",
        "vs_baseline": round(sps / baseline, 3),
    }
    with open("BENCH_DETAILS.json", "w") as f:
        json.dump(details, f, indent=1)
    print(json.dumps(details["headline"]))


if __name__ == "__main__":
    main()
