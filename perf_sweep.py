"""Perf sweep on the real accelerator: env-steps/s for DQN/Grid across num_envs,
chunks_per_call, and train on/off. Dev tool, not the headline bench."""

import time

import jax


def measure(num_envs, chunk_steps, train_steps, chunks_per_call, algo_name="DQN", env_id="Grid"):
    import simple_distributed_rl_tpu as srl
    from simple_distributed_rl_tpu.algorithms import DQNConfig

    cfg = DQNConfig(hidden_sizes=(64, 64), batch_size=512, discount=0.9)
    cfg.memory.capacity = 262_144
    cfg.memory.warmup_size = 1_000
    runner = srl.Runner(env_id, cfg, num_envs=num_envs, seed=0)
    fn = runner.engine.build_chunk(
        chunk_steps, train_steps, training=True, chunks_per_call=chunks_per_call
    )
    carry = runner.carry
    for _ in range(2):
        carry, m = fn(carry)
    jax.block_until_ready(carry.env_steps)
    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        carry, m = fn(carry)
    jax.block_until_ready(carry.env_steps)
    dt = time.perf_counter() - t0
    steps = n * chunks_per_call * chunk_steps * num_envs
    return steps / dt


if __name__ == "__main__":
    import sys

    for num_envs in (4096, 8192, 16384, 32768):
        for cpc in (1, 8):
            for ts in (0, 64):
                sps = measure(num_envs, 64, ts, cpc)
                print(
                    f"envs={num_envs:6d} chunks/call={cpc} train={ts:3d}"
                    f" -> {sps/1e6:8.2f}M steps/s",
                    flush=True,
                )
