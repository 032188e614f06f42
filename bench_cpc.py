"""chunks_per_call amortization measurement (round-3 verdict weak #2: the >1 path
was gated off on TPU with no committed evidence either way).

Runs the Grid DQN headline workload at chunks_per_call 1 and 4 on the current
device and prints both rows. Kept separate from bench.py so a pathological remote
compile of the multi-chunk program cannot stall the driver's end-of-round bench —
run manually:  timeout 1200 python -u bench_cpc.py
"""

import json
import time

import jax


def run(chunks_per_call: int, bench_chunks: int):
    import simple_distributed_rl_tpu as srl
    from simple_distributed_rl_tpu.algorithms import DQNConfig

    cfg = DQNConfig(hidden_sizes=(64, 64), batch_size=512, discount=0.9)
    cfg.memory.capacity = 262_144
    cfg.memory.warmup_size = 1_000
    runner = srl.Runner("Grid", cfg, num_envs=8192, seed=0)
    fn = runner.engine.build_chunk(64, 64, training=True,
                                   chunks_per_call=chunks_per_call)

    def sync(c):
        jax.device_get(jax.tree.map(lambda x: x.ravel()[:1], c))

    carry = runner.carry
    t0 = time.perf_counter()
    for _ in range(2):
        carry, m = fn(carry)
    sync(carry)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(bench_chunks):
        carry, m = fn(carry)
    sync(carry)
    dt = time.perf_counter() - t0
    steps = bench_chunks * 64 * 8192 * chunks_per_call
    return {
        "chunks_per_call": chunks_per_call,
        "env_steps_per_sec": round(steps / dt, 1),
        "warmup_and_compile_s": round(compile_s, 1),
        "platform": jax.devices()[0].platform,
    }


if __name__ == "__main__":
    rows = [run(1, 20), run(4, 5)]
    speedup = rows[1]["env_steps_per_sec"] / rows[0]["env_steps_per_sec"]
    print(json.dumps({"rows": rows, "cpc4_speedup": round(speedup, 3)}, indent=1))
