"""Scaling-efficiency harness (BASELINE.json: >=80% efficiency at 2+ hosts).

Measures data-parallel DQN training throughput (env-steps/s) over growing device
meshes and reports efficiency vs linear scaling from the 1-device run.

Single process (scales over local/global chips):

    python scaling_bench.py

Multi-host (run ONE command per host; efficiency is printed by process 0):

    python scaling_bench.py --coordinator host0:1234 --num-processes N --process-id i

On machines without multiple accelerators, `--virtual 8` simulates an 8-device CPU
mesh (XLA_FLAGS must not already pin the device count). Note virtual-CPU numbers
measure orchestration overhead only, not real ICI/DCN scaling.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", default=None, help="host0:port for multi-host")
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--virtual", type=int, default=0, help="simulate N CPU devices")
    ap.add_argument("--env", default="Grid")
    ap.add_argument("--envs-per-device", type=int, default=512)
    ap.add_argument("--chunk-steps", type=int, default=64)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--out", default=None, help="write JSON results here")
    args = ap.parse_args()

    if args.virtual:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.virtual}"
        ).strip()
    import jax

    if args.virtual:
        jax.config.update("jax_platforms", "cpu")
    if args.coordinator:
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )

    import simple_distributed_rl_tpu as srl
    from simple_distributed_rl_tpu.algorithms import DQNConfig
    from simple_distributed_rl_tpu.parallel import DataParallelEngine, make_mesh

    n_total = len(jax.devices())
    is_main = jax.process_index() == 0
    # mesh sizes: 1, 2, 4, ... n_total (multi-host runs must use the full mesh — every
    # process participates — so only n_total is measured there)
    if jax.process_count() > 1:
        sizes = [n_total]
    else:
        sizes = sorted({2**i for i in range(n_total.bit_length()) if 2**i <= n_total} | {n_total})

    results = []
    for n in sizes:
        env = srl.make_env(args.env)
        cfg = DQNConfig(hidden_sizes=(64, 64), batch_size=64)
        cfg.memory.capacity = 10_000
        cfg.memory.warmup_size = 256
        cfg.setup(env)
        dp = DataParallelEngine(env, cfg, args.envs_per_device, mesh=make_mesh(n))
        carry = dp.init(jax.random.PRNGKey(0))
        chunk = dp.build_chunk(args.chunk_steps)
        carry, _ = chunk(carry)  # compile
        jax.block_until_ready(jax.tree.leaves(carry.algo_state)[0])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            carry, _ = chunk(carry)
        jax.block_until_ready(jax.tree.leaves(carry.algo_state)[0])
        dt = time.perf_counter() - t0
        steps = args.iters * args.chunk_steps * args.envs_per_device * n
        sps = steps / dt
        results.append({"devices": n, "steps_per_s": sps})
        if is_main:
            base = results[0]["steps_per_s"]
            eff = sps / (base * n / results[0]["devices"])
            results[-1]["efficiency_vs_1dev"] = eff
            print(json.dumps({"devices": n, "env": args.env,
                              "steps_per_s": round(sps), "efficiency": round(eff, 3)}),
                  flush=True)

    if is_main and args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
