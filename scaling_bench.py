"""Scaling-efficiency harness (BASELINE.json: >=80% efficiency at 2+ hosts).

Measures data-parallel DQN training throughput (env-steps/s) over growing device
meshes and reports efficiency vs linear scaling from the 1-device run, plus a
per-chunk overhead decomposition:

  wall_free_s        per-chunk wall with the device queue kept full (headline)
  rollout_only_s     same chunk with train_steps=0 (no learner, no pmean)
  learner_s          wall_free_s - rollout_only_s  (K learner updates + gradient
                     pmean; at fixed per-device batch the matmuls are identical
                     across mesh sizes, so growth vs the 1-device learner time
                     is the collective + orchestration cost)
  host_sync_s        extra wall per chunk when every call does a full-carry
                     device_get sync (the cost a host-side callback boundary
                     would pay; the engine's free-running loop does NOT pay it)
  readback_s         one total_env_steps() host metric read

Single process (scales over local/global chips):

    python scaling_bench.py [--sizes 1,2,4,8] [--out x.json]

Multi-host (run ONE command per host; process 0 writes/prints results; only the
full global mesh is measured because every process must participate):

    python scaling_bench.py --coordinator host0:1234 --num-processes N --process-id i

On machines without multiple accelerators, `--virtual N` simulates an N-device CPU
mesh (XLA_FLAGS must not already pin the device count). Virtual-CPU numbers
measure orchestration/collective overhead only — all "devices" share the host's
cores, so compute does NOT scale; use fixed per-device env counts (weak scaling)
and read efficiency as "fraction of the aggregate rate linear scaling predicts
given shared cores" (see make_scaling_artifact.py for the assembled story).
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
    ap.add_argument("--train-steps", type=int, default=64)
    ap.add_argument("--iters", type=int, default=0, help="0 = auto (~6s per mode)")
    ap.add_argument("--sizes", default=None, help="comma list of mesh sizes to run")
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
    elif args.sizes:
        sizes = [int(s) for s in args.sizes.split(",")]
    else:
        sizes = sorted({2**i for i in range(n_total.bit_length()) if 2**i <= n_total} | {n_total})

    def sync(tree):
        jax.device_get(jax.tree.map(lambda x: x.ravel()[:1], jax.tree.leaves(tree)[:1]))

    def full_sync(tree):
        jax.device_get(jax.tree.map(lambda x: x.ravel()[:1], tree))

    results = []
    for n in sizes:
        env = srl.make_env(args.env)
        cfg = DQNConfig(hidden_sizes=(64, 64), batch_size=64)
        cfg.memory.capacity = 10_000
        cfg.memory.warmup_size = 256
        cfg.setup(env)
        dp = DataParallelEngine(env, cfg, args.envs_per_device, mesh=make_mesh(n))
        carry = dp.init(jax.random.PRNGKey(0))
        chunk = dp.build_chunk(args.chunk_steps, args.train_steps)
        chunk0 = dp.build_chunk(args.chunk_steps, 0)
        carry, _ = chunk(carry)  # compile
        c0, _ = chunk0(carry)
        full_sync((carry, c0))
        del c0

        iters = args.iters
        if not iters:
            t0 = time.perf_counter()
            carry, _ = chunk(carry)
            full_sync(carry)
            per = max(time.perf_counter() - t0, 1e-4)
            iters = max(3, min(60, int(6.0 / per)))

        # mode 1: free-running (headline). On the CPU backend the engine itself
        # caps the in-flight queue at depth 1 (DataParallelEngine.build_chunk:
        # XLA CPU's in-process collective rendezvous wedges under deeper
        # queues), so this loop measures depth-1 walls there; on TPU it
        # measures the true free-running pipeline.
        depth1 = jax.default_backend() == "cpu" and n > 1
        t0 = time.perf_counter()
        for _ in range(iters):
            carry, m = chunk(carry)
        full_sync(carry)
        dt_free = (time.perf_counter() - t0) / iters

        # mode 2: per-call full-carry sync
        t0 = time.perf_counter()
        for _ in range(iters):
            carry, _ = chunk(carry)
            full_sync(carry)
        dt_sync = (time.perf_counter() - t0) / iters

        # mode 3: rollout only (train_steps=0 — no learner, no pmean)
        c = carry
        t0 = time.perf_counter()
        for _ in range(iters):
            c, _ = chunk0(c)
        full_sync(c)
        dt_roll = (time.perf_counter() - t0) / iters
        del c

        # host metric readback
        t0 = time.perf_counter()
        total = dp.total_env_steps(carry)
        dt_read = time.perf_counter() - t0
        assert total > 0

        steps = args.chunk_steps * args.envs_per_device * n
        sps = steps / dt_free
        row = {
            "devices": n,
            "processes": jax.process_count(),
            "envs_per_device": args.envs_per_device,
            "iters": iters,
            "steps_per_s": round(sps, 1),
            "queue_depth_1": bool(depth1),
            "per_chunk": {
                "wall_free_s": round(dt_free, 5),
                "rollout_only_s": round(dt_roll, 5),
                "learner_s": round(dt_free - dt_roll, 5),
                "host_sync_s": round(dt_sync - dt_free, 5),
                "readback_s": round(dt_read, 5),
            },
        }
        results.append(row)
        if is_main:
            base = results[0]
            eff = sps / (base["steps_per_s"] * n / base["devices"])
            row["efficiency_vs_first"] = round(eff, 3)
            print(json.dumps({"devices": n, "env": args.env,
                              "steps_per_s": round(sps), "efficiency": round(eff, 3),
                              "per_chunk": row["per_chunk"]}),
                  flush=True)

    if is_main and args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
