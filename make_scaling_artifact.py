"""Assemble the scaling-efficiency artifact (SCALING_r{N}.json).

BASELINE.md row 2 demands ">=80% scaling efficiency at 2+ hosts". Real multi-chip /
multi-host TPU hardware is not reachable from this box (one v5e chip via a tunnel),
so this orchestrator captures every scaling measurement that IS runnable here and
labels exactly what each one does and does not show:

  real          1-chip TPU reference point (absolute env-steps/s; the unit the
                efficiency percentages multiply).
  virtual_weak  1/2/4/8-device virtual CPU mesh, fixed envs-per-device (weak
                scaling). All virtual devices share the host's cores, so ideal
                aggregate throughput is FLAT (compute-bound) — this leg isolates
                the framework's orchestration + collective overhead: efficiency
                here = aggregate_rate(n) / aggregate_rate(1), i.e. how much of
                the core-bound rate survives n-way mesh partitioning + pmean.
  mh_1proc      4 virtual devices, ONE process (the same-total-devices control).
  mh_2proc      4 virtual devices as 2 processes x 2 local devices over localhost
                GRPC (jax.distributed) — the closest measurable proxy for a
                2-host DCN deployment: same global mesh, same program, but the
                dp axis now crosses a process boundary and every collective
                rides the distributed runtime.

  dcn_proxy_efficiency = mh_2proc.steps_per_s / mh_1proc.steps_per_s
    maps onto the BASELINE ">=80% at 2+ hosts" target as follows: on real
    2-host TPU the per-device compute is private (cores are not shared), so the
    only efficiency loss is (a) cross-process collective latency and (b) host
    orchestration — exactly what this ratio measures. It is a lower bound on
    real-hardware efficiency for this workload because here the two processes
    ALSO contend for the same physical cores.

Usage:  python make_scaling_artifact.py [--round 5] [--quick]
Writes: SCALING_r{round}.json
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
PY = sys.executable
BENCH = os.path.join(REPO, "scaling_bench.py")


def _load_ctx():
    la = os.getloadavg()
    return {"loadavg_1m": round(la[0], 2), "loadavg_5m": round(la[1], 2),
            "cpus": os.cpu_count()}


def _run(args, timeout=1800, env_extra=None):
    env = dict(os.environ)
    env.setdefault("PYTHONPATH", REPO)
    if env_extra:
        env.update(env_extra)
    t0 = time.perf_counter()
    p = subprocess.run([PY, BENCH] + args, capture_output=True, text=True,
                       timeout=timeout, env=env, cwd=REPO)
    wall = round(time.perf_counter() - t0, 1)
    if p.returncode != 0:
        return {"error": (p.stderr or p.stdout)[-2000:], "wall_s": wall}
    return {"wall_s": wall}


def _leg(out_path, args, timeout=1800):
    info = _run(args + ["--out", out_path], timeout=timeout)
    if "error" in info:
        return info
    with open(out_path) as f:
        rows = json.load(f)
    info["rows"] = rows
    return info


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=5)
    ap.add_argument("--quick", action="store_true", help="smaller env counts")
    ap.add_argument("--skip-real", action="store_true")
    args = ap.parse_args()

    epd = "128" if args.quick else "512"
    common = ["--envs-per-device", epd]
    art = {"generated_by": "make_scaling_artifact.py",
           "host": _load_ctx(),
           "workload": {"env": "Grid", "algo": "DQN(64,64) batch=64",
                        "envs_per_device": int(epd), "chunk_steps": 64,
                        "train_steps_per_chunk": 64},
           "legs": {}}

    # --- leg 1: real single-chip TPU reference point -------------------------
    if not args.skip_real:
        print("[leg] real 1-chip ...", flush=True)
        art["legs"]["real"] = _leg("/tmp/scaling_real.json",
                                   ["--sizes", "1"] + common)
        print(json.dumps(art["legs"]["real"].get("rows", art["legs"]["real"])),
              flush=True)

    # --- leg 2: virtual CPU mesh weak scaling 1/2/4/8 ------------------------
    print("[leg] virtual 8-dev CPU mesh ...", flush=True)
    art["legs"]["virtual_weak"] = _leg(
        "/tmp/scaling_virtual.json", ["--virtual", "8"] + common)

    # --- leg 3: 1-process 4-device control -----------------------------------
    print("[leg] 1-proc 4-dev control ...", flush=True)
    art["legs"]["mh_1proc"] = _leg(
        "/tmp/scaling_mh1.json", ["--virtual", "4", "--sizes", "4"] + common)

    # --- leg 4: 2-process x 2-device localhost multihost ---------------------
    print("[leg] 2-proc x 2-dev localhost multihost ...", flush=True)
    # unique per run: re-binding the same coordinator port right after a prior
    # run can leave both processes blocked in jax.distributed.initialize
    port = 13000 + (os.getpid() % 20000)
    env = dict(os.environ)
    env.setdefault("PYTHONPATH", REPO)
    mh_args = ["--virtual", "2", "--coordinator", f"localhost:{port}",
               "--num-processes", "2"] + common
    t0 = time.perf_counter()
    p0 = subprocess.Popen(
        [PY, BENCH] + mh_args + ["--process-id", "0", "--out", "/tmp/scaling_mh2.json"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env, cwd=REPO)
    p1 = subprocess.Popen(
        [PY, BENCH] + mh_args + ["--process-id", "1"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env, cwd=REPO)
    try:
        out0, _ = p0.communicate(timeout=1800)
        out1, _ = p1.communicate(timeout=120)
    except subprocess.TimeoutExpired:
        p0.kill()
        p1.kill()
        out0 = out1 = "TIMEOUT"
    leg = {"wall_s": round(time.perf_counter() - t0, 1)}
    if p0.returncode == 0 and os.path.exists("/tmp/scaling_mh2.json"):
        with open("/tmp/scaling_mh2.json") as f:
            leg["rows"] = json.load(f)
    else:
        leg["error"] = (out0 or "")[-1500:] + "\n--- p1 ---\n" + (out1 or "")[-500:]
    art["legs"]["mh_2proc"] = leg

    # --- assemble efficiencies ----------------------------------------------
    summ = {}
    vw = art["legs"].get("virtual_weak", {}).get("rows")
    if vw:
        base = vw[0]["steps_per_s"]
        summ["virtual_weak_aggregate_ratio"] = {
            str(r["devices"]): round(r["steps_per_s"] / base, 3) for r in vw}
        summ["virtual_weak_note"] = (
            "all virtual devices share the host cores, so the compute-bound "
            "ideal aggregate rate is FLAT; aggregate_rate(n)/aggregate_rate(1) "
            "is the fraction of the core-bound rate that survives n-way mesh "
            "partitioning + pmean (orchestration survival, not hardware "
            "scaling). rows[].efficiency_vs_first divides by n (linear ideal) "
            "and is only meaningful on real hardware.")
    r1 = art["legs"].get("mh_1proc", {}).get("rows")
    r2 = art["legs"].get("mh_2proc", {}).get("rows")
    if r1 and r2:
        s1, s2 = r1[-1]["steps_per_s"], r2[-1]["steps_per_s"]
        summ["dcn_proxy_efficiency"] = round(s2 / s1, 3)
        summ["dcn_proxy_note"] = (
            "2proc/1proc on the SAME 4-device global mesh: the dp axis crosses a "
            "process boundary and collectives ride the distributed runtime — the "
            "measurable proxy for the >=80%-at-2-hosts BASELINE target. Lower "
            "bound vs real hardware: both processes also contend for the same "
            f"{os.cpu_count()} physical cores here.")
        summ["baseline_target"] = ">=0.80 efficiency at 2+ hosts"
        summ["meets_proxy_target"] = bool(s2 / s1 >= 0.80)
    real = art["legs"].get("real", {}).get("rows")
    if real:
        summ["real_1chip_steps_per_s"] = real[0]["steps_per_s"]
        summ["real_1chip_per_chunk"] = real[0]["per_chunk"]
    art["summary"] = summ

    out = os.path.join(REPO, f"SCALING_r{args.round:02d}.json")
    with open(out, "w") as f:
        json.dump(art, f, indent=1)
    print(json.dumps(summ, indent=1))
    print("wrote", out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
