"""Atari Pong — the Nature-paper DQN preset on the 1M-transition host
frame-dedup replay ring (reference: examples/baseline/atari/pong.py +
dqn/dqn.py:89-102 set_atari_config).

Needs gymnasium + ale_py for the env (not bundled in every image); the same
preset is exercised hardware-only in bench.py's AtariHostReplay1M workload on a
synthetic 84x84 pixel env. The full run config also ships as
configs/dqn_atari.yaml (`srl.load(...)`)."""

import numpy as np

import simple_distributed_rl_tpu as srl
from simple_distributed_rl_tpu.algorithms import DQNConfig
from simple_distributed_rl_tpu.envs import EnvConfig
from simple_distributed_rl_tpu.processors import AtariProcessor


def main_dqn_atari():
    cfg = DQNConfig()
    cfg.set_atari_config()  # 1M host_frames replay, linear eps 1.0 -> 0.1
    env = EnvConfig(
        "ALE/Pong-v5",
        kwargs=dict(frameskip=4, repeat_action_probability=0,
                    full_action_space=False, obs_type="grayscale"),
        processors=[AtariProcessor(resize=(84, 84), grayscale=True)],
    )
    r = srl.Runner(env, cfg, num_envs=128, seed=0)
    # pipeline_overlap (default) hides host ingest/sampling under device rollout
    r.train(max_steps=10_000_000, chunk_steps=32)
    rewards = r.evaluate(10)
    print(f"[DQN-Atari] Pong eval: {float(np.asarray(rewards)[0]):.1f}")


if __name__ == "__main__":
    main_dqn_atari()
