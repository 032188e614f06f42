"""DQN with the Nature-paper Atari preset — the reference's
``set_atari_config`` capability (srl/algorithms/dqn/dqn.py:89-102) at its real
1M-transition replay capacity.

The 1M replay cannot live in one chip's HBM (stacked 84x84x4 uint8 pairs are
~56 GB), so the preset selects the host-RAM frame-dedup ring
(``memories/host_replay.py``, ~7 GB): the jitted collect chunk runs on the TPU,
frames deduplicate on the host (each stored once), and K sampled batches per
chunk are staged back as one uint8 transfer into a jitted scan of updates.

ALE is not bundled in this image; any 84x84 gymnasium pixel env (or the
synthetic pixel env from bench.py) exercises the identical compute path — with
ale-py installed this runs the paper config verbatim:

    import gymnasium, ale_py
    env = srl.EnvConfig("ALE/Breakout-v5", kwargs=dict(terminal_on_life_loss=True))
"""

import simple_distributed_rl_tpu as srl
from simple_distributed_rl_tpu.algorithms import DQNConfig


def main():
    import sys

    sys.path.insert(0, ".")
    from bench import make_pixels_env  # stand-in for ALE (zero-egress image)

    cfg = DQNConfig()
    cfg.set_atari_config()  # capacity 1M, warmup 50k, lr 2.5e-4, eps 1->0.1,
    #                         target sync 10k, reward clip, host_frames storage
    cfg.memory.warmup_size = 5_000  # demo-scale warmup; the paper uses 50k

    runner = srl.Runner(make_pixels_env(), cfg, num_envs=128, seed=0)
    runner.train(max_steps=200_000, chunk_steps=32, train_steps_per_chunk=32)
    print("replay size:", runner.memory_size())
    print("eval:", runner.evaluate(16, on_incomplete="ignore"))


if __name__ == "__main__":
    main()
