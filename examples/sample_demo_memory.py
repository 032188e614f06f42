"""Demo-memory mixing, R2D3-style (parity:
/root/reference/examples/sample_demo_memory.py — collect demonstration
experience, save it, then train with prioritized batches mixed with demo items).

Run:  PYTHONPATH=. python examples/sample_demo_memory.py
"""

import simple_distributed_rl_tpu as srl
from simple_distributed_rl_tpu.algorithms import DQNConfig

_memory_path = "_sample_demo_memory.pkl.xz"


def collect():
    """Collect demonstration experience (here: a short scripted/random rollout;
    interactively use runner.play_terminal / play_window with enable_memory)."""
    cfg = DQNConfig()
    cfg.memory.set_proportional()
    cfg.memory.enable_demo_memory = True
    cfg.memory.select_memory = "demo"  # collection routes into the demo buffer
    runner = srl.Runner("EasyGrid", cfg, num_envs=64, seed=1)
    runner.rollout(max_steps=5_000)
    runner.save_memory(_memory_path)


def main():
    cfg = DQNConfig()
    cfg.memory.set_proportional()
    cfg.memory.enable_demo_memory = True
    cfg.memory.select_memory = "main"
    runner = srl.Runner("EasyGrid", cfg, num_envs=64, seed=1)
    runner.load_memory(_memory_path)
    runner.train(max_train_count=50_000)
    print(f"evaluate episodes: {runner.evaluate(100)}")


if __name__ == "__main__":
    collect()
    main()
