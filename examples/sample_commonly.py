"""The common Runner workflows in one file (parity:
/root/reference/examples/sample_commonly.py — train / save / load / evaluate /
render_terminal / render_window / animation / replay_window).

Run:  PYTHONPATH=. python examples/sample_commonly.py
"""

import numpy as np

import simple_distributed_rl_tpu as srl
from simple_distributed_rl_tpu.algorithms import QLConfig
from simple_distributed_rl_tpu.envs import EnvConfig

_parameter_path = "_params.pkl.xz"


def _create_runner(load_parameter: bool):
    env_config = EnvConfig("Grid")
    runner = srl.Runner(env_config, QLConfig(), num_envs=256, seed=1)
    if load_parameter:
        runner.load_parameter(_parameter_path)
    return runner


def train(timeout=10):
    runner = _create_runner(load_parameter=False)
    runner.train(timeout=timeout)
    runner.save_parameter(_parameter_path)


def evaluate():
    runner = _create_runner(load_parameter=True)
    rewards = runner.evaluate(100)
    print(f"Average reward for 100 episodes: {np.asarray(rewards)}")


def render_terminal():
    runner = _create_runner(load_parameter=True)
    runner.render_terminal()


def render_window():
    # live pygame window (falls back to returning frames when headless)
    runner = _create_runner(load_parameter=True)
    runner.render_window()


def animation():
    runner = _create_runner(load_parameter=True)
    runner.animation_save_gif("_Grid.gif")


def replay_window():
    # scrubber over one recorded episode (left/right arrows)
    runner = _create_runner(load_parameter=True)
    runner.replay_window()


if __name__ == "__main__":
    train()
    evaluate()
    render_terminal()
    animation()
