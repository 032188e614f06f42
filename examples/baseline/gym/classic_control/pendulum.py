"""Pendulum-v1 baselines — bar: mean eval reward >= -500 (the gym baseline the
reference asserts, gymnasium_wrapper.py:327-329). Discrete-action algorithms act
through the 10-way discretized action encoder.

Recipes from tests/test_agent57.py, tests/test_godq_v1.py and the curve-parity
matrix (curve_parity.py — each of these rows matches the actual reference
package's learning curve within its seed band at every checkpoint).
Reference layout: examples/baseline/gym/classic_control/pendulum.py."""

import simple_distributed_rl_tpu as srl
from simple_distributed_rl_tpu.algorithms import (
    Agent57Config,
    Agent57LightConfig,
    DQNConfig,
    GoDQv1Config,
    NoTargetDQNConfig,
    NoTargetSACConfig,
)


def _finish(r, episodes=50):
    ok = r.evaluate_compare_to_baseline_single_player(episodes=episodes)
    print(f"[{r.algo.get_name()}] baseline {'PASS' if ok else 'FAIL'}")
    return ok


def main_dqn():
    # the reference regime verbatim (curve-parity row DQN/Pendulum-v1):
    # constant eps 0.1, lr 1e-3, Huber, 1 gradient update per env step
    cfg = DQNConfig(enable_double_dqn=False, hidden_sizes=(64, 64))
    r = srl.Runner("Pendulum-v1", cfg, num_envs=4, seed=1)
    r.train(max_train_count=20_000, max_steps=10_000_000,
            chunk_steps=4, train_steps_per_chunk=16)
    return _finish(r)


def main_agent57_light():
    cfg = Agent57LightConfig(
        actor_num=2, target_model_update_interval=100, lr_ext=1e-3, lr_int=1e-3,
    )
    cfg.memory.capacity = 50_000
    cfg.memory.warmup_size = 1000
    r = srl.Runner("Pendulum-v1", cfg, num_envs=64, seed=1)
    r.train(max_steps=400_000, train_steps_per_chunk=64)
    return _finish(r, 32)


def main_agent57():
    # the full recurrent Agent57 (burn-in 10, sequence 10; measured -127 @300k)
    cfg = Agent57Config(
        lstm_units=64, burnin=10, sequence_length=10, batch_size=32,
        hidden_sizes=(64, 64), lr_ext=1e-3, lr_int=1e-3,
        target_model_update_interval=100, actor_num=2, enable_rescale=True,
        capacity=10_000, warmup_size=100,
    )
    r = srl.Runner("Pendulum-v1", cfg, num_envs=64, seed=1)
    r.train(max_steps=300_000, train_steps_per_chunk=32)
    return _finish(r, 20)


def main_no_target_dqn():
    cfg = NoTargetDQNConfig(discount=0.9, lr=0.001, hidden_sizes=(64,))
    r = srl.Runner("Pendulum-v1", cfg, num_envs=4, seed=1)
    r.train(max_train_count=20_000, max_steps=10_000_000,
            chunk_steps=4, train_steps_per_chunk=16)
    return _finish(r)


def main_no_target_sac():
    cfg = NoTargetSACConfig(
        batch_size=64, discount=0.9, hidden_sizes=(128, 128),
        lr_policy=2e-4, lr_q=2e-4, lr_alpha=2e-4,
    )
    cfg.memory.warmup_size = 1000
    r = srl.Runner("Pendulum-v1", cfg, num_envs=4, seed=1)
    r.train(max_train_count=20_000, max_steps=10_000_000,
            chunk_steps=4, train_steps_per_chunk=16)
    return _finish(r)


def main_godq_v1():
    cfg = GoDQv1Config(base_units=64, batch_size=64, lr=1e-3, discount=0.9,
                       memory_warmup_size=1000, reset_net_interval=0, epsilon=0.1)
    r = srl.Runner("Pendulum-v1", cfg, num_envs=64, seed=1)
    r.train(max_steps=600_000, train_steps_per_chunk=64)
    return _finish(r, 100)


if __name__ == "__main__":
    main_dqn()
