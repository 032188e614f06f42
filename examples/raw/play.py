"""Low-level play loop on the engine primitives, no Runner (parity:
/root/reference/examples/raw/play.py — its env.reset/worker.policy/env.step/
trainer.train cycle re-expressed as the TPU-native equivalents: a functional env
stepped under the algorithm's policy, with explicit chunked training).

Run:  PYTHONPATH=../.. python play.py
"""

import jax
import jax.numpy as jnp

import simple_distributed_rl_tpu as srl
from simple_distributed_rl_tpu.algorithms import QLConfig
from simple_distributed_rl_tpu.runner.engine import PlayEngine


def main():
    # 1. make env + algorithm, bind them (space auto-adjust happens in setup)
    env = srl.make_env("Grid")
    algo = QLConfig()
    algo.setup(env)

    # 2. the engine compiles the whole rollout+train cycle; one chunk = 16
    #    lockstep steps of 64 envs followed by the algorithm's train updates
    engine = PlayEngine(env, algo, num_envs=64)
    chunk = engine.build_chunk(chunk_steps=16, train_steps_per_chunk=16)

    carry = engine.init(jax.random.PRNGKey(0))
    for i in range(100):
        carry, metrics = chunk(carry)
        if i % 20 == 0:
            print(f"chunk {i}: env_steps={int(carry.env_steps)}, "
                  f"train_count={int(metrics.get('train_count', 0))}")

    # 3. evaluate with the greedy policy
    eval_fn = engine.build_eval(num_episodes=100)
    rewards, recorded, _ = eval_fn(carry.algo_state, jax.random.PRNGKey(1))
    print("eval per-player mean:", jnp.round(rewards.mean(axis=0), 3),
          "complete:", bool(jnp.all(recorded)))

    # 4. single-episode host-side inspection (step-by-step, like the
    #    reference's rendering branch)
    runner = srl.Runner("Grid", algo, num_envs=64, seed=0)
    runner._carry = runner.carry.replace(algo_state=carry.algo_state)
    runner.render_terminal(max_steps=12)


if __name__ == "__main__":
    main()
