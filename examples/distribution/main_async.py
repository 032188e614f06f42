"""Distributed-training client, fire-and-forget (parity:
/root/reference/examples/distribution/main_async.py): post the task, return
immediately, poll/fetch later via TaskManager.

Run:  PYTHONPATH=../.. python main_async.py
"""

import simple_distributed_rl_tpu as srl
from simple_distributed_rl_tpu.algorithms import QLConfig
from simple_distributed_rl_tpu.runner.distribution import (
    KVServerParameters,
    TaskManager,
)


def main():
    params = KVServerParameters(host="127.0.0.1", port=52180)
    runner = srl.Runner("Grid", QLConfig(), num_envs=64, seed=1)
    runner.train_distribution_start(
        connector_params=params, actor_num=1, max_train_count=50_000
    )

    # ... come back later:
    tm = TaskManager(params.create_connector())
    print("train_count so far:", tm.train_count())
    if tm.is_finished():
        runner.load_distributed_parameter(tm)
        print(runner.evaluate(100))


if __name__ == "__main__":
    main()
