"""Distributed-training client, blocking until done (parity:
/root/reference/examples/distribution/main_sync.py).

Start first:   python -m simple_distributed_rl_tpu.runner.distribution.kv_server --port 52180
Then (anywhere): python server_trainer.py, python server_actor.py (xN)
Then this client.

Run:  PYTHONPATH=../.. python main_sync.py
"""

import simple_distributed_rl_tpu as srl
from simple_distributed_rl_tpu.algorithms import QLConfig
from simple_distributed_rl_tpu.runner.distribution import (
    DistCheckpoint,
    DistHistoryOnFile,
    KVServerParameters,
)


def main():
    params = KVServerParameters(host="127.0.0.1", port=52180)
    runner = srl.Runner("Grid", QLConfig(), num_envs=64, seed=1)
    # posts the task, waits for the remote trainer/actors, pulls the final
    # parameter back into this runner; interval checkpoints + history on the side
    runner.train_distribution(
        connector_params=params,
        actor_num=1,
        max_train_count=50_000,
        wait_callbacks=[
            DistCheckpoint("_dist_ckpt", interval=60.0),
            DistHistoryOnFile("_dist_history", interval=10.0),
        ],
    )
    print(runner.evaluate(100))


if __name__ == "__main__":
    main()
