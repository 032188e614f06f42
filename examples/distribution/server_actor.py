"""Actor daemon for distributed training (parity:
/root/reference/examples/distribution/server_actor.py). Start one per actor
machine; each claims an actor slot, runs the vectorized rollout chunks, and
streams experience pytrees to the trainer.

Run:  PYTHONPATH=../.. python server_actor.py
"""

from simple_distributed_rl_tpu.runner.distribution import (
    KVServerParameters,
    server_actor,
)


def main():
    params = KVServerParameters(host="127.0.0.1", port=52180)
    server_actor.run_forever(connector_params=params)


if __name__ == "__main__":
    main()
