"""Trainer daemon for distributed training (parity:
/root/reference/examples/distribution/server_trainer.py).

Point it at the same coordination backend as the client and actors — the
zero-dependency KV server (`python -m simple_distributed_rl_tpu.runner.distribution.kv_server`),
or Redis/RabbitMQ/MQTT/GCP via their connector params.

Run:  PYTHONPATH=../.. python server_trainer.py
"""

from simple_distributed_rl_tpu.runner.distribution import (
    KVServerParameters,
    server_trainer,
)


def main():
    params = KVServerParameters(host="127.0.0.1", port=52180)
    # blocks forever: claims the trainer slot of each task that appears,
    # trains on experience chunks from the actors, publishes parameters
    server_trainer.run_forever(connector_params=params)


if __name__ == "__main__":
    main()
