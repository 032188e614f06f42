"""Cross-machine distribution (parity: srl/runner/distribution/).

The reference distributes coarse-grained python objects over Redis (params board +
experience queue + task metadata) with optional RabbitMQ/MQTT/GCP-Pub/Sub experience
transports, and `server_actor`/`server_trainer` daemons that poll for a task and run
the actor/trainer loops (SURVEY.md §2.6).

TPU-native redesign: the in-node scaling story is the jitted vectorized engine +
data-parallel mesh (``Runner.train_mp``); THIS package is the elastic cross-host
layer above it. Experience moves as whole jit-traced chunk pytrees (one serialized
[T, B, ...] batch per queue item — thousands of env steps per round-trip instead of
the reference's per-step batches), parameters move as the algo's param pytree, and
the coordinator is a pluggable key/value+queue connector:

* ``KVServerParameters`` — a self-contained stdlib TCP server (``kv_server.py``,
  ``python -m simple_distributed_rl_tpu.runner.distribution.kv_server``) speaking
  Redis-shaped verbs (get/set/rpush/lpop/...), so the stack has zero external
  dependencies.
* ``RedisParameters`` — drop-in real Redis when ``redis-py`` is installed (parity:
  connectors/redis_.py).
* ``RabbitMQParameters`` / ``MQTTParameters`` / ``GCPParameters`` — experience-queue
  parity surfaces (connectors/rabbitmq.py, mqtt.py, gcp.py), gated on their client
  libraries; parameters always ride the KV/Redis board exactly like the reference.
"""

from .connectors import (  # noqa: F401
    GCPParameters,
    IConnector,
    InMemoryParameters,
    KVServerParameters,
    MQTTParameters,
    RabbitMQParameters,
    RedisParameters,
)
from .kv_server import KVServer  # noqa: F401
from .payload import dumps, loads  # noqa: F401
from .dist_callbacks import (  # noqa: F401
    DistCheckpoint,
    DistHistoryOnFile,
    DistributionCallback,
)
from .task_manager import TaskConfig, TaskManager  # noqa: F401
from . import server_actor, server_trainer  # noqa: F401,E402
