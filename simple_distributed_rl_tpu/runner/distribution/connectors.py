"""Connector interfaces + backends (parity: srl/runner/distribution/
connector_configs.py:20-150 — IParameterServer / IMemoryReceiver / IMemorySender and
the RedisParameters/RabbitMQParameters/MQTTParameters/GCPParameters dataclasses).

All backends expose ONE combined interface (`IConnector`): a parameter board, an
experience queue, and the small KV verbs the TaskManager needs. The reference splits
these across IParameterServer/IMemorySender/IMemoryReceiver but every deployment
pairs them anyway (params always ride Redis, connector_configs.py docstring)."""

from __future__ import annotations

import dataclasses
import socket
import threading
import time
from collections import deque
from typing import Any, Dict, List, Optional

from .kv_server import recv_frame, send_frame


class IConnector:
    """Abstract coordination backend: KV verbs + parameter board + memory queue."""

    # --- kv verbs (TaskManager metadata) -----------------------------------
    def get(self, key: str) -> Any:
        raise NotImplementedError()

    def set(self, key: str, value: Any) -> None:
        raise NotImplementedError()

    def setnx(self, key: str, value: Any) -> bool:
        raise NotImplementedError()

    def delete(self, key: str) -> None:
        raise NotImplementedError()

    def keys(self, prefix: str = "") -> List[str]:
        raise NotImplementedError()

    def incr(self, key: str, by: int = 1) -> int:
        raise NotImplementedError()

    def flushall(self) -> None:
        raise NotImplementedError()

    def ping(self) -> bool:
        try:
            return self.get("__ping__") is None or True
        except Exception:
            return False

    # --- parameter board (parity: IParameterServer) ------------------------
    def parameter_write(self, data: bytes) -> None:
        self.set("task:parameter", data)
        self.incr("task:parameter:count", 1)

    def parameter_read(self) -> Optional[bytes]:
        return self.get("task:parameter")

    def parameter_count(self) -> int:
        return int(self.get("task:parameter:count") or 0)

    # --- experience queue (parity: IMemorySender / IMemoryReceiver) --------
    def memory_add(self, data: bytes) -> None:
        self.rpush("task:memory", data)

    def memory_recv(self) -> Optional[bytes]:
        return self.lpop("task:memory")

    def memory_size(self) -> int:
        return self.llen("task:memory")

    def memory_purge(self) -> None:
        self.delete("task:memory")

    def rpush(self, key: str, value: Any) -> None:
        raise NotImplementedError()

    def lpop(self, key: str) -> Any:
        raise NotImplementedError()

    def llen(self, key: str) -> int:
        raise NotImplementedError()

    def close(self) -> None:
        pass


# ---------------------------------------------------------------------------
# in-memory backend (process-local; unit tests / single-host smoke)
# ---------------------------------------------------------------------------
class _InMemoryStore:
    _instances: Dict[str, "_InMemoryStore"] = {}
    _ilock = threading.Lock()

    @classmethod
    def instance(cls, name: str) -> "_InMemoryStore":
        with cls._ilock:
            if name not in cls._instances:
                cls._instances[name] = cls()
            return cls._instances[name]

    def __init__(self):
        self.lock = threading.Lock()
        self.kv: Dict[str, Any] = {}
        self.lists: Dict[str, deque] = {}


class InMemoryConnector(IConnector):
    def __init__(self, name: str = "default"):
        self._s = _InMemoryStore.instance(name)

    def get(self, key):
        with self._s.lock:
            return self._s.kv.get(key)

    def set(self, key, value):
        with self._s.lock:
            self._s.kv[key] = value

    def setnx(self, key, value):
        with self._s.lock:
            if key in self._s.kv:
                return False
            self._s.kv[key] = value
            return True

    def delete(self, key):
        with self._s.lock:
            self._s.kv.pop(key, None)
            self._s.lists.pop(key, None)

    def keys(self, prefix=""):
        with self._s.lock:
            return [k for k in list(self._s.kv) + list(self._s.lists) if k.startswith(prefix)]

    def incr(self, key, by=1):
        with self._s.lock:
            v = int(self._s.kv.get(key, 0)) + by
            self._s.kv[key] = v
            return v

    def flushall(self):
        with self._s.lock:
            self._s.kv.clear()
            self._s.lists.clear()

    def rpush(self, key, value):
        with self._s.lock:
            self._s.lists.setdefault(key, deque()).append(value)

    def lpop(self, key):
        with self._s.lock:
            q = self._s.lists.get(key)
            return q.popleft() if q else None

    def llen(self, key):
        with self._s.lock:
            q = self._s.lists.get(key)
            return len(q) if q else 0


@dataclasses.dataclass
class InMemoryParameters:
    """Process-local backend (threads only)."""

    name: str = "default"

    def create_connector(self) -> InMemoryConnector:
        return InMemoryConnector(self.name)


# ---------------------------------------------------------------------------
# KV-server backend (the default cross-process / cross-host transport)
# ---------------------------------------------------------------------------
class KVConnector(IConnector):
    """TCP client for ``kv_server.py`` with lazy connect + one reconnect retry."""

    def __init__(self, host: str, port: int, timeout: float = 30.0):
        self.host, self.port, self.timeout = host, port, timeout
        self._sock: Optional[socket.socket] = None
        self._lock = threading.Lock()

    def _connect(self):
        s = socket.create_connection((self.host, self.port), timeout=self.timeout)
        s.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        self._sock = s

    def _call(self, *cmd):
        with self._lock:
            for attempt in (0, 1):
                try:
                    if self._sock is None:
                        self._connect()
                    send_frame(self._sock, cmd)
                    ok, out = recv_frame(self._sock)
                    if not ok:
                        raise RuntimeError(f"kv_server error: {out}")
                    return out
                except (ConnectionError, OSError):
                    self._sock = None
                    if attempt:
                        raise
        return None

    def ping(self) -> bool:
        try:
            return self._call("ping") == "pong"
        except Exception:
            return False

    def get(self, key):
        return self._call("get", key)

    def set(self, key, value):
        self._call("set", key, value)

    def setnx(self, key, value):
        return bool(self._call("setnx", key, value))

    def delete(self, key):
        self._call("delete", key)

    def keys(self, prefix=""):
        return self._call("keys", prefix)

    def incr(self, key, by=1):
        return int(self._call("incr", key, by))

    def flushall(self):
        self._call("flushall")

    def rpush(self, key, value):
        self._call("rpush", key, value)

    def lpop(self, key):
        return self._call("lpop", key)

    def llen(self, key):
        return int(self._call("llen", key))

    def close(self):
        with self._lock:
            if self._sock is not None:
                try:
                    self._sock.close()
                finally:
                    self._sock = None


@dataclasses.dataclass
class KVServerParameters:
    """Default backend: the stdlib KV server (parity role: RedisParameters,
    connector_configs.py — same keys/verbs, zero dependencies)."""

    host: str = "127.0.0.1"
    port: int = 25530
    timeout: float = 30.0

    def create_connector(self) -> KVConnector:
        return KVConnector(self.host, self.port, self.timeout)


# ---------------------------------------------------------------------------
# real-Redis backend (parity: connectors/redis_.py; requires redis-py)
# ---------------------------------------------------------------------------
class RedisConnector(IConnector):
    def __init__(self, params: "RedisParameters"):
        import redis  # gated: not bundled in this image

        kw = dict(host=params.host, port=params.port, db=params.db)
        if params.password:
            kw["password"] = params.password
        kw.update(params.kwargs)
        self._r = redis.Redis(**kw)

    def ping(self):
        try:
            return bool(self._r.ping())
        except Exception:
            return False

    def get(self, key):
        v = self._r.get(key)
        return v

    def set(self, key, value):
        self._r.set(key, value if isinstance(value, (bytes, int, float, str)) else repr(value))

    def setnx(self, key, value):
        return bool(self._r.setnx(key, value))

    def delete(self, key):
        self._r.delete(key)

    def keys(self, prefix=""):
        return [k.decode() for k in self._r.keys(prefix + "*")]

    def incr(self, key, by=1):
        return int(self._r.incrby(key, by))

    def flushall(self):
        self._r.flushdb()

    def rpush(self, key, value):
        self._r.rpush(key, value)

    def lpop(self, key):
        return self._r.lpop(key)

    def llen(self, key):
        return int(self._r.llen(key))


@dataclasses.dataclass
class RedisParameters:
    """Parity: RedisParameters (connector_configs.py). Requires `redis` installed."""

    host: str = "localhost"
    port: int = 6379
    db: int = 0
    password: str = ""
    kwargs: dict = dataclasses.field(default_factory=dict)

    def create_connector(self) -> RedisConnector:
        return RedisConnector(self)


# ---------------------------------------------------------------------------
# queue-only transports (parity surfaces; params always ride the KV/Redis board,
# exactly like the reference pairs RabbitMQ/MQTT/GCP with a Redis parameter server)
# ---------------------------------------------------------------------------
class _QueueOverlayConnector(IConnector):
    """Wrap a base KV connector, replacing ONLY the experience queue with an
    external message-queue transport. KV verbs are delegated EXPLICITLY —
    ``__getattr__`` would never fire for methods IConnector defines (they exist and
    raise), a round-2 bug caught by the protocol mocks."""

    def __init__(self, base: IConnector):
        self._base = base

    def get(self, key):
        return self._base.get(key)

    def set(self, key, value):
        self._base.set(key, value)

    def setnx(self, key, value):
        return self._base.setnx(key, value)

    def delete(self, key):
        self._base.delete(key)

    def keys(self, prefix=""):
        return self._base.keys(prefix)

    def incr(self, key, by=1):
        return self._base.incr(key, by)

    def flushall(self):
        self._base.flushall()

    def ping(self):
        return self._base.ping()

    def rpush(self, key, value):
        self._base.rpush(key, value)

    def lpop(self, key):
        return self._base.lpop(key)

    def llen(self, key):
        return self._base.llen(key)

    def close(self):
        self._base.close()

    # subclasses override memory_add/memory_recv/memory_size


@dataclasses.dataclass
class RabbitMQParameters:
    """Parity: RabbitMQParameters (connectors/rabbitmq.py). Requires `pika`."""

    host: str = "localhost"
    port: int = 5672
    username: str = "guest"
    password: str = "guest"
    virtual_host: str = "/"
    queue_name: str = "srl_memory"
    ssl: bool = False

    def create_connector(self, base: Optional[IConnector] = None) -> IConnector:
        import pika  # gated: not bundled in this image

        params = self

        class RabbitMQConnector(_QueueOverlayConnector):
            def __init__(self):
                super().__init__(base if base is not None else InMemoryConnector())
                cred = pika.PlainCredentials(params.username, params.password)
                self._conn = pika.BlockingConnection(
                    pika.ConnectionParameters(
                        host=params.host, port=params.port,
                        virtual_host=params.virtual_host, credentials=cred,
                    )
                )
                self._ch = self._conn.channel()
                self._ch.queue_declare(queue=params.queue_name)

            def memory_add(self, data: bytes):
                self._ch.basic_publish(exchange="", routing_key=params.queue_name, body=data)

            def memory_recv(self):
                m, _, body = self._ch.basic_get(queue=params.queue_name, auto_ack=True)
                return body if m else None

            def memory_size(self):
                q = self._ch.queue_declare(queue=params.queue_name, passive=True)
                return q.method.message_count

            def memory_purge(self):
                self._ch.queue_purge(params.queue_name)

        return RabbitMQConnector()


@dataclasses.dataclass
class MQTTParameters:
    """Parity: MQTTParameters (connectors/mqtt.py). Requires `paho-mqtt`."""

    host: str = "localhost"
    port: int = 1883
    topic_name: str = "srl_memory"

    def create_connector(self, base: Optional[IConnector] = None) -> IConnector:
        import paho.mqtt.client as mqtt  # gated: not bundled in this image

        params = self

        class MQTTConnector(_QueueOverlayConnector):
            def __init__(self):
                super().__init__(base if base is not None else InMemoryConnector())
                self._q: deque = deque()
                self._client = mqtt.Client()
                self._client.on_message = lambda c, u, msg: self._q.append(msg.payload)
                self._client.connect(params.host, params.port)
                self._client.subscribe(params.topic_name)
                self._client.loop_start()

            def memory_add(self, data: bytes):
                self._client.publish(params.topic_name, data)

            def memory_recv(self):
                return self._q.popleft() if self._q else None

            def memory_size(self):
                return len(self._q)

            def memory_purge(self):
                # MQTT has no broker-side purge; the queue IS the local
                # subscription buffer
                self._q.clear()

        return MQTTConnector()


@dataclasses.dataclass
class GCPParameters:
    """Parity: GCPParameters (connectors/gcp.py). Requires `google-cloud-pubsub`."""

    project_id: str = ""
    topic_name: str = "srl_memory"
    subscription_name: str = "srl_memory_sub"

    def create_connector(self, base: Optional[IConnector] = None) -> IConnector:
        from google.cloud import pubsub_v1  # gated: not bundled in this image

        params = self

        class GCPConnector(_QueueOverlayConnector):
            def __init__(self):
                super().__init__(base if base is not None else InMemoryConnector())
                self._pub = pubsub_v1.PublisherClient()
                self._sub = pubsub_v1.SubscriberClient()
                self._topic = self._pub.topic_path(params.project_id, params.topic_name)
                self._subscription = self._sub.subscription_path(
                    params.project_id, params.subscription_name
                )

            def memory_add(self, data: bytes):
                self._pub.publish(self._topic, data)

            def memory_recv(self):
                resp = self._sub.pull(
                    subscription=self._subscription, max_messages=1, timeout=1
                )
                if not resp.received_messages:
                    return None
                msg = resp.received_messages[0]
                self._sub.acknowledge(
                    subscription=self._subscription, ack_ids=[msg.ack_id]
                )
                return msg.message.data

            def memory_size(self):
                return 0  # pub/sub exposes no cheap depth probe (reference returns 0 too)

        return GCPConnector()


def wait_for_server(params, timeout: float = 10.0) -> IConnector:
    """Poll until the backend answers ping (server boot helper for scripts/tests)."""
    conn = params.create_connector()
    t0 = time.time()
    while not conn.ping():
        if time.time() - t0 > timeout:
            raise TimeoutError(f"no coordination server at {params}")
        time.sleep(0.1)
    return conn
