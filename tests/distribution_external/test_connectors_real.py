"""External connector tier: runs ONLY against a real Redis server.

Parity: /root/reference/tests/distribution_external/test_connectors_local.py —
the reference keeps real-server connector tests in a separate tier its CI runs
when the servers exist. Same deal here: these tests are marked ``external``
(excluded by the default ``addopts``) and skip themselves unless a reachable
Redis is found.

Run with:  python -m pytest tests/distribution_external/ -m external -q
Point at a non-default server with SRL_TPU_REDIS_HOST / SRL_TPU_REDIS_PORT.
"""

import os
import threading

import numpy as np
import pytest

import simple_distributed_rl_tpu as srl
from simple_distributed_rl_tpu.algorithms import QLConfig
from simple_distributed_rl_tpu.runner.distribution import (
    TaskConfig,
    TaskManager,
    server_actor,
    server_trainer,
)
from simple_distributed_rl_tpu.runner.distribution.payload import dumps
from simple_distributed_rl_tpu.runner.distribution.connectors import RedisParameters

pytestmark = pytest.mark.external


def _redis_params():
    try:
        import redis  # noqa: F401
    except ImportError:
        pytest.skip("redis-py not installed")
    params = RedisParameters(
        host=os.environ.get("SRL_TPU_REDIS_HOST", "localhost"),
        port=int(os.environ.get("SRL_TPU_REDIS_PORT", "6379")),
        db=int(os.environ.get("SRL_TPU_REDIS_DB", "15")),  # scratch db
    )
    conn = params.create_connector()
    if not conn.ping():
        pytest.skip(f"no Redis server at {params.host}:{params.port}")
    return params


def test_redis_connector_verbs():
    params = _redis_params()
    c = params.create_connector()
    c.flushall()
    assert c.get("missing") is None
    c.set("k", b"v")
    assert c.get("k") == b"v"
    assert c.setnx("k", b"other") is False
    assert c.setnx("k2", b"w") is True
    assert sorted(c.keys("k")) == ["k", "k2"]
    assert c.incr("n") == 1
    assert c.incr("n", 5) == 6
    c.rpush("q", b"a")
    c.rpush("q", b"b")
    assert c.llen("q") == 2
    assert c.lpop("q") == b"a"
    c.delete("k")
    assert c.get("k") is None
    c.flushall()


def test_task_manager_over_real_redis():
    params = _redis_params()
    conn = params.create_connector()
    conn.flushall()
    tm = TaskManager(conn, uid="client")
    r = srl.Runner("Grid", QLConfig(), num_envs=8, seed=1)
    tm.create_task(TaskConfig.from_runner(r, max_train_count=10),
                   dumps({"q": np.zeros(3)}), actor_num=2)
    a = TaskManager(params.create_connector(), uid="actor-1")
    assert a.claim_actor() is not None
    t = TaskManager(params.create_connector(), uid="trainer-1")
    assert t.claim_trainer() is True
    assert TaskManager(params.create_connector(), uid="trainer-2").claim_trainer() is False
    t.set_train_count(7)
    assert tm.train_count() == 7
    t.finished("test done")
    assert tm.is_finished() and tm.end_reason() == "test done"
    conn.flushall()


def test_train_distribution_over_real_redis():
    """The full distributed QL train loop with actors/trainer daemons riding a
    real Redis board + queue (the fakes-based twin lives in
    tests/test_distribution.py::test_train_distribution_ql)."""
    params = _redis_params()
    params.create_connector().flushall()
    threads = [
        threading.Thread(
            target=server_trainer.run_forever,
            kwargs=dict(connector_params=params, polling_interval=0.1,
                        run_once=True, verbose=False),
            daemon=True,
        ),
        threading.Thread(
            target=server_actor.run_forever,
            kwargs=dict(connector_params=params, polling_interval=0.1,
                        run_once=True, verbose=False),
            daemon=True,
        ),
    ]
    for th in threads:
        th.start()
    runner = srl.Runner("Grid", QLConfig(), num_envs=16, seed=3)
    reason = runner.train_distribution(
        connector_params=params, actor_num=1, max_train_count=500,
        progress=False, chunk_steps=16, trainer_train_steps=8,
    )
    for th in threads:
        th.join(timeout=60)
    assert "max_train_count" in reason or "timeout" in reason
    assert TaskManager(params.create_connector()).train_count() >= 500
    assert np.isfinite(runner.evaluate(5)).all()
    params.create_connector().flushall()
