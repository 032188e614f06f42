"""Distribution backend tests: KV server, connectors, TaskManager lifecycle, and the
full actor/trainer/client loop (parity: the reference's runner/distribution tests)."""

import threading
import time

import numpy as np
import pytest

import simple_distributed_rl_tpu as srl
from simple_distributed_rl_tpu.algorithms import DQNConfig, QLConfig
from simple_distributed_rl_tpu.runner.distribution import (
    InMemoryParameters,
    KVServer,
    KVServerParameters,
    TaskConfig,
    TaskManager,
    dumps,
    loads,
)
from simple_distributed_rl_tpu.runner.distribution import server_actor, server_trainer


@pytest.fixture()
def kv():
    server = KVServer(port=0).start()
    yield KVServerParameters("127.0.0.1", server.port)
    server.stop()


def test_kv_server_verbs(kv):
    c = kv.create_connector()
    assert c.ping()
    assert c.get("x") is None
    c.set("x", b"abc")
    assert c.get("x") == b"abc"
    assert c.setnx("x", b"other") is False
    assert c.setnx("y", 123) is True
    assert c.incr("n", 5) == 5 and c.incr("n") == 6
    c.rpush("q", b"1")
    c.rpush("q", b"2")
    assert c.llen("q") == 2
    assert c.lpop("q") == b"1"
    assert sorted(c.keys("")) == ["n", "q", "x", "y"]
    c.delete("x")
    assert c.get("x") is None
    c.flushall()
    assert c.keys("") == []
    # arbitrary pickled python values survive the wire
    c.set("obj", {"a": [1, 2], "b": (3.5, None)})
    assert c.get("obj") == {"a": [1, 2], "b": (3.5, None)}
    c.close()


def test_payload_roundtrip():
    obj = {"arr": np.arange(10), "s": "x" * 1000}
    for compress in (True, False):
        out = loads(dumps(obj, compress=compress))
        np.testing.assert_array_equal(out["arr"], obj["arr"])
        assert out["s"] == obj["s"]


def test_task_manager_lifecycle():
    conn = InMemoryParameters(name="tm_test").create_connector()
    conn.flushall()
    tm = TaskManager(conn, uid="client")
    r = srl.Runner("Grid", QLConfig(), num_envs=8, seed=1)
    tc = TaskConfig.from_runner(r, max_train_count=10)
    tm.create_task(tc, dumps({"q": np.zeros(3)}), actor_num=2)
    assert tm.is_active() and not tm.is_finished()
    tc2 = tm.get_config()
    assert tc2.env_id == "Grid" and tc2.algo_class is QLConfig

    a1 = TaskManager(conn, uid="actor1")
    a2 = TaskManager(conn, uid="actor2")
    a3 = TaskManager(conn, uid="actor3")
    s1, s2 = a1.claim_actor(), a2.claim_actor()
    assert sorted([s1, s2]) == [0, 1]
    assert a3.claim_actor() is None  # all slots taken and alive

    t1 = TaskManager(conn, uid="trainer1")
    assert t1.claim_trainer() is True
    assert TaskManager(conn, uid="trainer2").claim_trainer() is False

    # params board
    t1.write_parameter(dumps({"q": np.ones(3)}))
    payload, count = tm.read_parameter()
    np.testing.assert_array_equal(loads(payload)["q"], np.ones(3))
    assert count >= 2  # create_task wrote once, trainer once

    # train count board + finish
    t1.set_train_count(7)
    assert tm.train_count() == 7
    t1.finished("test done")
    assert tm.is_finished() and tm.end_reason() == "test done"

    hc = tm.healthcheck()
    assert len(hc["actors"]) == 2 and hc["trainer"]["uid"] == "trainer1"


def test_task_manager_stale_eviction(monkeypatch):
    from simple_distributed_rl_tpu.runner.distribution import task_manager as tmod

    conn = InMemoryParameters(name="tm_evict").create_connector()
    conn.flushall()
    tm = TaskManager(conn, uid="client")
    r = srl.Runner("Grid", QLConfig(), num_envs=8, seed=1)
    tm.create_task(TaskConfig.from_runner(r, max_train_count=10), dumps({}), actor_num=1)
    a1 = TaskManager(conn, uid="a1")
    assert a1.claim_actor() == 0
    # freeze keepalive into the past -> slot is evicted and reclaimable
    conn.set("task:actor0:keepalive", time.time() - tmod.KEEPALIVE_THRESHOLD - 1)
    hc = tm.healthcheck()
    assert hc["actors"][0]["uid"] == ""
    a2 = TaskManager(conn, uid="a2")
    assert a2.claim_actor() == 0


def _run_distributed(kv_params, algo, env="Grid", actor_num=1, max_train_count=200,
                     num_envs=16, **overrides):
    threads = [
        threading.Thread(
            target=server_trainer.run_forever,
            kwargs=dict(connector_params=kv_params, polling_interval=0.1,
                        run_once=True, verbose=False),
            daemon=True,
        )
    ]
    for _ in range(actor_num):
        threads.append(
            threading.Thread(
                target=server_actor.run_forever,
                kwargs=dict(connector_params=kv_params, polling_interval=0.1,
                            run_once=True, verbose=False),
                daemon=True,
            )
        )
    for t in threads:
        t.start()
    runner = srl.Runner(env, algo, num_envs=num_envs, seed=3)
    reason = runner.train_distribution(
        connector_params=kv_params, actor_num=actor_num,
        max_train_count=max_train_count, progress=False,
        chunk_steps=16, trainer_train_steps=8, **overrides,
    )
    for t in threads:
        t.join(timeout=60)
    return runner, reason


@pytest.mark.slow
def test_train_distribution_ql(kv):
    runner, reason = _run_distributed(kv, QLConfig(), max_train_count=500)
    assert "max_train_count" in reason or "timeout" in reason
    tm = TaskManager(kv.create_connector())
    assert tm.train_count() >= 500
    rewards = runner.evaluate(5)
    assert np.isfinite(rewards).all()


@pytest.mark.slow
def test_train_distribution_dqn_two_actors(kv):
    cfg = DQNConfig(batch_size=16, hidden_sizes=(32,))
    cfg.memory.warmup_size = 50
    runner, reason = _run_distributed(
        kv, cfg, actor_num=2, max_train_count=300, num_envs=8)
    tm = TaskManager(kv.create_connector())
    assert tm.train_count() >= 300
    rewards = runner.evaluate(5)
    assert np.isfinite(rewards).all()


@pytest.mark.slow
def test_train_distribution_learns(kv):
    runner, _ = _run_distributed(
        kv, QLConfig(), max_train_count=30_000, num_envs=64,
        timeout=120,
    )
    assert runner.evaluate_compare_to_baseline_single_player()


@pytest.mark.slow
def test_distribution_callbacks_checkpoint_history(kv, tmp_path):
    """Typed DistributionCallback hooks in train_wait (parity: distribution/
    callbacks/{checkpoint,history_on_file}.py): interval param-board snapshots
    load back via Runner.load_parameter; task-board history lands in jsonl."""
    from simple_distributed_rl_tpu.runner.distribution import (
        DistCheckpoint,
        DistHistoryOnFile,
    )

    ck = DistCheckpoint(str(tmp_path / "ck"), interval=0.0)
    hist = DistHistoryOnFile(str(tmp_path / "hist"), interval=0.0)
    runner, reason = _run_distributed(
        kv, QLConfig(), max_train_count=2_000, num_envs=32,
        wait_callbacks=[ck, hist],
    )
    latest = DistCheckpoint.latest(str(tmp_path / "ck"))
    assert latest is not None
    r2 = srl.Runner("Grid", QLConfig(), num_envs=8, seed=9)
    r2.load_parameter(latest)
    assert np.abs(np.asarray(r2.algo_state.q_table)).sum() > 0

    import json

    recs = [json.loads(l) for l in open(tmp_path / "hist" / "history.jsonl")]
    assert recs and recs[-1]["train_count"] >= 2_000
    assert recs[-1]["trainer_up"] in (True, False)


@pytest.mark.slow
def test_train_distribution_host_per(kv):
    """Trainer daemon with HOST-side C++ sum-tree PER (ops/host_per.py wired via
    TaskConfig.use_host_per): experience chunks are split into transitions on the
    host, sampled by priority with IS weights, |td| written back per update
    (parity: the reference's native ProportionalMemory living in the memory/
    trainer process, cpp_module/proportional_memory.cpp + play_mp_memory.py)."""
    cfg = DQNConfig(batch_size=16, hidden_sizes=(32,))
    cfg.memory.warmup_size = 50
    runner, reason = _run_distributed(
        kv, cfg, actor_num=1, max_train_count=300, num_envs=8,
        use_host_per=True, host_per_capacity=10_000, host_per_batch_size=16,
    )
    assert "max_train_count" in reason or "timeout" in reason
    tm = TaskManager(kv.create_connector())
    assert tm.train_count() >= 300
    rewards = runner.evaluate(5)
    assert np.isfinite(rewards).all()
