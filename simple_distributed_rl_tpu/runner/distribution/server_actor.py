"""Actor daemon (parity: srl/runner/distribution/server_actor.py:55 run_forever +
server_actor_run.py — poll the coordinator for a task, claim an actor slot, then run
the collection loop: jitted engine chunks -> serialized experience -> queue, with
periodic parameter pulls).

TPU-native: one queue item is a whole [T, B, ...] chunk pytree (thousands of env
steps), not the reference's per-step batch — the device never waits on the network
path, and the host loop is just device_get + pickle."""

from __future__ import annotations

import time
import traceback
from typing import Optional

import jax

from .payload import dumps, loads
from .task_manager import TaskConfig, TaskManager


def _run_actor(tm: TaskManager, slot: int, tc: TaskConfig) -> None:
    runner = tc.make_runner(actor_id=slot, is_actor=True)
    algo = runner.algo
    collect_fn = runner.engine.build_collect_chunk(tc.chunk_steps)
    carry = runner.carry
    last_sync = 0.0
    last_param_count = -1
    chunks = 0
    while tm.is_active():
        # parameter sync (parity: the actor param-sync thread, server_actor_run.py)
        if time.time() - last_sync >= tc.actor_parameter_sync:
            last_sync = time.time()
            payload, count = tm.read_parameter()
            if payload is not None and count != last_param_count:
                last_param_count = count
                params = jax.tree.map(jax.numpy.asarray, loads(payload))
                carry = carry.replace(
                    algo_state=algo.restore_params(carry.algo_state, params)
                )
        # backpressure (queue capacity parity: play_mp_memory.py qsize guard)
        if tm.c.memory_size() >= tc.memory_queue_capacity:
            tm.keepalive_actor(slot)
            time.sleep(0.05)
            continue
        carry, experience = collect_fn(carry)
        tm.c.memory_add(dumps(jax.device_get(experience)))
        chunks += 1
        tm.keepalive_actor(slot)
    # free the slot for a future task
    tm.c.set(f"task:actor{slot}", "")


def run_forever(
    connector_params,
    polling_interval: float = 1.0,
    run_once: bool = False,
    verbose: bool = True,
) -> None:
    """Daemon entrypoint (parity: server_actor.run_forever). ``run_once=True`` exits
    after serving one task (tests / one-shot cloud workers)."""
    conn = connector_params.create_connector()
    tm = TaskManager(conn)
    if verbose:
        print(f"actor server up (uid={tm.uid})")
    while True:
        try:
            if tm.is_active():
                slot = tm.claim_actor()
                if slot is not None:
                    if verbose:
                        print(f"actor[{slot}] claimed task (uid={tm.uid})")
                    _run_actor(tm, slot, tm.get_config())
                    if run_once:
                        return
        except Exception:
            traceback.print_exc()
            if run_once:
                raise
        time.sleep(polling_interval)


def main(argv=None):
    import argparse

    from .connectors import KVServerParameters

    p = argparse.ArgumentParser(description="distributed actor server")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=25530)
    args = p.parse_args(argv)
    run_forever(KVServerParameters(args.host, args.port))


if __name__ == "__main__":
    main()
