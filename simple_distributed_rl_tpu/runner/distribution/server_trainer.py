"""Trainer daemon (parity: srl/runner/distribution/server_trainer.py:45 run_forever +
server_trainer_run.py:28-106 — poll for a task, claim the trainer slot, then run the
learn loop: drain the experience queue into the device replay, train, publish
parameters + train-count to the board, mark the task END at the stop condition).

TPU-native: ingestion is a jitted observe() on whole chunk pytrees and training is a
jitted lax.scan of K updates — the host loop only moves pickled bytes."""

from __future__ import annotations

import time
import traceback
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from .payload import dumps, loads
from .task_manager import TaskConfig, TaskManager


def _run_trainer(tm: TaskManager, tc: TaskConfig, verbose: bool = True) -> None:
    if tc.use_host_per:
        return _run_trainer_host_per(tm, tc, verbose)
    runner = tc.make_runner(actor_id=0)
    algo = runner.algo
    state = runner.algo_state

    # adopt the client's initial parameters
    payload, _ = tm.read_parameter()
    if payload is not None:
        params = jax.tree.map(jnp.asarray, loads(payload))
        state = algo.restore_params(state, params)

    if algo.needs_step_view:
        ingest = jax.jit(lambda st, t, m, sv: algo.observe_chunk(st, t, m, sv))
    else:
        ingest = jax.jit(lambda st, t, m, sv: algo.observe(st, t, m))
    train = jax.jit(partial(algo.train, num_steps=tc.trainer_train_steps))

    key = jax.random.PRNGKey(tc.seed + 104729)
    t0 = time.time()
    train_count = 0
    last_send = 0.0
    idle_sleeps = 0
    end_reason = ""
    while True:
        if tm.is_finished():
            end_reason = tm.end_reason() or "client stop"
            break
        if tc.max_train_count and train_count >= tc.max_train_count:
            end_reason = "max_train_count"
            break
        if tc.timeout and time.time() - t0 >= tc.timeout:
            end_reason = "timeout"
            break

        item = tm.c.memory_recv()
        if item is not None:
            transitions, masks, step_views = jax.tree.map(jnp.asarray, loads(item))
            state = ingest(state, transitions, masks, step_views)
            key, k = jax.random.split(key)
            state, metrics = train(state, k)
            train_count = int(metrics.get("train_count", train_count + tc.trainer_train_steps))
            idle_sleeps = 0
        else:
            idle_sleeps += 1
            time.sleep(0.02)

        now = time.time()
        if now - last_send >= tc.trainer_parameter_send_interval:
            last_send = now
            tm.write_parameter(dumps(jax.device_get(algo.params_of(state))))
            tm.set_train_count(train_count)
            tm.keepalive_trainer()

    # final publish + task end (parity: server_trainer_run.py finally block)
    tm.write_parameter(dumps(jax.device_get(algo.params_of(state))))
    tm.set_train_count(train_count)
    if not tm.is_finished():
        tm.finished(f"trainer: {end_reason}")
    if verbose:
        print(f"trainer done: {end_reason} (train_count={train_count:,})")
    tm.c.set("task:trainer", "")


def _run_trainer_host_per(tm: TaskManager, tc: TaskConfig, verbose: bool = True) -> None:
    """Trainer learn loop with HOST-side prioritized replay: incoming experience
    chunks are split into transitions and inserted into the C++ sum-tree at max
    priority; batches are drawn by prefix-sum sampling with beta-annealed IS
    weights and the |td| written back after every update. This is the TPU-native
    wiring of the reference's native ProportionalMemory living in the trainer/
    memory process (srl/rl/memories/priority_memories/cpp_module/
    proportional_memory.cpp + play_mp_memory.py:253-350)."""
    import numpy as np

    from ...ops.host_per import HostProportionalMemory

    runner = tc.make_runner(actor_id=0)
    algo = runner.algo
    assert hasattr(algo, "train_on_batch"), (
        f"{algo.get_name()} has no train_on_batch — host PER needs an explicit-"
        "batch trainer entry point (use the device replay path instead)"
    )
    state = runner.algo_state

    payload, _ = tm.read_parameter()
    if payload is not None:
        params = jax.tree.map(jnp.asarray, loads(payload))
        state = algo.restore_params(state, params)

    per = HostProportionalMemory(
        capacity=tc.host_per_capacity,
        alpha=tc.host_per_alpha,
        beta_initial=tc.host_per_beta_initial,
        beta_steps=tc.host_per_beta_steps,
        seed=tc.seed,
    )
    train_step = jax.jit(algo.train_on_batch)
    treedef = None
    warmup = max(tc.host_per_batch_size, getattr(algo.memory, "warmup_size", 1))

    key = jax.random.PRNGKey(tc.seed + 104729)
    t0 = time.time()
    train_count = 0
    last_send = 0.0
    end_reason = ""
    while True:
        if tm.is_finished():
            end_reason = tm.end_reason() or "client stop"
            break
        if tc.max_train_count and train_count >= tc.max_train_count:
            end_reason = "max_train_count"
            break
        if tc.timeout and time.time() - t0 >= tc.timeout:
            end_reason = "timeout"
            break

        item = tm.c.memory_recv()
        progressed = False
        if item is not None:
            transitions, masks, _sv = loads(item)
            leaves, treedef = jax.tree_util.tree_flatten(
                jax.tree.map(np.asarray, transitions)
            )
            m = np.asarray(masks)
            idx = np.argwhere(m)
            per.add_batch([tuple(l[t, s] for l in leaves) for t, s in idx])
            progressed = True

        if per.length() >= warmup and treedef is not None:
            for _ in range(tc.trainer_train_steps):
                items, weights, slots = per.sample(tc.host_per_batch_size, train_count)
                batch = jax.tree_util.tree_unflatten(
                    treedef,
                    [np.stack([it[i] for it in items]) for i in range(len(items[0]))],
                )
                key, k = jax.random.split(key)
                state, td_abs, _loss = train_step(
                    state, batch, jnp.asarray(weights), k
                )
                per.update(slots, np.asarray(td_abs, np.float64))
                train_count += 1
            progressed = True
        if not progressed:
            time.sleep(0.02)

        now = time.time()
        if now - last_send >= tc.trainer_parameter_send_interval:
            last_send = now
            tm.write_parameter(dumps(jax.device_get(algo.params_of(state))))
            tm.set_train_count(train_count)
            tm.keepalive_trainer()

    tm.write_parameter(dumps(jax.device_get(algo.params_of(state))))
    tm.set_train_count(train_count)
    if not tm.is_finished():
        tm.finished(f"trainer: {end_reason}")
    if verbose:
        print(f"trainer done (host PER): {end_reason} (train_count={train_count:,}, "
              f"memory={per.length():,})")
    tm.c.set("task:trainer", "")


def run_forever(
    connector_params,
    polling_interval: float = 1.0,
    run_once: bool = False,
    verbose: bool = True,
) -> None:
    """Daemon entrypoint (parity: server_trainer.run_forever)."""
    conn = connector_params.create_connector()
    tm = TaskManager(conn)
    if verbose:
        print(f"trainer server up (uid={tm.uid})")
    while True:
        try:
            if tm.is_active() and tm.claim_trainer():
                if verbose:
                    print(f"trainer claimed task (uid={tm.uid})")
                _run_trainer(tm, tm.get_config(), verbose=verbose)
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

    p = argparse.ArgumentParser(description="distributed trainer server")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=25530)
    args = p.parse_args(argv)
    run_forever(KVServerParameters(args.host, args.port))


if __name__ == "__main__":
    main()
