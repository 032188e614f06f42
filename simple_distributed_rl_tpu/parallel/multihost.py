"""Multi-host (multi-process / DCN) execution.

The reference crosses machine boundaries with Redis queues + pickled parameter boards
(srl/runner/distribution/server_trainer_run.py:28-106). The TPU-native form is ONE
SPMD program over a global device mesh: every host runs the same jitted chunk over its
local shard of envs + replay, and the learner's psum/pmean collectives ride ICI within
a slice and DCN across hosts — no queues, no parameter transport, replicas never
diverge (SURVEY.md §2.6 "TPU-native equivalent").

Usage (one process per host, same program):

    from simple_distributed_rl_tpu.parallel import multihost
    multihost.initialize(coordinator_address="host0:1234",
                         num_processes=N, process_id=i)   # no-op args on Cloud TPU
    mesh = make_mesh()                 # jax.devices() is GLOBAL after initialize
    dp = DataParallelEngine(env, cfg, num_envs_per_shard, mesh=mesh)
    carry = dp.init(key)               # host-local shards, params identical everywhere
    chunk = dp.build_chunk(T)
    carry, metrics = chunk(carry)      # gradients pmean over ICI+DCN

Validated without real multi-host hardware by ``__graft_entry__.dryrun_multihost``:
two CPU subprocesses with 4 virtual devices each form an 8-device global mesh, train a
chunk, and assert bit-identical replicas across the process boundary.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import numpy as np


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Any] = None,
) -> None:
    """Join the JAX distributed system (parity in capability: the reference's actor /
    trainer daemons attaching to a Redis task, server_actor.py:55 — here every host
    attaches to one SPMD program instead). On Cloud TPU all arguments are inferred
    from the environment; on CPU/GPU pass them explicitly."""
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )


def is_multiprocess() -> bool:
    import jax

    return jax.process_count() > 1


def to_global(mesh, axis: str, host_value) -> Any:
    """Convert a host-replicated numpy/jax pytree (identical on every process, leading
    dim = number of mesh devices) into a global jax.Array pytree sharded over ``axis``.
    Each process materializes only its addressable shards."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    def conv(x):
        x = np.asarray(x)
        sharding = NamedSharding(mesh, P(axis, *([None] * (x.ndim - 1))))
        return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])

    return jax.tree.map(conv, host_value)


def read_local_shard(tree, index: int = 0) -> Any:
    """Read this process's first addressable shard of every leaf (leading mesh dim
    dropped). For replicated learner state any shard is THE state."""
    import jax

    def read(x):
        if hasattr(x, "addressable_shards"):
            return np.asarray(x.addressable_shards[index].data)[0]
        return np.asarray(x)[0]

    return jax.tree.map(read, tree)


def allgather(tree) -> Any:
    """Gather a (possibly non-fully-addressable) global array pytree to every host."""
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(tree, tiled=True)


# ----------------------------------------------------------------------------
# CPU dry-run support: a child process of __graft_entry__.dryrun_multihost
# ----------------------------------------------------------------------------

def dryrun_child(process_id: int, num_processes: int, port: int, devices_per_process: int = 4) -> None:
    """One simulated 'host': run data-parallel DQN training over the GLOBAL mesh and
    assert learner replicas are bit-identical across the process boundary. The caller
    must have called ``jax.distributed.initialize`` BEFORE importing this package
    (importing it initialises the XLA backend) — ``__graft_entry__.dryrun_multihost``
    launches exactly that via ``python -c``."""
    import jax

    assert jax.process_count() == num_processes
    assert len(jax.devices()) == num_processes * devices_per_process

    import simple_distributed_rl_tpu as srl
    from simple_distributed_rl_tpu.algorithms import DQNConfig
    from simple_distributed_rl_tpu.parallel import DataParallelEngine, make_mesh

    mesh = make_mesh()  # global
    env = srl.make_env("Grid")
    cfg = DQNConfig(hidden_sizes=(16, 16), batch_size=8)
    cfg.memory.capacity = 64
    cfg.memory.warmup_size = 8
    cfg.setup(env)

    dp = DataParallelEngine(env, cfg, num_envs_per_shard=4, mesh=mesh)
    carry = dp.init(jax.random.PRNGKey(0))
    chunk = dp.build_chunk(chunk_steps=4, train_steps_per_chunk=2)
    for _ in range(2):
        carry, metrics = chunk(carry)
    jax.block_until_ready(jax.tree.leaves(carry.algo_state)[0])

    # local check: all addressable replicas identical
    params = cfg.params_of(carry.algo_state)
    leaf = jax.tree.leaves(params["params"])[0]
    local = np.stack([np.asarray(s.data)[0] for s in leaf.addressable_shards])
    assert np.max(np.abs(local - local[0])) == 0.0, "local replicas diverged"
    # cross-host check: gather the leaf from every process and compare
    g = allgather(leaf)
    g = np.asarray(g)
    assert np.max(np.abs(g - g[0])) == 0.0, "cross-host replicas diverged"
    total_steps = dp.total_env_steps(carry)
    assert total_steps == 2 * 4 * 4 * num_processes * devices_per_process
    print(f"MULTIHOST_OK p{process_id} steps={total_steps}", flush=True)
