"""GoDynaQ (parity: srl/algorithms/go_dynaq.py — SearchDynaQ's model-based tabular
search combined with a Go-Explore archive: auto-resets teleport to under-visited
archived states, so the learned model covers the state space far faster).

Composed from this framework's SearchDynaQ (model + value-iteration + int rewards)
plus the archive_restore engine primitive (dense per-cell snapshots, visit-weighted
frontier selection)."""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from .base import StepView
from .search_dynaq import SDQActorState, SDQState, SearchDynaQConfig

Array = jax.Array


@struct.dataclass
class GoDynaQState:
    sdq: SDQState
    # archive over cells (= discrete states); last row is scratch
    visited: Array  # [S+1] bool
    select: Array  # [S+1]
    snap_env: Any  # AutoResetState stacked [S+1, ...]
    snap_ts: Any  # TimeStep stacked [S+1, ...]


@dataclasses.dataclass
class GoDynaQConfig(SearchDynaQConfig):
    w_visit: float = 1.0
    eps1: float = 0.001

    uses_archive_restore: bool = True
    needs_env_state: bool = True
    policy_updates_state: bool = True

    def get_name(self) -> str:
        return "GoDynaQ"

    def init(self, key: Array) -> GoDynaQState:
        sdq = super().init(key)
        from ..envs.core import AutoResetEnv

        aenv = AutoResetEnv(self.env)
        ar0, ats0 = aenv.reset(jax.random.PRNGKey(0))
        C = self.S + 1
        return GoDynaQState(
            sdq=sdq,
            visited=jnp.zeros((C,), bool),
            select=jnp.zeros((C,)),
            snap_env=jax.tree.map(
                lambda x: jnp.zeros((C,) + jnp.shape(x), jnp.asarray(x).dtype), ar0
            ),
            snap_ts=jax.tree.map(
                lambda x: jnp.zeros((C,) + jnp.shape(x), jnp.asarray(x).dtype), ats0
            ),
        )

    def policy_step(self, state: GoDynaQState, actor, obs, invalid_mask, ctx, key, episode_start):
        B = invalid_mask.shape[0]
        idx = jnp.arange(B)
        action, new_actor = super().policy_step(
            state.sdq, actor, obs, invalid_mask, ctx, key, episode_start
        )
        # archive every newly visited state (first-visit snapshot; keep earliest =
        # shortest-known route since restores bias toward frontier cells)
        cell = obs  # DISCRETE obs == cell index
        new_cell = jnp.logical_and(jnp.logical_not(state.visited[cell]), ctx.training)
        first = jnp.zeros((self.S + 1,), jnp.int32).at[cell].max(
            jnp.where(new_cell, B - idx, 0)
        )
        is_winner = jnp.logical_and(new_cell, (B - idx) == first[cell])
        wcell = jnp.where(is_winner, cell, self.S)

        visited = state.visited.at[wcell].max(jnp.ones((B,), bool)).at[self.S].set(False)
        snap_env = jax.tree.map(
            lambda b, v: b.at[wcell].set(v), state.snap_env, ctx.autoreset_state
        )
        snap_ts = jax.tree.map(
            lambda b, v: b.at[wcell].set(v), state.snap_ts, ctx.timestep
        )
        new_state = state.replace(visited=visited, snap_env=snap_env, snap_ts=snap_ts)
        return action, new_actor, new_state

    def archive_restore(self, state: GoDynaQState, env_state, timestep, was_reset, key):
        B = was_reset.shape[0]
        # frontier score: prefer rarely-visited cells (visit counts from the model)
        visits = state.sdq.cnt.sum(-1)  # [S]
        score = self.w_visit / (visits + self.eps1)
        score = jnp.concatenate([jnp.where(state.visited[:-1], score, 0.0), jnp.zeros((1,))])
        any_cell = jnp.any(state.visited)
        logits = jnp.where(score > 0, jnp.log(jnp.maximum(score, 1e-30)), -jnp.inf)
        logits = jnp.where(any_cell, logits, jnp.zeros_like(logits))
        cells = jax.random.categorical(key, logits, shape=(B,))
        restore = jnp.logical_and(was_reset, any_cell)

        def pick(snap, cur):
            chosen = jax.tree.map(lambda b: b[cells], snap)
            sel = lambda c, x: jnp.where(restore.reshape((B,) + (1,) * (x.ndim - 1)), c, x)
            return jax.tree.map(sel, chosen, cur)

        return pick(state.snap_env, env_state), pick(state.snap_ts, timestep)

    def observe_chunk(self, state: GoDynaQState, transitions, mask, sv: StepView) -> GoDynaQState:
        return state.replace(sdq=super().observe_chunk(state.sdq, transitions, mask, sv))

    def train(self, state: GoDynaQState, key, num_steps):
        sdq, metrics = super().train(state.sdq, key, num_steps)
        metrics["archive_cells"] = state.visited.sum().astype(jnp.float32)
        return state.replace(sdq=sdq), metrics

    def params_of(self, state: GoDynaQState):
        return super().params_of(state.sdq)

    def restore_params(self, state: GoDynaQState, p) -> GoDynaQState:
        return state.replace(sdq=super().restore_params(state.sdq, p))
