"""Algorithm abstraction: pure-function worker/trainer pairs.

The reference splits an algorithm into Config/Memory/Parameter/Trainer/Worker objects
(srl/base/rl/config.py:42, memory.py:48, parameter.py:15, trainer.py:14, worker.py:147)
communicating through mutable state and mp queues. Here an algorithm is a config
dataclass exposing four pure functions over an explicit state pytree:

    init(key)                                  -> AlgoState
    policy(state, obs, invalid, ctx, key)      -> rl_action            (batched over envs)
    observe(state, transitions, mask)          -> AlgoState            (memory write)
    train(state, key, num_steps)               -> (AlgoState, metrics) (num_steps updates)

all of which compile into ONE jitted rollout+update chunk by the play engine. The
env↔RL space auto-negotiation of RLConfig.setup (srl/base/rl/config.py:226-445) is
``setup(env)`` here: it resolves observation/action encoders as static trace-time
transforms.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..define import RLBaseTypes
from ..envs.core import EnvCore
from ..spaces import Encoder, Space

Array = jax.Array


@struct.dataclass
class Transition:
    """One (s, a, r, s') sample as seen by the acting player, in RL (encoded) space.

    ``reward`` is the acting player's accumulated reward since its previous action
    (matching WorkerRun's per-player delayed view, srl/base/rl/worker_run.py:107-228).
    ``undone`` = not terminated — the bootstrap mask, named after the reference's DQN
    batch field (srl/algorithms/dqn/dqn.py:243).
    """

    obs: Any
    action: Any
    reward: Array  # f32
    next_obs: Any
    undone: Array  # f32: 0 if terminated, 1 otherwise (truncation still bootstraps)
    invalid_mask: Array  # [A] bool at s
    next_invalid_mask: Array  # [A] bool at s'


@struct.dataclass
class StepView:
    """Raw per-step record for sequence algorithms (leaves [T, B, ...] per chunk):
    what the acting policy saw and did at each lockstep step, plus the recurrent-state
    snapshot fed into that step."""

    obs: Any  # encoded obs the policy acted on
    action: Any  # RL-space action taken
    reward: Array  # [P]-summed acting-player reward received after the step -> [B]
    terminated: Array  # [B]
    truncated: Array  # [B]
    invalid_mask: Array  # [B, A]
    episode_start: Array  # [B] this step's obs begins an episode
    actor_snapshot: Any  # algo-defined (e.g. LSTM hidden before the step)


@struct.dataclass
class PolicyContext:
    """Per-call info available to the policy (parity: the worker shortcut properties,
    srl/base/rl/worker.py:25-147)."""

    step: Array  # global env-step counter (per-shard)
    training: Array  # bool
    env_ids: Array  # [B] int32 — actor-ladder index (parity: actor_id epsilon ladders)
    # raw vmapped env state + timestep, for search algorithms that simulate with the
    # env model (the functional analog of env.backup/restore handed to MCTS-family
    # workers, srl/base/env/base.py:86 + mcts.py:88-91). None unless the algorithm
    # sets needs_env_state.
    env_state: Any = None
    timestep: Any = None
    # the full vmapped AutoResetState (env state + step_num + episode reward
    # bookkeeping) — what Go-Explore archives as its restorable snapshot
    autoreset_state: Any = None
    # [B, P] rewards emitted by the PREVIOUS lockstep step (0 at t=0) — the "prev
    # reward" UVFA input and per-episode reward bookkeeping of the Agent57 family
    # (agent57_light.py on_reset/on_step prev_reward_* plumbing)
    prev_rewards: Any = None


@dataclasses.dataclass
class AlgoConfig:
    """Base config. Subclasses add hyperparameters and implement the pure fns."""

    # which representation this algorithm wants (parity: RLConfig base types,
    # srl/base/rl/algorithms/base_ql.py / base_dqn.py)
    observation_type: RLBaseTypes = RLBaseTypes.BOX
    action_type: RLBaseTypes = RLBaseTypes.DISCRETE
    obs_division: int = 10  # quantization grid when discretizing continuous obs
    #: observation processors applied before the RL encode (parity: the processor
    #: chain, srl/base/rl/config.py get_processors + rl/processors/)
    processors: list = dataclasses.field(default_factory=list)
    # Mesh axis name for data-parallel gradient sync; set by DataParallelEngine.
    # Inside train/observe, algorithms pmean/psum their update statistics over this
    # axis so learner replicas stay identical (replaces the reference's parameter
    # board + sync threads, play_mp.py:289-318).
    pmean_axis: Optional[str] = None
    # Fuse each dp_pmean/dp_psum pytree into one flattened collective per dtype
    # instead of one per leaf. Per-collective latency dominates cross-host (DCN)
    # all-reduce cost, so a K-update chunk over an L-leaf grad tree pays K*L
    # round-trips unfused vs K fused. DataParallelEngine turns this on
    # automatically for multi-process meshes; single-host ICI keeps the per-leaf
    # form (XLA's TPU all-reduce combiner already merges those, and skipping the
    # concat avoids an extra params-sized copy on the hot path).
    fuse_collectives: bool = False
    #: True -> the engine passes the raw env state/timestep in PolicyContext so the
    #: policy can run simulations with the env model (MCTS/AlphaZero/MuZero family;
    #: parity: RLConfig.use_backup_restore, srl/algorithms/mcts.py:29-30)
    needs_env_state: bool = False
    #: True -> policy returns (action, new_algo_state): search algorithms accumulate
    #: statistics during action selection (parity: MCTS worker mutating its parameter
    #: in policy + update_parameter_from_worker, mcts.py:66-67,86-103)
    policy_updates_state: bool = False
    #: True -> after each auto-reset the engine offers the algorithm a chance to
    #: replace the fresh reset state with an archived snapshot — the Go-Explore
    #: "return to cell" primitive (parity: env.backup/restore driven exploration,
    #: srl/algorithms/go_explore/go_explore.py archive; trivial here because the
    #: functional env state pytree IS the snapshot)
    uses_archive_restore: bool = False
    #: observation frame stacking (parity: RLConfig.window_length,
    #: srl/base/rl/config.py:338-343 / worker_run.py:316-321). When > 1 the engine
    #: keeps a rolling window of the last W encoded observations per env and the
    #: algorithm sees obs with a leading [W] axis (zero-padded at episode start).
    window_length: int = 1

    def get_name(self) -> str:
        raise NotImplementedError()

    # --- space negotiation (static, trace-time) ---------------------------
    def setup(self, env: EnvCore) -> None:
        """Resolve encoders. Mirrors RLConfig.setup (srl/base/rl/config.py:226-445) but
        produces static transforms instead of mutating runtime state."""
        import jax.numpy as jnp

        from ..spaces import ArrayDiscrete, Box, Discrete as DiscreteSpace

        self.env = env
        all_procs = list(self.processors) + list(self.get_processors(env.observation_space))
        if all_procs:
            from ..processors import apply_processors

            proc_space, proc_fn = apply_processors(env.observation_space, all_procs)
            inner = proc_space.encoder(self.observation_type, division=self.obs_division)
            self.obs_encoder = Encoder(
                inner.space, lambda x: inner.encode(proc_fn(x)), inner.decode
            )
        else:
            self.obs_encoder: Encoder = env.observation_space.encoder(
                self.observation_type, division=self.obs_division
            )
        self.action_encoder: Encoder = env.action_space.encoder(self.action_type, role="action")
        self.action_space: Space = self.action_encoder.space
        # the algorithm acts in the ENCODED action space: a continuous env under a
        # DISCRETE-action algorithm discretizes to Discrete(division) — heads must
        # size to that, not to the env's raw action count (which is 1 for Box
        # actions; round-3 finding: GoDQ/A57 Q-heads built with A=1 on Pendulum)
        self.num_actions: int = (
            self.action_space.n
            if isinstance(self.action_space, DiscreteSpace)
            else env.num_actions
        )

        # frame stacking: env-space -> per-step encode -> stack -> re-encode, same
        # order as the reference (encode then stack, srl/base/rl/config.py:338-343)
        W = self.window_length
        if W <= 1:
            self.obs_space: Space = self.obs_encoder.space
            self.stack_to_obs = None
        else:
            step_space = self.obs_encoder.space
            if isinstance(step_space, DiscreteSpace):
                stacked = ArrayDiscrete(W, 0, step_space.n - 1)
                sub = stacked.encoder(self.observation_type)
                self.obs_space = sub.space
                self.stack_to_obs = lambda win: sub.encode(jnp.asarray(win, jnp.int32))
            elif isinstance(step_space, ArrayDiscrete):
                flatW = ArrayDiscrete(
                    W * step_space.size,
                    tuple(step_space.low_arr.tolist()) * W,
                    tuple(step_space.high_arr.tolist()) * W,
                )
                sub = flatW.encoder(self.observation_type)
                self.obs_space = sub.space
                self.stack_to_obs = lambda win: sub.encode(jnp.asarray(win).reshape(-1))
            else:
                base = step_space
                self.obs_space = Box(
                    (W,) + tuple(base.shape),
                    getattr(base, "low", -jnp.inf),
                    getattr(base, "high", jnp.inf),
                    base.dtype,
                    base.stype,
                )
                self.stack_to_obs = lambda win: win
        self.on_setup()

    def on_setup(self) -> None:
        pass

    def get_processors(self, obs_space: Space) -> list:
        """Algorithm-supplied processors (parity: RLConfig.get_processors — e.g. DQN's
        input block emitting the 84x84-gray Atari pipeline, dqn/dqn.py:106-108)."""
        return []

    # --- pure functions ---------------------------------------------------
    def init(self, key: Array) -> Any:
        raise NotImplementedError()

    def policy(self, state: Any, obs: Any, invalid_mask: Array, ctx: PolicyContext, key: Array) -> Array:
        """Batched action selection: obs leaves have leading dim B; returns [B] actions
        in RL space."""
        raise NotImplementedError()

    # --- recurrent/sequence support (R2D2/Agent57 family) ------------------
    #: True -> the engine threads a per-env actor state (e.g. LSTM hidden) through the
    #: rollout and calls policy_step instead of policy (the TPU analog of WorkerRun's
    #: stateful worker, srl/base/rl/worker_run.py).
    has_actor_state: bool = False
    #: True -> the engine additionally records a per-step view (obs, action, reward,
    #: done, invalid, actor snapshot) and calls observe_chunk with it — sequence
    #: algorithms build replay windows from this instead of the transition slots.
    needs_step_view: bool = False

    def init_actor_state(self, key: Array, num_envs: int) -> Any:
        return None

    def policy_step(
        self,
        state: Any,
        actor: Any,
        obs: Any,
        invalid_mask: Array,
        ctx: PolicyContext,
        key: Array,
        episode_start: Array,
    ):
        """Recurrent action selection; returns (action, new_actor_state).
        ``episode_start`` [B] marks envs whose current obs begins a fresh episode —
        reset recurrent state there."""
        raise NotImplementedError()

    def actor_snapshot(self, actor: Any) -> Any:
        """What to record in the step view BEFORE each step (e.g. the LSTM hidden fed
        into this step, needed to replay burn-in at train time)."""
        return None

    def observe_chunk(self, state: Any, transitions: "Transition", mask: Array, step_view: Any) -> Any:
        """Chunk ingestion for needs_step_view algorithms. ``step_view`` is a StepView
        pytree with leaves [T, B, ...]."""
        return self.observe(state, transitions, mask)

    def archive_restore(self, state: Any, env_state: Any, timestep: Any, was_reset: Array, key: Array):
        """uses_archive_restore hook: for envs where ``was_reset`` is True, optionally
        substitute an archived (AutoResetState, TimeStep) snapshot for the fresh reset.
        Returns (env_state, timestep)."""
        return env_state, timestep

    def observe(self, state: Any, transitions: Transition, mask: Array) -> Any:
        """Ingest one chunk of transitions. Leaves are [T, N, ...] where T = scan steps
        and N = num_envs * (1 + player_num) transition slots per step; ``mask`` [T, N]
        marks valid entries. Time order is preserved for on-policy algorithms (GAE);
        replay algorithms call ``flatten_transitions`` first."""
        return state

    # --- render diagnostics -------------------------------------------------
    def action_values(self, state: Any, obs: Any) -> Optional[Array]:
        """[B, A] per-action diagnostic values (Q-values, visit counts, policy
        probabilities — whatever drives this algorithm's greedy choice) for the
        RL-side render overlay (parity: RLWorker.render_terminal /
        create_render_image, srl/base/rl/worker_run.py:413-543). None if the
        algorithm has no per-action view (continuous control)."""
        return None

    def render_info(self, state: Any, obs: Any, invalid_mask: Array, action_to_str=str) -> str:
        """Host-side textual policy view at one (unbatched) encoded obs."""
        import numpy as np

        batched = jax.tree.map(lambda x: jnp.asarray(x)[None], obs)
        vals = self.action_values(state, batched)
        if vals is None:
            return ""
        vals = np.asarray(vals)[0]
        mask = np.asarray(invalid_mask)
        best = int(np.argmax(np.where(mask, -np.inf, vals)))
        lines = []
        for a in range(len(vals)):
            mark = "*" if a == best else " "
            inv = " (invalid)" if bool(mask[a]) else ""
            lines.append(f"{mark}{action_to_str(a)}: {vals[a]:8.5f}{inv}")
        return "\n".join(lines)

    # --- data-parallel sync helpers ----------------------------------------
    def dp_psum(self, x):
        """Sum ``x`` (array or pytree) across data-parallel replicas. Identity when
        not running under a dp mesh. Tabular algorithms psum their table DELTAS with
        this so learner replicas stay bit-identical — the tabular analog of gradient
        pmean (replaces the reference's trainer-process aggregation,
        base/run/play_mp.py:248-286)."""
        return self._dp_reduce(x, jax.lax.psum)

    def dp_pmean(self, x):
        return self._dp_reduce(x, jax.lax.pmean)

    def _dp_reduce(self, x, red):
        if self.pmean_axis is None:
            return x
        leaves, treedef = jax.tree.flatten(x)
        if not self.fuse_collectives or len(leaves) <= 1:
            return jax.tree.unflatten(
                treedef, [red(v, self.pmean_axis) for v in leaves]
            )
        # One collective per dtype: ravel+concat the leaves, reduce the single
        # vector, split back (static shapes, trace-time bookkeeping only).
        by_dtype: dict = {}
        for i, v in enumerate(leaves):
            by_dtype.setdefault(jnp.asarray(v).dtype, []).append(i)
        out = [None] * len(leaves)
        for idxs in by_dtype.values():
            if len(idxs) == 1:
                out[idxs[0]] = red(leaves[idxs[0]], self.pmean_axis)
                continue
            vec = red(
                jnp.concatenate([jnp.ravel(leaves[i]) for i in idxs]),
                self.pmean_axis,
            )
            off = 0
            for i in idxs:
                n = int(jnp.asarray(leaves[i]).size)
                out[i] = jnp.reshape(vec[off : off + n], jnp.shape(leaves[i]))
                off += n
        return jax.tree.unflatten(treedef, out)

    @staticmethod
    def flatten_transitions(transitions: Transition, mask: Array) -> Tuple[Transition, Array]:
        flat = jax.tree.map(
            lambda x: x.reshape((x.shape[0] * x.shape[1],) + x.shape[2:]), transitions
        )
        return flat, mask.reshape(-1)

    def train(self, state: Any, key: Array, num_steps: int) -> Tuple[Any, Dict[str, Array]]:
        """Run ``num_steps`` (static) parameter updates."""
        return state, {}

    # --- cadence ----------------------------------------------------------
    @property
    def train_interval(self) -> int:
        """Env steps (per instance) between train calls (parity: RunContext
        train_interval)."""
        return 1

    # --- persistence ------------------------------------------------------
    def params_of(self, state: Any) -> Any:
        """The pytree that constitutes the learned parameters (for checkpoint/eval
        sync; parity: RLParameter.call_backup, srl/base/rl/parameter.py:56)."""
        return state

    def restore_params(self, state: Any, params: Any) -> Any:
        return params
