"""The vectorized play engine — one jitted rollout+update chunk.

This replaces the reference's entire run-engine layer: the per-step python hot loop
(core_play.py:115-214), the worker state machine with its 1-step-delayed per-player
transition view (srl/base/rl/worker_run.py:107-358), and the mp actor-learner pipeline
(play_mp.py / play_mp_memory.py). Design:

  - B env instances step in LOCKSTEP under ``vmap``; a ``lax.scan`` unrolls T steps;
    the algorithm's train updates run right after, all inside ONE ``jit``. The only
    host↔device sync is once per chunk (metrics readback), vs once per step in the
    reference — this is what buys the >=1M env-steps/s target.
  - Multi-player turn rotation (core_play.py:151-156) becomes masked lockstep updates:
    each env carries a per-player "pending transition" slot; when a player acts again
    (or the episode ends) its pending transition completes and is emitted. Single-player
    envs are the P=1 degenerate case of the same code path.
  - Auto-reset per instance replaces the episode restart branch (core_play.py:138-159).
  - Per-player policies ("players" — None = trained policy, "random" = uniform over
    valid actions; parity: srl/base/rl/registration.py:149-225) are computed in lockstep
    and selected per env via the acting player's code.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..algorithms.base import AlgoConfig, PolicyContext, Transition
from ..envs.core import AutoResetEnv, EnvCore
from ..spaces import Discrete

Array = jax.Array

# player codes (static)
MAIN = 0
RANDOM = 1
WORKER0 = 2  # first env-provided worker policy (parity: EnvBase.make_worker)
OPP0 = 1000  # first nested-algorithm opponent (parity: RLConfig entries in the
#              players list with their own parameter, base/rl/registration.py:149-225)


def resolve_players(
    players: Optional[Sequence], player_num: int, worker_names: Sequence[str] = ()
) -> Tuple[List[int], List[Tuple[Any, Any]]]:
    """Map a reference-style players list (None / "random" / env worker name /
    AlgoConfig / (AlgoConfig, params), parity: srl/base/rl/registration.py
    make_workers player specs incl. nested RLConfigs with their own parameter) to
    static codes. Env worker names resolve to WORKER0 + index into the env's
    ``worker_names``; algorithm-config specs resolve to OPP0 + index into the returned
    opponent list of (config, params-or-None)."""
    if players is None:
        players = [None] * player_num
    players = list(players) + [None] * (player_num - len(players))
    codes: List[int] = []
    opponents: List[Tuple[Any, Any]] = []
    for p in players[:player_num]:
        if p is None:
            codes.append(MAIN)
        elif isinstance(p, str) and p == "random":
            codes.append(RANDOM)
        elif isinstance(p, str) and p in worker_names:
            codes.append(WORKER0 + list(worker_names).index(p))
        elif isinstance(p, AlgoConfig) or (
            isinstance(p, tuple) and len(p) == 2 and isinstance(p[0], AlgoConfig)
        ):
            cfg, params = (p, None) if isinstance(p, AlgoConfig) else p
            codes.append(OPP0 + len(opponents))
            opponents.append((cfg, params))
        else:
            raise ValueError(
                f"unsupported player spec: {p!r} (None / 'random' / one of "
                f"{tuple(worker_names)} / AlgoConfig / (AlgoConfig, params))"
            )
    return codes, opponents


@struct.dataclass
class PendingState:
    """Per-(env, player) open transition: the state/action a player committed, waiting
    for its next turn (or episode end) to learn its outcome. The TPU-native form of
    WorkerRun's prev/state/next aliasing (srl/base/rl/worker_run.py:107-228)."""

    obs: Any  # [B, P, ...] encoded
    action: Any  # [B, P, ...] RL-space
    reward: Array  # [B, P] accumulated since the pending action
    invalid: Array  # [B, P, A]
    active: Array  # [B, P] bool


@struct.dataclass
class EngineState:
    key: Array
    env_state: Any  # vmapped AutoResetState
    ts: Any  # vmapped TimeStep
    enc_obs: Any  # [B, ...] current encoded observation
    obs_window: Any  # [B, W, ...] rolling per-step-encoded obs (None when W == 1)
    pending: PendingState
    algo_state: Any
    actor_state: Any  # per-env recurrent policy state (None for stateless algos)
    step: Array  # int32 lockstep counter (one unit = B parallel env steps)
    episode_count: Array  # int32 completed episodes (cumulative)
    episode_reward_sum: Array  # [P] sum of finished-episode total rewards
    env_steps: Array  # int64-ish total env steps (B per lockstep)
    # per-opponent recurrent policy states (tuple aligned with engine.opponents;
    # None entries for stateless opponents; () when no nested opponents)
    opp_actor_states: Any = ()


class PlayEngine:
    """Builds jitted chunk functions for (env, algorithm, num_envs, players)."""

    def __init__(
        self,
        env: EnvCore,
        algo: AlgoConfig,
        num_envs: int,
        players: Optional[Sequence] = None,
        max_episode_steps: Optional[int] = None,
        frameskip: int = 0,
        random_noop_max: int = 0,
        env_id_offset: int = 0,
    ):
        self.env = env
        self.algo = algo
        self.num_envs = int(num_envs)
        # distributed actors shift their exploration-ladder indices so per-actor
        # epsilon/beta ladders stay globally unique (parity: actor_id in
        # setup_from_actor, srl/base/rl/config.py:184)
        self.env_id_offset = int(env_id_offset)
        self.is_host_batched = bool(getattr(env, "is_host_batched", False))
        if self.is_host_batched:
            # host env pool (gym adapter): natively batched auto-reset — one ordered
            # host callback per lockstep step, B dedicated instances by slot id
            assert not algo.needs_env_state, (
                "search algorithms need a jittable env model; host (gym) envs "
                "cannot be simulated inside the compiled chunk"
            )
            self.aenv = env.make_batched_autoreset(
                num_envs, max_episode_steps, frameskip, random_noop_max
            )
        else:
            self.aenv = AutoResetEnv(env, max_episode_steps, frameskip, random_noop_max)
        self.player_codes, opp_specs = resolve_players(
            players, env.player_num, env.worker_names
        )
        # nested-algorithm opponents: each gets its own encoders + (frozen) state;
        # states are captured as constants of the jitted chunk (they never train here)
        self.opponents = []
        for i, (opp_cfg, opp_params) in enumerate(opp_specs):
            opp_cfg.setup(env)
            assert getattr(opp_cfg, "window_length", 1) == 1, (
                "window-stacked algorithms are not supported as opponent players "
                "yet — use them as the main algorithm"
            )
            opp_state = opp_cfg.init(jax.random.PRNGKey(97_000 + i))
            if opp_params is not None:
                opp_state = opp_cfg.restore_params(opp_state, opp_params)
            # loaded params may be host numpy — move to device arrays so the policy
            # can index them with tracers inside the jitted chunk
            opp_state = jax.tree.map(jnp.asarray, opp_state)
            self.opponents.append((opp_cfg, opp_state))
        self.P = env.player_num
        self.A = env.num_actions
        self.is_discrete_action = isinstance(env.action_space, Discrete)

        # vmapped env fns (host-batched envs carry the batch inside ONE callback)
        if self.is_host_batched:
            self._v_reset = self.aenv.reset_batch
            self._v_step = self.aenv.step_batch
        else:
            self._v_reset = jax.vmap(self.aenv.reset)
            self._v_step = jax.vmap(self.aenv.step)
        self._v_act_dec = jax.vmap(algo.action_encoder.decode)
        self._v_act_enc = jax.vmap(algo.action_encoder.encode)
        self._v_sample = jax.vmap(env.action_space.sample)

        # observation pipeline: per-step encode, then optional frame stacking
        # (window_length parity, srl/base/rl/worker_run.py:316-321)
        self.W = int(getattr(algo, "window_length", 1))
        self._v_step_obs_enc = jax.vmap(algo.obs_encoder.encode)
        if self.W > 1:
            self._v_stack = jax.vmap(algo.stack_to_obs)

    def _push_window(self, window, step_obs, was_reset):
        """Roll the [B, W, ...] window left, zeroing on episode reset, and insert the
        new per-step encoded obs at the end."""

        def upd(win, so):
            z = jnp.zeros_like(win)
            m = was_reset.reshape((-1,) + (1,) * (win.ndim - 1))
            win = jnp.where(m, z, win)
            win = jnp.roll(win, -1, axis=1)
            return win.at[:, -1].set(so)

        return jax.tree.map(upd, window, step_obs)

    def _encode_obs(self, window, raw_obs, was_reset):
        """Returns (new_window, final encoded obs [B, ...])."""
        step_obs = self._v_step_obs_enc(raw_obs)
        if self.W <= 1:
            return None, step_obs
        window = self._push_window(window, step_obs, was_reset)
        return window, self._v_stack(window)

    # ------------------------------------------------------------------
    def init(self, key: Array) -> EngineState:
        k_env, k_algo, key = jax.random.split(key, 3)
        env_state, ts = self._v_reset(jax.random.split(k_env, self.num_envs))
        if self.W > 1:
            step_obs = self._v_step_obs_enc(ts.obs)
            window = jax.tree.map(
                lambda x: jnp.zeros((x.shape[0], self.W) + x.shape[1:], x.dtype), step_obs
            )
            window = jax.tree.map(lambda w, s: w.at[:, -1].set(s), window, step_obs)
            enc_obs = self._v_stack(window)
        else:
            window = None
            enc_obs = self._v_step_obs_enc(ts.obs)
        # algorithms with per-env carried structures (e.g. NoTarget_DQN's episode
        # tracking buffer) size them from this hint
        self.algo.num_envs_hint = self.num_envs
        algo_state = self.algo.init(k_algo)

        B, P = self.num_envs, self.P
        rl_a_example = self._v_act_enc(self._v_sample(jax.random.split(key, B), None))
        pending = PendingState(
            obs=jax.tree.map(lambda x: jnp.zeros((B, P) + x.shape[1:], x.dtype), enc_obs),
            action=jax.tree.map(lambda x: jnp.zeros((B, P) + x.shape[1:], x.dtype), rl_a_example),
            reward=jnp.zeros((B, P), jnp.float32),
            invalid=jnp.zeros((B, P, self.A), jnp.bool_),
            active=jnp.zeros((B, P), jnp.bool_),
        )
        opp_actor_states = tuple(
            (opp_cfg.init_actor_state(jax.random.PRNGKey(98_000 + i), B)
             if opp_cfg.has_actor_state else None)
            for i, (opp_cfg, _) in enumerate(self.opponents)
        )
        return EngineState(
            key=key,
            env_state=env_state,
            ts=ts,
            enc_obs=enc_obs,
            obs_window=window,
            pending=pending,
            algo_state=algo_state,
            actor_state=self.algo.init_actor_state(key, self.num_envs),
            step=jnp.asarray(0, jnp.int32),
            episode_count=jnp.asarray(0, jnp.int32),
            episode_reward_sum=jnp.zeros((P,), jnp.float32),
            env_steps=jnp.asarray(0, jnp.int32),
            opp_actor_states=opp_actor_states,
        )

    # ------------------------------------------------------------------
    def _select_actions(self, carry: EngineState, training: bool, keys) -> Tuple[Any, Any, Any]:
        """Returns (env_action [B,...], rl_action [B,...], new_actor_state) for the
        acting players."""
        k_policy, k_rand = keys
        B = self.num_envs
        ts = carry.ts
        ctx = PolicyContext(
            step=carry.step,
            training=jnp.asarray(training, jnp.bool_),
            env_ids=jnp.arange(B, dtype=jnp.int32) + self.env_id_offset,
            env_state=carry.env_state.env_state if self.algo.needs_env_state else None,
            timestep=ts if self.algo.needs_env_state else None,
            autoreset_state=carry.env_state if self.algo.needs_env_state else None,
            prev_rewards=ts.rewards,
        )
        algo_state = carry.algo_state
        if self.algo.has_actor_state:
            episode_start = carry.env_state.step_num == 0
            out = self.algo.policy_step(
                algo_state,
                carry.actor_state,
                carry.enc_obs,
                ts.invalid_mask,
                ctx,
                k_policy,
                episode_start,
            )
            if self.algo.policy_updates_state:
                a_rl, actor_state, algo_state = out
            else:
                a_rl, actor_state = out
        elif self.algo.policy_updates_state:
            a_rl, algo_state = self.algo.policy(
                algo_state, carry.enc_obs, ts.invalid_mask, ctx, k_policy
            )
            actor_state = carry.actor_state
        else:
            a_rl = self.algo.policy(algo_state, carry.enc_obs, ts.invalid_mask, ctx, k_policy)
            actor_state = carry.actor_state
        a_env = self._v_act_dec(a_rl)

        if all(c == MAIN for c in self.player_codes):
            return a_env, a_rl, actor_state, algo_state, carry.opp_actor_states

        a_rand_env = self._v_sample(jax.random.split(k_rand, B), ts.invalid_mask)
        codes = jnp.asarray(self.player_codes, jnp.int32)[ts.next_player]  # [B]
        is_main = codes == MAIN

        def sel(m, r, mask):
            mask = mask.reshape((B,) + (1,) * (m.ndim - 1))
            return jnp.where(mask, m, r)

        a_env_sel = jax.tree.map(lambda m, r: sel(m, r, is_main), a_env, a_rand_env)

        # env-provided worker policies (parity: EnvBase.make_worker opponents) — one
        # vmapped policy per distinct worker name in the players list
        used = sorted({c for c in self.player_codes if WORKER0 <= c < OPP0})
        for code in used:
            name = self.env.worker_names[code - WORKER0]
            k_rand, k_w = jax.random.split(k_rand)
            a_w = jax.vmap(lambda s, t, k: self.env.worker_policy(name, s, t, k))(
                carry.env_state.env_state, ts, jax.random.split(k_w, B)
            )
            a_env_sel = jax.tree.map(
                lambda w, cur: sel(w, cur, codes == code), a_w, a_env_sel
            )

        # nested-algorithm opponents (parity: RLConfig players with own parameter,
        # base/rl/registration.py:149-225) — frozen policies computed in lockstep;
        # recurrent opponents carry their per-env actor state in the engine carry
        used_opp = sorted({c for c in self.player_codes if c >= OPP0})
        opp_actor_states = list(carry.opp_actor_states)
        for code in used_opp:
            opp_cfg, opp_state = self.opponents[code - OPP0]
            k_rand, k_o = jax.random.split(k_rand)
            enc_o = jax.vmap(opp_cfg.obs_encoder.encode)(ts.obs)
            octx = PolicyContext(
                step=carry.step,
                training=jnp.asarray(False, jnp.bool_),
                env_ids=jnp.arange(B, dtype=jnp.int32) + self.env_id_offset,
                env_state=carry.env_state.env_state if opp_cfg.needs_env_state else None,
                timestep=ts if opp_cfg.needs_env_state else None,
                autoreset_state=carry.env_state if opp_cfg.needs_env_state else None,
                prev_rewards=ts.rewards,
            )
            if opp_cfg.has_actor_state:
                out = opp_cfg.policy_step(
                    opp_state, opp_actor_states[code - OPP0], enc_o, ts.invalid_mask,
                    octx, k_o, carry.env_state.step_num == 0,
                )
                a_o_rl, opp_actor = out[0], out[1]  # trailing algo-state ignored (frozen)
                # advance the recurrent state only on the opponent's own turns; on
                # episode start that is NOT the opponent's turn, reset to the init
                # state so the previous episode's hidden never leaks (the in-call
                # episode_start reset would otherwise be discarded by the take mask
                # whenever player 0 moves first — round-2 advisor finding)
                take = codes == code
                episode_start = carry.env_state.step_num == 0
                init_st = opp_cfg.init_actor_state(
                    jax.random.PRNGKey(98_000 + (code - OPP0)), B
                )
                opp_actor_states[code - OPP0] = jax.tree.map(
                    lambda new, old, ini: sel(new, sel(ini, old, episode_start), take),
                    opp_actor, opp_actor_states[code - OPP0], init_st,
                )
            else:
                a_o_rl = opp_cfg.policy(opp_state, enc_o, ts.invalid_mask, octx, k_o)
                if opp_cfg.policy_updates_state:
                    a_o_rl = a_o_rl[0]
            a_o = jax.vmap(opp_cfg.action_encoder.decode)(a_o_rl)
            a_env_sel = jax.tree.map(
                lambda w, cur: sel(w, cur, codes == code), a_o, a_env_sel
            )
        return a_env_sel, a_rl, actor_state, algo_state, tuple(opp_actor_states)

    # ------------------------------------------------------------------
    def _rollout_step(self, carry: EngineState, training: bool):
        B, P = self.num_envs, self.P
        key, k_policy, k_rand, k_env = jax.random.split(carry.key, 4)
        ts = carry.ts
        p = ts.next_player  # [B]
        idx = jnp.arange(B)
        pending = carry.pending

        actor_snapshot = (
            self.algo.actor_snapshot(carry.actor_state) if self.algo.needs_step_view else None
        )
        episode_start = carry.env_state.step_num == 0
        a_env, a_rl, actor_state, algo_state_post_policy, opp_actor_states = (
            self._select_actions(carry, training, (k_policy, k_rand))
        )

        codes = jnp.asarray(self.player_codes, jnp.int32)[p]
        # when the previous timestep ended the episode, this step is an auto-reset: the
        # policy's action is discarded, so no pending transition may open from the
        # terminal observation
        live = jnp.logical_not(jnp.logical_or(ts.terminated, ts.truncated))
        is_main = (codes == MAIN) & live

        # P == 1 fast path: the acting player is always slot 0 — XLA only sees
        # p as a dynamic [B] array, so without this the per-(env,player) pending
        # ops lower to batched gathers/scatters every rollout step
        if P == 1:
            def get_p(x):
                return x[:, 0]

            def at_p(buf, val, mask):
                m = mask.reshape((B,) + (1,) * (val.ndim - 1))
                return jnp.where(m, val, buf[:, 0])[:, None]
        else:
            def get_p(x):
                return x[idx, p]

            def at_p(buf, val, mask):
                m = mask.reshape((B,) + (1,) * (val.ndim - 1))
                return buf.at[idx, p].set(jnp.where(m, val, buf[idx, p]))

        # --- T1: acting player's previous pending completes (sees current obs)
        t1 = Transition(
            obs=jax.tree.map(lambda x: get_p(x)[:, None], pending.obs),
            action=jax.tree.map(lambda x: get_p(x)[:, None], pending.action),
            reward=get_p(pending.reward)[:, None],
            next_obs=jax.tree.map(lambda x: x[:, None], carry.enc_obs),
            undone=jnp.ones((B, 1), jnp.float32),
            invalid_mask=get_p(pending.invalid)[:, None],
            next_invalid_mask=ts.invalid_mask[:, None],
        )
        t1_mask = (get_p(pending.active) & is_main)[:, None]  # [B, 1]

        # --- open new pending for acting main players
        pending = PendingState(
            obs=jax.tree.map(lambda b, v: at_p(b, v, is_main), pending.obs, carry.enc_obs),
            action=jax.tree.map(lambda b, v: at_p(b, v, is_main), pending.action, a_rl),
            reward=at_p(pending.reward, jnp.zeros((B,)), is_main),
            invalid=at_p(pending.invalid, ts.invalid_mask, is_main),
            active=at_p(pending.active, jnp.ones((B,), bool), is_main),
        )

        # --- env lockstep
        env_state, ts2 = self._v_step(carry.env_state, ts, a_env, jax.random.split(k_env, B))
        if self.algo.uses_archive_restore and training:
            # Go-Explore return-to-cell: replace fresh resets with archived snapshots
            key, k_arch = jax.random.split(key)
            env_state, ts2 = self.algo.archive_restore(
                algo_state_post_policy, env_state, ts2, jnp.logical_not(live), k_arch
            )
        pending = pending.replace(
            reward=pending.reward + ts2.rewards * pending.active.astype(jnp.float32)
        )

        # --- T2: episode end flushes every pending slot with the terminal view
        was_reset = jnp.logical_not(live)  # this step performed an auto-reset
        window2, enc_obs2 = self._encode_obs(carry.obs_window, ts2.obs, was_reset)
        done = jnp.logical_or(ts2.terminated, ts2.truncated)  # [B]
        undone2 = jnp.where(ts2.terminated, 0.0, 1.0)
        t2 = Transition(
            obs=pending.obs,
            action=pending.action,
            reward=pending.reward,
            next_obs=jax.tree.map(
                lambda x: jnp.broadcast_to(x[:, None], (B, P) + x.shape[1:]), enc_obs2
            ),
            undone=jnp.broadcast_to(undone2[:, None], (B, P)),
            invalid_mask=pending.invalid,
            next_invalid_mask=jnp.broadcast_to(ts2.invalid_mask[:, None], (B, P, self.A)),
        )
        t2_mask = pending.active & done[:, None]  # [B, P]
        pending = pending.replace(active=pending.active & jnp.logical_not(done)[:, None])

        # --- merge transition slots: [B, 1+P] -> flat [B*(1+P)]
        def cat(a, b):
            flat_shape = (B * (1 + P),) + a.shape[2:]
            return jnp.concatenate([a, b], axis=1).reshape(flat_shape)

        transitions = jax.tree.map(cat, t1, t2)
        mask = jnp.concatenate([t1_mask, t2_mask], axis=1).reshape(B * (1 + P))
        if not training:
            mask = jnp.zeros_like(mask)

        if self.algo.needs_step_view:
            from ..algorithms.base import StepView

            acting_reward = get_p(ts2.rewards)  # the acting player's immediate reward
            step_view = StepView(
                obs=carry.enc_obs,
                action=a_rl,
                reward=acting_reward,
                terminated=ts2.terminated,
                truncated=ts2.truncated,
                invalid_mask=ts.invalid_mask,
                episode_start=episode_start,
                actor_snapshot=actor_snapshot,
            )
        else:
            step_view = None

        new_carry = EngineState(
            key=key,
            env_state=env_state,
            ts=ts2,
            enc_obs=enc_obs2,
            obs_window=window2,
            pending=pending,
            algo_state=algo_state_post_policy,
            actor_state=actor_state,
            step=carry.step + 1,
            episode_count=carry.episode_count + jnp.sum(done.astype(jnp.int32)),
            episode_reward_sum=carry.episode_reward_sum
            + jnp.sum(
                jnp.where(done[:, None], env_state.last_episode_reward, 0.0), axis=0
            ),
            env_steps=carry.env_steps + B,
            opp_actor_states=opp_actor_states,
        )
        return new_carry, (transitions, mask, step_view)

    # ------------------------------------------------------------------
    def build_chunk(
        self,
        chunk_steps: int,
        train_steps_per_chunk: Optional[int] = None,
        training: bool = True,
        chunks_per_call: int = 1,
    ):
        """Compile: T lockstep rollout steps (scan) -> one batched memory write ->
        K train updates. Returns jitted fn: EngineState -> (EngineState, metrics).

        ``chunks_per_call`` > 1 scans several chunks inside ONE jit call: XLA updates
        the replay/param buffers in place across the inner iterations, so the
        unavoidable copy of the carry at the host-call boundary amortizes — this is
        the cheap, alias-safe alternative to buffer donation (env obs may alias env
        state, which XLA's donation checker rejects)."""
        if train_steps_per_chunk is None:
            train_steps_per_chunk = max(1, chunk_steps // self.algo.train_interval) if training else 0

        def chunk(carry: EngineState):
            def body(c, _):
                return self._rollout_step(c, training)

            carry, (transitions, masks, step_views) = jax.lax.scan(
                body, carry, None, length=chunk_steps
            )
            metrics: Dict[str, Array] = {}
            if training:
                # transitions keep their scan structure [T, B*(1+P), ...] — on-policy
                # algorithms need time order for GAE; replay algorithms flatten via
                # base.flatten_transitions
                if self.algo.needs_step_view:
                    algo_state = self.algo.observe_chunk(
                        carry.algo_state, transitions, masks, step_views
                    )
                else:
                    algo_state = self.algo.observe(carry.algo_state, transitions, masks)
                key, k_train = jax.random.split(carry.key)
                if train_steps_per_chunk > 0:
                    algo_state, metrics = self.algo.train(algo_state, k_train, train_steps_per_chunk)
                carry = carry.replace(algo_state=algo_state, key=key)
            return carry, metrics

        if chunks_per_call <= 1:
            return jax.jit(chunk)

        def multi_chunk(carry: EngineState):
            def body(c, _):
                c, m = chunk(c)
                return c, m

            carry, metrics = jax.lax.scan(body, carry, None, length=chunks_per_call)
            return carry, jax.tree.map(lambda x: x[-1], metrics)

        return jax.jit(multi_chunk)

    def build_collect_chunk(self, chunk_steps: int, compact_frames: bool = False):
        """Compile an EXPERIENCE-COLLECTION chunk for distributed actors: T lockstep
        rollout steps with the training policy, returning the raw experience pytree
        instead of ingesting it (the remote trainer owns the replay). This is the
        TPU-native form of the reference's actor-side memory interceptor
        (srl/runner/distribution/server_actor.py memory sender + play loop).

        ``compact_frames=True`` dedups ON DEVICE before the host transfer: the
        window-stacked obs/next_obs (W-fold redundant) are reduced to their
        newest frames inside the jit, so the d2h payload for a W=4 Atari chunk
        shrinks 4x — host frame-dedup replay reconstructs the stacks exactly
        (memories/host_replay.py). Returns (carry, (compact_dict, mask))."""

        def collect(carry: EngineState):
            def body(c, _):
                return self._rollout_step(c, training=True)

            carry, (transitions, masks, step_views) = jax.lax.scan(
                body, carry, None, length=chunk_steps
            )
            if compact_frames:
                W = self.W
                newest = (lambda x: x[:, :, W - 1]) if W > 1 else (lambda x: x)
                compact = {
                    "obs_newest": jax.tree.map(newest, transitions.obs),
                    "next_newest": jax.tree.map(newest, transitions.next_obs),
                    "action": transitions.action,
                    "reward": transitions.reward,
                    "undone": transitions.undone,
                }
                return carry, (compact, masks)
            return carry, (transitions, masks, step_views)

        return jax.jit(collect)

    # ------------------------------------------------------------------
    def build_eval(
        self,
        num_episodes: int,
        max_steps: Optional[int] = None,
        chunk_steps: int = 32,
    ):
        """Jitted evaluation: run ``num_episodes`` envs until each finishes one episode,
        return per-player mean episode reward. Parity: Runner.evaluate /
        evaluate_compare_to_baseline (runner/runner.py:724,1357).

        TPU-idiomatic early exit: a lax.while_loop over ``chunk_steps``-long scans
        stops as soon as every env has recorded an episode, so long-horizon envs
        (gym adapters, 1000-step caps) whose episodes end early don't pay the full
        worst-case scan; the step budget stays bounded by max_episode_steps.

        Returns a jitted fn ``(algo_state, key) -> (rewards [B, P], recorded [B],
        steps_run)``: per-env first-episode rewards, which envs actually finished
        one (so partial means average only RECORDED episodes — the reference
        averages finished episodes only, runner/runner.py:724), and how many
        lockstep rollout steps the while-loop executed (observable early-exit)."""
        B = int(num_episodes)
        steps = int(max_steps or (self.aenv.max_episode_steps * max(1, self.P) + 2))
        chunk = max(1, min(int(chunk_steps), steps))
        n_chunks_cap = -(-steps // chunk)  # ceil
        eval_engine = PlayEngine(
            self.env, self.algo, B, players=None, max_episode_steps=self.aenv.max_episode_steps
        )
        eval_engine.player_codes = self.player_codes
        eval_engine.opponents = self.opponents

        def eval_fn(algo_state: Any, key: Array):
            carry = eval_engine.init(key)
            carry = carry.replace(algo_state=algo_state)
            recorded = jnp.zeros((B,), jnp.bool_)
            rewards = jnp.zeros((B, self.P), jnp.float32)

            def body(c, _):
                carry, recorded, rewards = c
                new_carry, _ = eval_engine._rollout_step(carry, training=False)
                done = jnp.logical_or(new_carry.ts.terminated, new_carry.ts.truncated)
                first = done & jnp.logical_not(recorded)
                rewards = jnp.where(
                    first[:, None], new_carry.env_state.last_episode_reward, rewards
                )
                recorded = recorded | done
                return (new_carry, recorded, rewards), None

            def chunk_body(loop_state):
                (carry, recorded, rewards), i = loop_state
                out, _ = jax.lax.scan(
                    body, (carry, recorded, rewards), None, length=chunk
                )
                return out, i + 1

            def cond(loop_state):
                (_, recorded, _), i = loop_state
                return jnp.logical_and(
                    jnp.logical_not(jnp.all(recorded)), i < n_chunks_cap
                )

            (carry, recorded, rewards), n_chunks = jax.lax.while_loop(
                cond, chunk_body, ((carry, recorded, rewards), jnp.asarray(0, jnp.int32))
            )
            return rewards, recorded, n_chunks * chunk

        return jax.jit(eval_fn)
