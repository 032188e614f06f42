"""Exact-parity harness vs the reference implementation (BASELINE.md target: "QL
tabular on Grid — exact trajectory/return match vs reference under fixed seed").

Bit-identical trajectories across different RNG engines are impossible (the compiled
path uses threefry, the reference uses Mersenne python/numpy randomness), so parity is
established the way SURVEY.md §7 prescribes: a host-side loop that reproduces the
reference's EXACT semantics — same RNG streams consumed in the same order (python
``random`` for start cells / ε-greedy / tie-breaks, ``np.random`` for transition
slips; core_play.py:76-80,138-159, ql.py:148-165, grid.py:173-208), same float64 QL
update arithmetic — driven against THIS framework's Grid dynamics tables. The test
then runs the actual reference package side by side and asserts the full
(state, action, reward, done) sequence and the learned Q tables match exactly.
"""

from __future__ import annotations

import random
from typing import List, Optional, Tuple

import numpy as np

from .envs.grid import Grid


def run_parity_ql_grid(
    seed: int,
    max_steps: int,
    epsilon: float = 0.1,
    lr: float = 0.1,
    discount: float = 0.9,
    env: Optional[Grid] = None,
    collect: bool = False,
) -> Tuple[List[tuple], dict]:
    """Host-side QL-on-Grid with reference-exact semantics. Returns
    (trajectory [(state, action, reward, done), ...], Q dict keyed like the
    reference's ``to_str`` states). With ``collect=True`` also returns an aux dict:
    ``moves`` (the sampled slip outcome per real env step) and ``train_stream``
    (every Q update in the exact order applied) — the decision record that drives
    the compiled engine in run_engine_ql_grid."""
    env = env or Grid()
    random.seed(seed)
    np.random.seed(seed)
    # core_play.py:79 — one randint for the (unused-by-Grid) episode seed
    _episode_seed = random.randint(0, 2 ** (16 - 4))

    Q: dict = {}

    def get_q(state_key):
        if state_key not in Q:
            Q[state_key] = [0.0, 0.0, 0.0, 0.0]
        return Q[state_key]

    def to_key(pos) -> str:
        # ArrayDiscreteSpace.to_str joins with ","
        return f"{pos[0]},{pos[1]}"

    train_stream: List[tuple] = []

    def train_on(t):
        # trainer QL update (ql.py:106-132), float64 python arithmetic
        s_key, a_t, r_t, terminated_t, n_key = t
        train_stream.append(t)
        target = r_t
        if not terminated_t:
            nq = get_q(n_key)
            target += discount * max(nq)
        td = target - get_q(s_key)[a_t]
        Q[s_key][a_t] += lr * td

    trajectory = []
    moves: List[int] = []
    pos = None
    done = True
    steps = 0
    # WorkerRun's 1-step-delayed view (worker_run.py:107-228): the transition of step
    # t reaches the memory during policy(t+1) (or immediately at episode end), so the
    # trainer pass at the end of step t covers transition t-1 (plus t when done)
    pending = None

    while steps < max_steps:
        if done:
            # Grid.reset (grid.py:173-176): random.choice over start cells
            pos = random.choice([tuple(p) for p in env.start_xy.tolist()])
            done = False

        # --- worker.policy (ql.py:148-165)
        state_key = to_key(pos)
        q = get_q(state_key)
        if random.random() < epsilon:
            action = random.choice([0, 1, 2, 3])
        else:
            mx = max(q)
            max_list = [i for i, v in enumerate(q) if v == mx]
            action = max_list[0] if len(max_list) == 1 else random.choice(max_list)

        # --- env.step (grid.py:188-208): slip via np.random.choice over the action's
        # move distribution, in the reference's dict iteration order (UP,DOWN,RIGHT,LEFT
        # reordered per action — we mirror action_probs rows exactly)
        probs_row = env.action_probs[action]
        # the reference iterates its per-action dict {UP:..., DOWN:..., RIGHT:..., LEFT:...}
        ref_order = _REF_DICT_ORDER[action]
        probs = [float(probs_row[m]) for m in ref_order]
        move = ref_order[np.random.choice(len(probs), p=probs)]
        moves.append(move)
        npos = env._move_host(pos[0], pos[1], move)
        reward, terminated = env._reward_done(npos[0], npos[1])
        steps += 1
        step_in_episode = trajectory[-1][4] + 1 if trajectory and not trajectory[-1][3] else 1
        # reference truncation is STRICTLY greater (env_run.py:361): episodes may run
        # max_episode_steps + 1 steps
        truncated = step_in_episode > env.max_episode_steps and not terminated
        done = terminated or truncated

        trajectory.append((tuple(pos), action, float(reward), bool(done), step_in_episode))

        # --- trainer pass at the end of the step: the delayed transition first,
        # then (at episode end) the just-finished one
        n_key = to_key(npos)
        transition = (state_key, action, float(reward), bool(terminated), n_key)
        if pending is not None:
            train_on(pending)
            pending = None
        if done:
            train_on(transition)
        else:
            pending = transition

        pos = npos

    if collect:
        return trajectory, Q, {"moves": moves, "train_stream": train_stream}
    return trajectory, Q


# the reference's action_probs dicts iterate in insertion order (grid.py:121-146):
# for UP/DOWN rows: {UP, DOWN, RIGHT, LEFT}; for RIGHT/LEFT rows: {UP, DOWN, RIGHT, LEFT}
_REF_DICT_ORDER = {
    3: [3, 1, 2, 0],  # UP row: UP, DOWN, RIGHT, LEFT
    1: [3, 1, 2, 0],  # DOWN row
    2: [3, 1, 2, 0],  # RIGHT row
    0: [3, 1, 2, 0],  # LEFT row
}


# ---------------------------------------------------------------------------
# Engine-in-the-loop parity: the SAME decision sequence (actions + env slips)
# recorded from the host harness drives the COMPILED PlayEngine at B=1, so the
# jitted core loop itself — pending-transition machinery, auto-reset accounting,
# QL update path — is asserted against the reference's exact semantics
# (matching /root/reference/srl/base/run/core_play.py:115-214 + worker_run.py:107-228).
# ---------------------------------------------------------------------------


def replay_q_f32(train_stream, lr: float = 0.1, discount: float = 0.9) -> dict:
    """Fold the recorded Q-update stream with float32 arithmetic — the dtype-matched
    expectation for the engine's float32 table (the float64 harness Q differs only
    by accumulated rounding)."""
    f32 = np.float32
    Q: dict = {}

    def get_q(k):
        if k not in Q:
            Q[k] = [f32(0.0)] * 4
        return Q[k]

    for s_key, a_t, r_t, terminated_t, n_key in train_stream:
        target = f32(r_t)
        if not terminated_t:
            target = f32(target + f32(discount) * max(get_q(n_key)))
        td = f32(target - get_q(s_key)[a_t])
        Q[s_key][a_t] = f32(Q[s_key][a_t] + f32(lr) * td)
    return Q


def run_engine_ql_grid(
    seed: int,
    max_steps: int,
    epsilon: float = 0.1,
    lr: float = 0.1,
    discount: float = 0.9,
    chunk_steps: int = 50,
):
    """Run the host harness to record its decision streams, then drive the compiled
    PlayEngine with them. Returns (harness_result, engine_result) where each carries
    the transition stream, final Q and episode accounting, ready for exact
    comparison (tests/test_reference_parity.py)."""
    import dataclasses as _dc

    import jax
    import jax.numpy as jnp
    from flax import struct

    from .algorithms.ql import QLConfig
    from .envs.core import TimeStep
    from .runner.engine import PlayEngine

    base_env = Grid()
    trajectory, q64, aux = run_parity_ql_grid(
        seed, max_steps, epsilon=epsilon, lr=lr, discount=discount,
        env=base_env, collect=True,
    )
    moves = aux["moves"]

    # engine-aligned action stream: one injected action per engine step; each
    # episode end inserts one placeholder for the auto-reset step (whose policy
    # output the engine discards by construction)
    eng_actions: List[int] = []
    for (_, action, _, done, _) in trajectory:
        eng_actions.append(action)
        if done:
            eng_actions.append(0)
    n_eng_steps = len(eng_actions)

    # --- injected Grid: slips replayed from the harness's move record ----------
    @struct.dataclass
    class _PGState:
        pos: jax.Array
        t: jax.Array  # global real-step cursor; survives auto-reset

    inj_moves = jnp.asarray(np.asarray(moves + [0], np.int32))

    class _ParityGrid(Grid):
        persistent_fields = ("t",)

        def reset(self, key):
            state = _PGState(pos=self._starts_dev[0], t=jnp.asarray(0, jnp.int32))
            return state, self.timestep(self._obs(state))

        def step(self, state, action, key):
            move = inj_moves[jnp.minimum(state.t, len(moves))]
            new_pos = self._move_tbl[(state.pos[1] * self.W + state.pos[0]) * 4 + move]
            cell = self._field_dev[new_pos[1] * self.W + new_pos[0]]
            reward = jnp.where(
                cell == 1, self.goal_reward,
                jnp.where(cell == -1, self.hole_reward, self.move_reward),
            )
            terminated = jnp.logical_or(cell == 1, cell == -1)
            new_state = _PGState(pos=new_pos, t=state.t + 1)
            return new_state, self.timestep(self._obs(new_state), reward, terminated)

    # --- injected QL: actions replayed from the harness's decision record ------
    inj_actions = jnp.asarray(np.asarray(eng_actions, np.int32))

    @_dc.dataclass
    class _InjectedQL(QLConfig):
        def policy(self, state, obs, invalid_mask, ctx, key):
            return inj_actions[jnp.minimum(ctx.step, n_eng_steps - 1)][None]

    env = _ParityGrid()
    algo = _InjectedQL(lr=lr, discount=discount, exact_sequential=True)
    algo.setup(env)
    engine = PlayEngine(env, algo, num_envs=1)
    carry = engine.init(jax.random.PRNGKey(seed))

    # one collect pass records the raw transition stream (the policy ignores the
    # Q table, so collection and training see identical trajectories); the engine
    # must run EXACTLY n_eng_steps — a trailing remainder chunk handles the tail
    # so no junk steps pollute the Q table
    chunk_steps = min(chunk_steps, n_eng_steps)
    rem = n_eng_steps % chunk_steps
    plan = [chunk_steps] * (n_eng_steps // chunk_steps) + ([rem] if rem else [])
    fns = {
        n: (engine.build_collect_chunk(n), engine.build_chunk(n, training=True))
        for n in sorted(set(plan))
    }
    stream: List[tuple] = []
    train_carry = carry
    for n in plan:
        collect, train = fns[n]
        carry, (transitions, mask, _sv) = collect(carry)
        t_np = jax.tree.map(np.asarray, transitions)
        m_np = np.asarray(mask)  # [T, slots]
        for ti in range(m_np.shape[0]):
            for si in range(m_np.shape[1]):
                if m_np[ti, si]:
                    stream.append(
                        (
                            int(t_np.obs[ti, si]),
                            int(t_np.action[ti, si]),
                            float(t_np.reward[ti, si]),
                            bool(t_np.undone[ti, si] == 0.0),
                            int(t_np.next_obs[ti, si]),
                        )
                    )
        train_carry, _ = train(train_carry)

    def to_idx(key_str: str) -> int:
        x, y = (int(v) for v in key_str.split(","))
        return int(np.asarray(algo.obs_encoder.encode(jnp.asarray([x, y]))))

    harness = {
        "train_stream": [
            (to_idx(s), a, r, term, to_idx(n))
            for (s, a, r, term, n) in aux["train_stream"]
        ],
        "q_f32": {
            to_idx(k): v
            for k, v in replay_q_f32(aux["train_stream"], lr, discount).items()
        },
        "episode_count": sum(1 for t in trajectory if t[3]),
        "episode_rewards": [
            sum(x[2] for x in ep)
            for ep in _split_episodes(trajectory)
            if ep[-1][3]
        ],
    }
    q_np = np.asarray(train_carry.algo_state.q_table)
    engine_res = {
        "train_stream": stream,
        "q_table": q_np,
        "episode_count": int(train_carry.episode_count),
        "episode_reward_sum": float(train_carry.episode_reward_sum[0]),
    }
    return harness, engine_res


def _split_episodes(trajectory):
    eps, cur = [], []
    for t in trajectory:
        cur.append(t)
        if t[3]:
            eps.append(cur)
            cur = []
    if cur:
        eps.append(cur)
    return eps


def run_reference_ql_grid(seed: int, max_steps: int):
    """Run the actual reference package (read-only import) and record the full
    trajectory via a callback. Returns (trajectory, Q dict)."""
    import sys

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import srl
    from srl.algorithms import ql
    from srl.base.run.callback import RunCallback

    records = []

    class Recorder(RunCallback):
        def on_step_end(self, context=None, state=None, **kwargs):
            env = state.env
            records.append(
                (
                    None,  # pre-step state filled below via worker bookkeeping
                    int(state.action),
                    float(env.reward),
                    bool(env.done),
                    int(env.step_num),
                )
            )
            return None

        def on_step_action_after(self, context=None, state=None, **kwargs):
            # capture the decision state before env.step mutates it
            self._pre = tuple(state.env.state)

        def on_step_begin(self, context=None, state=None, **kwargs):
            self._pre = tuple(state.env.state)

    rec = Recorder()

    # patch the record with the pre-step state
    orig_on_step_end = rec.on_step_end

    def on_step_end(context=None, state=None, **kwargs):
        env = state.env
        records.append(
            (
                tuple(rec._pre),
                int(state.action),
                float(env.reward),
                bool(env.done),
                int(env.step_num),
            )
        )
        return None

    rec.on_step_end = on_step_end

    runner = srl.Runner("Grid", ql.Config())
    runner.set_seed(seed)
    runner.train(max_steps=max_steps, callbacks=[rec], enable_progress=False)

    params = runner.make_parameter()
    return records, dict(params.Q)
