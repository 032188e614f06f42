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
) -> Tuple[List[tuple], dict]:
    """Host-side QL-on-Grid with reference-exact semantics. Returns
    (trajectory [(state, action, reward, done), ...], Q dict keyed like the
    reference's ``to_str`` states)."""
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

    def train_on(t):
        # trainer QL update (ql.py:106-132), float64 python arithmetic
        s_key, a_t, r_t, terminated_t, n_key = t
        target = r_t
        if not terminated_t:
            nq = get_q(n_key)
            target += discount * max(nq)
        td = target - get_q(s_key)[a_t]
        Q[s_key][a_t] += lr * td

    trajectory = []
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

    return trajectory, Q


# the reference's action_probs dicts iterate in insertion order (grid.py:121-146):
# for UP/DOWN rows: {UP, DOWN, RIGHT, LEFT}; for RIGHT/LEFT rows: {UP, DOWN, RIGHT, LEFT}
_REF_DICT_ORDER = {
    3: [3, 1, 2, 0],  # UP row: UP, DOWN, RIGHT, LEFT
    1: [3, 1, 2, 0],  # DOWN row
    2: [3, 1, 2, 0],  # RIGHT row
    0: [3, 1, 2, 0],  # LEFT row
}


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
