"""Pending-transition edge cases (VERDICT round-1 weak #7): exact per-player delayed
transition semantics under termination, mid-turn truncation, window stacking with
multi-player rotation, and frameskip/noop interactions.

Parity target: the reference WorkerRun state machine's 1-step-delayed per-player view
(srl/base/rl/worker_run.py:107-358) and its tests
(tests/quick/base/rl/test_worker_run_obs.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import simple_distributed_rl_tpu as srl
from simple_distributed_rl_tpu.algorithms import QLConfig
from simple_distributed_rl_tpu.envs.core import EnvCore, TimeStep
from simple_distributed_rl_tpu.runner.engine import PlayEngine
from simple_distributed_rl_tpu.spaces import Discrete


class TwoPlayerClock(EnvCore):
    """Players alternate; obs = step count; step k pays rewards [k, -k]. Terminates
    after ``end_at`` steps (never, if 0). Fully deterministic — exact expectations."""

    def __init__(self, end_at: int = 4):
        self.end_at = end_at

    @property
    def action_space(self):
        return Discrete(2)

    @property
    def observation_space(self):
        return Discrete(64)

    @property
    def player_num(self):
        return 2

    @property
    def max_episode_steps(self):
        return 50

    def reset(self, key):
        state = jnp.asarray(0, jnp.int32)
        return state, self.timestep(obs=state, next_player=0)

    def step(self, state, action, key):
        k = state + 1
        terminated = jnp.logical_and(self.end_at > 0, k >= self.end_at)
        return k, self.timestep(
            obs=k,
            rewards=jnp.stack([k.astype(jnp.float32), -k.astype(jnp.float32)]),
            terminated=terminated,
            next_player=k % 2,
        )


def _drive(engine, steps):
    carry = engine.init(jax.random.PRNGKey(0))
    outs = []
    for _ in range(steps):
        carry, (tr, mask, _) = engine._rollout_step(carry, training=True)
        outs.append((jax.tree.map(np.asarray, tr), np.asarray(mask)))
    return carry, outs


def test_termination_flushes_both_players_exactly():
    """p0 acts at steps 1,3; p1 at 2,4; terminal at step 4: t1 emits the actor's
    accumulated reward; t2 flushes every open pending with undone=0."""
    env = TwoPlayerClock(end_at=4)
    cfg = QLConfig()
    cfg.setup(env)
    engine = PlayEngine(env, cfg, num_envs=1)
    _, outs = _drive(engine, 4)

    # slot layout per step: [t1, t2_p0, t2_p1]
    # step 3 (0-indexed 2): p0 acts again -> its pending from step 1 completes
    tr, mask = outs[2]
    assert mask.tolist() == [True, False, False]
    assert tr.reward[0] == pytest.approx(1.0 + 2.0)  # p0 rewards of steps 1,2
    assert tr.obs[0] == 0 and tr.next_obs[0] == 2  # s at act 1, s' at act 3
    assert tr.undone[0] == 1.0

    # step 4: t1 = p1's pending from step 2 (rewards -2-3); then the env terminates:
    # t2 flushes p0 (opened step 3: rewards 3+4) and p1 (opened step 4: reward -4)
    tr, mask = outs[3]
    assert mask.tolist() == [True, True, True]
    assert tr.reward[0] == pytest.approx(-2.0 - 3.0)
    assert tr.undone[0] == 1.0
    assert tr.reward[1] == pytest.approx(3.0 + 4.0)  # p0 slot
    assert tr.reward[2] == pytest.approx(-4.0)  # p1 slot
    assert tr.undone[1] == 0.0 and tr.undone[2] == 0.0  # terminated: no bootstrap
    assert tr.next_obs[1] == 4 and tr.next_obs[2] == 4  # both see the terminal obs


def test_truncation_mid_turn_flushes_with_bootstrap():
    """Truncation on a NON-acting player's turn: every open pending flushes with
    undone=1 (truncation still bootstraps — dqn/dqn.py:243 semantics)."""
    env = TwoPlayerClock(end_at=0)  # never terminates
    cfg = QLConfig()
    cfg.setup(env)
    engine = PlayEngine(env, cfg, num_envs=1, max_episode_steps=3)
    _, outs = _drive(engine, 4)

    # step 4 truncates (strictly-greater rule: step_num 4 > 3)
    tr, mask = outs[3]
    assert mask.tolist() == [True, True, True]
    assert tr.undone[1] == 1.0 and tr.undone[2] == 1.0  # truncation bootstraps


def test_no_transition_from_reset_step():
    env = TwoPlayerClock(end_at=2)
    cfg = QLConfig()
    cfg.setup(env)
    engine = PlayEngine(env, cfg, num_envs=1)
    _, outs = _drive(engine, 5)
    # steps: 1 (act p0), 2 (act p1, terminal -> flush), 3 (auto-reset, NO emission),
    # 4 (act p0 again), 5 (act p1, terminal again)
    assert outs[0][1].tolist() == [False, False, False]
    assert outs[1][1].tolist() == [False, True, True]
    assert outs[2][1].tolist() == [False, False, False]  # reset step emits nothing
    assert outs[3][1].tolist() == [False, False, False]
    assert outs[4][1].tolist() == [False, True, True]


def test_window_stacking_with_multiplayer():
    """window_length=2 frame stacking composes with player rotation: the pending obs
    each player trains on equals the stacked encoding it acted on, and the window
    zero-pads at episode starts (worker_run.py:316-321 semantics)."""
    env = TwoPlayerClock(end_at=4)
    cfg = QLConfig(window_length=2)
    cfg.setup(env)
    engine = PlayEngine(env, cfg, num_envs=1)
    carry = engine.init(jax.random.PRNGKey(0))
    # initial window = [0-pad, obs0=0] -> stacked encode of (0, 0)
    first_enc = int(np.asarray(carry.enc_obs)[0])
    seen = []
    for _ in range(4):
        prev_enc = int(np.asarray(carry.enc_obs)[0])
        carry, (tr, mask, _) = engine._rollout_step(carry, training=True)
        seen.append((prev_enc, jax.tree.map(np.asarray, tr), np.asarray(mask)))
    # t1 at step 3 must train on the stacked obs p0 acted on at step 1 (= initial)
    prev_enc, tr, mask = seen[2]
    assert mask[0]
    assert tr.obs[0] == first_enc
    # the terminal flush sees the final stacked obs as next_obs
    prev_enc, tr, mask = seen[3]
    assert tr.next_obs[1] == prev_enc or tr.next_obs[1] == int(np.asarray(carry.enc_obs)[0])
    # after the reset step the window is zero-padded again
    carry, _ = engine._rollout_step(carry, training=True)
    assert int(np.asarray(carry.enc_obs)[0]) == first_enc


def test_frameskip_accumulates_rewards():
    """frameskip=1: one policy action = 2 env steps with summed rewards
    (env_run.py:281-291)."""
    env = srl.make_env("CartPole-v1")
    cfg = QLConfig(obs_division=4)
    cfg.setup(env)
    engine = PlayEngine(env, cfg, num_envs=4, frameskip=1)
    carry = engine.init(jax.random.PRNGKey(0))
    carry, _ = engine._rollout_step(carry, training=True)
    r = np.asarray(carry.ts.rewards)
    alive = ~np.asarray(carry.ts.done)
    assert np.all(r[alive.nonzero()[0]] == 2.0)  # 1.0 per env step, 2 steps


def test_noop_reset_advances_state():
    env = srl.make_env("CartPole-v1")
    cfg = QLConfig(obs_division=4)
    cfg.setup(env)
    plain = PlayEngine(env, cfg, num_envs=4)
    noop = PlayEngine(env, cfg, num_envs=4, random_noop_max=5)
    c1 = plain.init(jax.random.PRNGKey(0))
    c2 = noop.init(jax.random.PRNGKey(0))
    s1 = np.asarray(jax.tree.leaves(c1.env_state.env_state)[0])
    s2 = np.asarray(jax.tree.leaves(c2.env_state.env_state)[0])
    assert not np.allclose(s1, s2)
    # noop steps never count toward the episode step budget
    assert np.all(np.asarray(c2.env_state.step_num) == 0)
