"""Atari-scale replay: host-RAM frame-dedup ring with device batch staging.

Parity target: the reference's 1M-transition DQN paper preset
(srl/algorithms/dqn/dqn.py:89-102 ``set_atari_config``) backed by its host-RAM
ReplayBuffer with zlib-compressed items (srl/rl/memories/replay_buffer.py:19-28).
A device-resident buffer cannot hold it: 1M stacked 84x84x4 uint8 transitions are
~56 GB (obs + next_obs), 3.5x one v5e chip's HBM. This module keeps the TPU compute
path jitted while the capacity problem moves to host RAM, and cuts storage 8x by
storing each frame ONCE:

- The engine's frame stacks overlap: transition t's next_obs shares W-1 frames with
  its obs, and consecutive transitions of one env overlap too. We store one frame
  per env-step (the newest frame of ``next_obs``) in a per-env uint8 ring —
  1M frames x 7 KB = ~7 GB for the full paper preset — plus tiny per-row metadata
  (action/reward/undone/step-in-episode) and a sparse map of episode-reset frames.
- Stacks are reconstructed at sample time with the engine's exact padding rule
  (windows zero-fill on reset — PlayEngine._push_window), so a sampled batch is
  bit-identical to what a device-resident buffer would have returned.
- Sampling stages K train batches per host round-trip: one device_put of
  [K, batch, ...] uint8, consumed by a jitted lax.scan of K updates
  (DQNConfig.train_on_staged). No io_callback inside the training graph — on a
  tunneled TPU an ordered host callback per update would serialize on RTT.

The ingest stream comes from PlayEngine.build_collect_chunk: transitions arrive as
[T, B*(1+P)] slots (engine.py _rollout_step slot merge) where slot b*(1+P) carries
env b's mid-episode transition and slots +1..P carry end-of-episode flushes; masked
rows are reset gaps. Single-player only (the Atari capability).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np


class HostFrameReplay:
    def __init__(
        self,
        capacity: int,
        num_envs: int,
        frame_shape: Tuple[int, ...],
        window: int,
        dtype=np.uint8,
        seed: int = 0,
    ):
        self.num_envs = int(num_envs)
        self.rows = max(window + 1, int(capacity) // self.num_envs)
        self.capacity = self.rows * self.num_envs
        self.W = int(window)
        self.frame_shape = tuple(frame_shape)
        self.frames = np.zeros((self.num_envs, self.rows) + self.frame_shape, dtype)
        self.actions = np.zeros((self.num_envs, self.rows), np.int32)
        self.rewards = np.zeros((self.num_envs, self.rows), np.float32)
        self.undone = np.zeros((self.num_envs, self.rows), np.float32)
        self.step_in_ep = np.zeros((self.num_envs, self.rows), np.int32)
        self.head = np.zeros(self.num_envs, np.int64)  # absolute write counters
        # sparse episode-start frames: slot -> frame f(0) (the reset obs), per env.
        # f(0) is the one frame that is no transition's "newest next frame".
        self.reset_frames: list = [dict() for _ in range(self.num_envs)]
        # host-side ingest cursors
        self._s = np.zeros(self.num_envs, np.int64)  # step-in-episode counters
        self._gap = np.ones(self.num_envs, bool)  # saw a masked gap (stream start)
        self._rng = np.random.default_rng(seed)
        self._zero_frame = np.zeros(self.frame_shape, dtype)

    # ------------------------------------------------------------------
    @property
    def size(self) -> int:
        return int(np.minimum(self.head, self.rows).sum())

    def _write(self, b: int, s: int, obs_newest, next_newest, action, reward, undone):
        slot = int(self.head[b] % self.rows)
        self.reset_frames[b].pop(slot, None)  # slot is being overwritten
        self.frames[b, slot] = next_newest
        self.actions[b, slot] = action
        self.rewards[b, slot] = reward
        self.undone[b, slot] = undone
        self.step_in_ep[b, slot] = s
        if s == 0:
            self.reset_frames[b][slot] = np.array(obs_newest, copy=True)
        self.head[b] += 1

    def ingest(self, transitions, mask) -> None:
        """Consume one collect-chunk's host pytree: either a full Transition
        (window-stacked obs [T, B*(1+P), W, ...]) or the COMPACT dict produced by
        build_collect_chunk(compact_frames=True) — {obs_newest, next_newest,
        action, reward, undone} with the frames already deduped on device (the
        4x-smaller d2h payload). Rows are processed in engine order (time-major;
        within a step the main slot precedes the flush slots), so per-env rows
        are consecutive in-episode steps."""
        if isinstance(transitions, dict):
            obs = np.asarray(transitions["obs_newest"])
            next_obs = np.asarray(transitions["next_newest"])
            action = np.asarray(transitions["action"])
            reward = np.asarray(transitions["reward"])
            undone = np.asarray(transitions["undone"])
        else:
            newest = self.W - 1
            sel = (lambda x: np.asarray(x)[:, :, newest]) if self.W > 1 else np.asarray
            obs = sel(transitions.obs)
            next_obs = sel(transitions.next_obs)
            action = np.asarray(transitions.action)
            reward = np.asarray(transitions.reward)
            undone = np.asarray(transitions.undone)
        mask = np.asarray(mask)
        T, S = mask.shape
        P1 = S // self.num_envs  # 1 + P slots per env
        for t in range(T):
            for b in range(self.num_envs):
                base = b * P1
                if mask[t, base]:
                    if self._gap[b]:
                        self._s[b] = 0
                        self._gap[b] = False
                    self._write(
                        b, int(self._s[b]), obs[t, base],
                        next_obs[t, base], action[t, base],
                        reward[t, base], undone[t, base],
                    )
                    self._s[b] += 1
                else:
                    self._gap[b] = True
                for p in range(1, P1):
                    row = base + p
                    if mask[t, row]:  # end-of-episode flush
                        if self._gap[b]:
                            self._s[b] = 0
                            self._gap[b] = False
                        self._write(
                            b, int(self._s[b]), obs[t, row],
                            next_obs[t, row], action[t, row],
                            reward[t, row], undone[t, row],
                        )
                        self._s[b] = 0
                        self._gap[b] = True

    # ------------------------------------------------------------------
    def _frame(self, b: int, r_abs: int, m: int, s: int):
        """Episode-relative frame f(m) for the transition at absolute row r_abs
        (step_in_episode s): m>=1 -> the stored next-frame of in-episode step m-1;
        m==0 -> the episode's reset frame; m<0 -> zeros (engine zero-padding)."""
        if m < 0:
            return self._zero_frame
        if m == 0:
            start_slot = int((r_abs - s) % self.rows)
            f = self.reset_frames[b].get(start_slot)
            return f if f is not None else self._zero_frame
        return self.frames[b, int((r_abs - (s + 1 - m)) % self.rows)]

    @property
    def ready(self) -> bool:
        """True when EVERY env ring has at least one sampleable row (hi > lo).
        Callers must gate sampling on this, not on the summed ``size``: an env
        whose stream so far was only masked reset-gap rows has head == 0 and
        cannot be sampled from."""
        lo, hi = self._sample_range()
        return bool(np.all(hi > lo))

    def _sample_range(self):
        # A transition at absolute row r with step_in_ep s >= W reads its oldest
        # obs frame from row r - W, so on a wrapped ring the oldest W rows are
        # excluded (rows >= W + 1 is guaranteed by the constructor).
        lo = np.where(self.head > self.rows, self.head - self.rows + self.W, 0)
        return lo, self.head

    def sample_batches(self, num_batches: int, batch_size: int):
        """[K, batch] staged sample: dict of numpy arrays shaped [K, batch, ...]
        ready for one device_put. Uniform over retained rows, excluding the
        oldest W rows of a wrapped ring (their history frames are overwritten)."""
        lo, hi = self._sample_range()  # hi exclusive
        if not np.all(hi > lo):
            empty = np.nonzero(~(hi > lo))[0].tolist()
            raise RuntimeError(
                f"HostFrameReplay not ready: env rings {empty} have no sampleable "
                f"rows yet (heads {self.head[empty].tolist()}). Gate on `.ready` "
                "or raise warmup_size so every env collects before training."
            )
        K, B = int(num_batches), int(batch_size)
        bs = self._rng.integers(0, self.num_envs, size=(K, B))
        rs = lo[bs] + (self._rng.random((K, B)) * (hi[bs] - lo[bs])).astype(np.int64)
        obs = np.empty((K, B, self.W) + self.frame_shape, self.frames.dtype)
        nxt = np.empty_like(obs)
        slots = (rs % self.rows).astype(np.int64)
        for k in range(K):
            for i in range(B):
                b, r_abs = int(bs[k, i]), int(rs[k, i])
                s = int(self.step_in_ep[b, r_abs % self.rows])
                for j in range(self.W):
                    obs[k, i, j] = self._frame(b, r_abs, s - (self.W - 1 - j), s)
                    nxt[k, i, j] = self._frame(b, r_abs, s + 1 - (self.W - 1 - j), s)
        return {
            "obs": obs,
            "next_obs": nxt,
            "action": self.actions[bs, slots],
            "reward": self.rewards[bs, slots],
            "undone": self.undone[bs, slots],
        }

    # ------------------------------------------------------------------
    def state_dict(self) -> Dict[str, np.ndarray]:
        """Checkpointable state (parity: RLMemory.backup/restore)."""
        flat_resets = [
            (b, slot, f) for b in range(self.num_envs)
            for slot, f in self.reset_frames[b].items()
        ]
        return {
            "frames": self.frames, "actions": self.actions, "rewards": self.rewards,
            "undone": self.undone, "step_in_ep": self.step_in_ep, "head": self.head,
            "s": self._s, "gap": self._gap, "rng": self._rng.bit_generator.state,
            "reset_b": np.asarray([x[0] for x in flat_resets], np.int64),
            "reset_slot": np.asarray([x[1] for x in flat_resets], np.int64),
            "reset_frames": (
                np.stack([x[2] for x in flat_resets])
                if flat_resets else np.zeros((0,) + self.frame_shape, self.frames.dtype)
            ),
        }

    def load_state_dict(self, d) -> None:
        got = np.asarray(d["frames"]).shape
        want = (self.num_envs, self.rows) + self.frame_shape
        if got != want:
            raise ValueError(
                f"HostFrameReplay restore shape mismatch: checkpoint frames {got} "
                f"vs constructed ring {want} — construct the replay with the same "
                "capacity/num_envs/frame_shape/window before restoring."
            )
        if "rng" in d:
            self._rng.bit_generator.state = (
                d["rng"].item() if isinstance(d["rng"], np.ndarray) else d["rng"]
            )
        self.frames = np.asarray(d["frames"])
        self.actions = np.asarray(d["actions"])
        self.rewards = np.asarray(d["rewards"])
        self.undone = np.asarray(d["undone"])
        self.step_in_ep = np.asarray(d["step_in_ep"])
        self.head = np.asarray(d["head"])
        self._s = np.asarray(d["s"])
        self._gap = np.asarray(d["gap"])
        self.reset_frames = [dict() for _ in range(self.num_envs)]
        for b, slot, f in zip(d["reset_b"], d["reset_slot"], d["reset_frames"]):
            self.reset_frames[int(b)][int(slot)] = np.asarray(f)
