"""Orbax full-state checkpoint/resume + the play_window headless fallback."""

import io
import sys
import tempfile

import jax
import numpy as np
import pytest

jax.config.update("jax_platforms", "cpu")

import simple_distributed_rl_tpu as srl
from simple_distributed_rl_tpu.algorithms import QLConfig

pytest.importorskip("orbax.checkpoint")


def test_orbax_checkpoint_roundtrip(tmp_path):
    from simple_distributed_rl_tpu.runner import OrbaxCheckpoint

    d = str(tmp_path / "ckpt")
    r = srl.Runner("Grid", QLConfig(), num_envs=32, seed=1)
    r.train(max_steps=5_000, callbacks=[OrbaxCheckpoint(d, interval=1e9)], progress=False)

    r2 = srl.Runner("Grid", QLConfig(), num_envs=32, seed=9)
    step = OrbaxCheckpoint.restore(d, r2)
    assert step is not None
    same = jax.tree.map(
        lambda a, b: bool(np.allclose(np.asarray(a), np.asarray(b))),
        r2.algo_state,
        r.algo_state,
    )
    assert all(jax.tree.leaves(same))


def test_play_window_headless_falls_back(monkeypatch):
    monkeypatch.delenv("DISPLAY", raising=False)
    r = srl.Runner("Grid", QLConfig(), num_envs=8, seed=1)
    monkeypatch.setattr(sys, "stdin", io.StringIO(""))  # EOF -> immediate return
    total = r.play_window(max_steps=3)
    assert isinstance(total, float)
