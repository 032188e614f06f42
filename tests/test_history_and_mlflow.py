"""HistoryOnMemory + MLflow full-runner round-trip (against a protocol-faithful
fake mlflow module, same pattern as tests/test_connector_mocks.py — the reference
tests MLflow against a live local store; this image ships without mlflow)."""

import sys
import types

import numpy as np

import simple_distributed_rl_tpu as srl
from simple_distributed_rl_tpu.algorithms import QLConfig


def test_history_on_memory_roundtrip():
    r = srl.Runner("Grid", QLConfig(), num_envs=32, seed=0)
    cb = r.set_history_on_memory()
    r.train(max_steps=4_000, progress=False)
    r.train(max_steps=8_000, progress=False)  # records accumulate across calls
    assert len(cb.records) >= 2
    h = r.get_history()
    df = h.to_df()
    assert "env_steps" in df.columns
    assert df["env_steps"].iloc[-1] >= 8_000
    # monotone env_steps across the two train calls
    assert (np.diff(df["env_steps"].to_numpy()) > 0).all()


class _FakeMlflow(types.ModuleType):
    """Implements the exact surface MLFlowCallback drives."""

    def __init__(self):
        super().__init__("mlflow")
        import importlib.machinery

        self.__spec__ = importlib.machinery.ModuleSpec("mlflow", loader=None)
        self.params = {}
        self.metrics = []
        self.artifacts = []
        self.experiment = None
        self.run_started = False
        self.run_ended = False

    def set_experiment(self, name):
        self.experiment = name

    def start_run(self, run_name=None):
        self.run_started = True
        return types.SimpleNamespace(info=types.SimpleNamespace(run_id="fake-run"))

    def log_params(self, d):
        self.params.update(d)

    def log_param(self, k, v):
        self.params[k] = v

    def log_metric(self, k, v, step=0):
        self.metrics.append((k, v, step))

    def log_artifact(self, path):
        name = path.split("/")[-1]
        if name.endswith(".pkl.xz"):
            import lzma
            import pickle

            with lzma.open(path, "rb") as f:
                self.artifacts.append((name, pickle.load(f)))
        else:
            with open(path, "rb") as f:
                self.artifacts.append((name, f.read()))

    def end_run(self):
        self.run_ended = True


def test_mlflow_full_runner_roundtrip(monkeypatch):
    fake = _FakeMlflow()
    monkeypatch.setitem(sys.modules, "mlflow", fake)

    from simple_distributed_rl_tpu.runner.mlflow_callback import MLFlowCallback

    r = srl.Runner("Grid", QLConfig(lr=0.2), num_envs=32, seed=1)
    cb = MLFlowCallback(interval=0.0)
    r.train(max_steps=6_000, progress=False, callbacks=[cb])

    assert fake.run_started and fake.run_ended
    assert fake.experiment == "simple_distributed_rl_tpu"
    assert fake.params["env"] == "Grid"
    assert fake.params["algorithm"] == "QL"
    assert fake.params.get("lr") == "0.2"  # modified-fields diff
    assert any(k == "env_steps" for k, _, _ in fake.metrics)
    # checkpoint artifact is a loadable parameter payload (runner.yaml is
    # logged first since round 3)
    art = dict(fake.artifacts)
    assert "parameter.pkl.xz" in art
    fake.artifacts = [("parameter.pkl.xz", art["parameter.pkl.xz"])]

    # load-back into a fresh runner through the public load path
    import lzma
    import os
    import pickle
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "parameter.pkl.xz")
        with lzma.open(p, "wb") as f:
            pickle.dump(fake.artifacts[0][1], f)
        fake2 = _FakeMlflow()
        fake2.downloaded = p
        fake2.artifacts_mod = types.SimpleNamespace(
            download_artifacts=lambda run_id, artifact_path: p
        )
        fake2.artifacts = fake2.artifacts_mod  # module attr used by the loader
        monkeypatch.setitem(sys.modules, "mlflow", fake2)
        from simple_distributed_rl_tpu.runner.mlflow_callback import (
            load_parameter_from_mlflow,
        )

        r2 = srl.Runner("Grid", QLConfig(lr=0.2), num_envs=8, seed=2)
        load_parameter_from_mlflow(r2, "fake-run")
        q1 = np.asarray(r.algo_state.q_table)
        q2 = np.asarray(r2.algo_state.q_table)
        assert np.allclose(q1, q2)


def test_mlflow_eval_plot_and_runner_reconstruct(monkeypatch, tmp_path):
    """Round-3 depth (parity: mlflow_callback.py interval eval + plot artifacts +
    load_runner_from_mlflow, runner/runner.py:1454): interval evaluation metrics,
    the runner.yaml + history.png artifacts, and full-runner reconstruction."""
    fake = _FakeMlflow()
    monkeypatch.setitem(sys.modules, "mlflow", fake)

    from simple_distributed_rl_tpu.runner.mlflow_callback import MLFlowCallback

    r = srl.Runner("Grid", QLConfig(lr=0.2), num_envs=32, seed=1)
    cb = MLFlowCallback(interval=0.0, enable_eval=True, eval_episodes=4,
                        eval_interval=0.0)
    r.train(max_steps=6_000, progress=False, callbacks=[cb])

    names = [n for n, _ in fake.artifacts]
    assert "runner.yaml" in names
    assert "parameter.pkl.xz" in names
    assert "history.png" in names
    assert any(k == "eval_reward0" for k, _, _ in fake.metrics)

    # reconstruct the runner from the logged artifacts
    import os

    yml = dict(fake.artifacts)["runner.yaml"]
    p_yaml = os.path.join(tmp_path, "runner.yaml")
    with open(p_yaml, "wb") as f:
        f.write(yml)
    import lzma
    import pickle

    p_param = os.path.join(tmp_path, "parameter.pkl.xz")
    with lzma.open(p_param, "wb") as f:
        pickle.dump(dict(fake.artifacts)["parameter.pkl.xz"], f)

    fake2 = _FakeMlflow()
    fake2.artifacts = types.SimpleNamespace(
        download_artifacts=lambda run_id, artifact_path: {
            "runner.yaml": p_yaml, "parameter.pkl.xz": p_param
        }[artifact_path]
    )
    monkeypatch.setitem(sys.modules, "mlflow", fake2)
    from simple_distributed_rl_tpu.runner.mlflow_callback import (
        load_runner_from_mlflow,
    )

    r2 = load_runner_from_mlflow("fake-run")
    assert r2.env_id == "Grid" and r2.algo.get_name() == "QL"
    np.testing.assert_allclose(
        np.asarray(r2.algo.params_of(r2.algo_state)),
        np.asarray(r.algo.params_of(r.algo_state)),
    )
