"""MLflow experiment-tracking callback (parity: srl/runner/callbacks/mlflow_callback.py:
32-465 — interval metric logging, parameter artifacts, load-back helper).

Gated on mlflow being importable; when absent, constructing the callback raises a
clear error (this image ships without mlflow — the class exists for API parity and
for deployments that have it)."""

from __future__ import annotations

import importlib.util
import os
import tempfile
import time
from typing import Optional

from .callbacks import RunCallback


def is_available() -> bool:
    return importlib.util.find_spec("mlflow") is not None


class MLFlowCallback(RunCallback):
    def __init__(
        self,
        experiment_name: str = "simple_distributed_rl_tpu",
        run_name: Optional[str] = None,
        interval: float = 30.0,
        log_checkpoint: bool = True,
    ):
        if not is_available():
            raise ImportError(
                "mlflow is not installed; install it or drop MLFlowCallback"
            )
        self.experiment_name = experiment_name
        self.run_name = run_name
        self.interval = interval
        self.log_checkpoint = log_checkpoint
        self._t_last = 0.0
        self._run = None

    def on_start(self, runner) -> None:
        import mlflow

        mlflow.set_experiment(self.experiment_name)
        self._run = mlflow.start_run(run_name=self.run_name)
        from ..utils import serialize

        try:
            mlflow.log_params(
                {k: str(v) for k, v in serialize.get_modified_fields(runner.algo).items()}
            )
        except Exception:
            pass
        mlflow.log_param("env", runner.env_id)
        mlflow.log_param("algorithm", runner.algo.get_name())
        mlflow.log_param("num_envs", runner.num_envs)

    def on_chunk_end(self, runner, stats) -> None:
        import mlflow

        now = time.time()
        if now - self._t_last < self.interval:
            return
        self._t_last = now
        step = int(stats.get("env_steps", 0))
        for k, v in stats.items():
            if isinstance(v, (int, float)):
                mlflow.log_metric(k, float(v), step=step)

    def on_end(self, runner) -> None:
        import mlflow

        if self.log_checkpoint:
            with tempfile.TemporaryDirectory() as d:
                path = os.path.join(d, "parameter.pkl.xz")
                runner.save_parameter(path)
                mlflow.log_artifact(path)
        mlflow.end_run()


def load_parameter_from_mlflow(runner, run_id: str) -> None:
    """(parity: Runner.load_mlflow / load_runner_from_mlflow, runner/runner.py:1454)"""
    import mlflow

    path = mlflow.artifacts.download_artifacts(
        run_id=run_id, artifact_path="parameter.pkl.xz"
    )
    runner.load_parameter(path)
