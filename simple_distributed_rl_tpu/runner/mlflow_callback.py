"""MLflow experiment-tracking callback (parity: srl/runner/callbacks/mlflow_callback.py:
32-465 — interval metric logging, interval evaluation, config + parameter artifacts,
history plot artifact, and the load-back helpers incl. full-runner reconstruction,
runner/runner.py:1454 load_runner_from_mlflow).

Gated on mlflow being importable; when absent, constructing the callback raises a
clear error (this image ships without mlflow — the class exists for API parity and
for deployments that have it)."""

from __future__ import annotations

import importlib.util
import logging
import os
import tempfile
import time
from typing import Optional

from .callbacks import RunCallback

logger = logging.getLogger(__name__)


def is_available() -> bool:
    return importlib.util.find_spec("mlflow") is not None


class MLFlowCallback(RunCallback):
    def __init__(
        self,
        experiment_name: str = "simple_distributed_rl_tpu",
        run_name: Optional[str] = None,
        interval: float = 30.0,
        log_checkpoint: bool = True,
        enable_eval: bool = False,
        eval_episodes: int = 10,
        eval_interval: float = 60.0,
        log_history_plot: bool = True,
    ):
        if not is_available():
            raise ImportError(
                "mlflow is not installed; install it or drop MLFlowCallback"
            )
        self.experiment_name = experiment_name
        self.run_name = run_name
        self.interval = interval
        self.log_checkpoint = log_checkpoint
        self.enable_eval = enable_eval
        self.eval_episodes = eval_episodes
        self.eval_interval = eval_interval
        self.log_history_plot = log_history_plot
        self._t_last = 0.0
        self._t_last_eval = 0.0
        self._run = None
        self._history: list = []

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
            logger.warning("MLFlowCallback: logging algo params failed", exc_info=True)
        mlflow.log_param("env", runner.env_id)
        mlflow.log_param("algorithm", runner.algo.get_name())
        mlflow.log_param("num_envs", runner.num_envs)
        # full-run yaml (env:/rl:/context:) so the run is reconstructable
        # (parity: the reference logs the runner config artifact,
        # mlflow_callback.py on_start); bare EnvCore envs have no serializable
        # construction recipe, so the skip is expected — but logged, not silent
        try:
            with tempfile.TemporaryDirectory() as d:
                path = os.path.join(d, "runner.yaml")
                runner.save(path)
                mlflow.log_artifact(path)
        except Exception:
            logger.warning(
                "MLFlowCallback: runner.yaml artifact not logged (env not "
                "reconstructable from config?)", exc_info=True,
            )

    def on_chunk_end(self, runner, stats) -> None:
        import mlflow

        now = time.time()
        step = int(stats.get("env_steps", 0))
        if self.enable_eval and now - self._t_last_eval >= self.eval_interval:
            # interval evaluation (parity: the reference's Evaluate mixin logging
            # eval_reward0.. at intervals, mlflow_callback.py + evaluate.py:28-58).
            # Logged IMMEDIATELY (independent of the generic metric interval) into
            # a LOCAL dict — never mutating the shared stats other callbacks see,
            # never silently discarded (round-3 advisor findings)
            self._t_last_eval = now
            try:
                rewards = runner.evaluate(self.eval_episodes, on_incomplete="ignore")
                eval_metrics = {f"eval_reward{i}": float(rw) for i, rw in enumerate(rewards)}
                self._history.append({"env_steps": step, **eval_metrics})
                for k, v in eval_metrics.items():
                    mlflow.log_metric(k, v, step=step)
            except Exception:
                logger.warning("MLFlowCallback: interval eval failed", exc_info=True)
        if now - self._t_last < self.interval:
            return
        self._t_last = now
        numeric = {
            k: float(v) for k, v in stats.items() if isinstance(v, (int, float))
        }
        self._history.append({"env_steps": step, **numeric})
        for k, v in numeric.items():
            mlflow.log_metric(k, v, step=step)

    def on_end(self, runner) -> None:
        import mlflow

        if self.log_checkpoint:
            with tempfile.TemporaryDirectory() as d:
                path = os.path.join(d, "parameter.pkl.xz")
                runner.save_parameter(path)
                mlflow.log_artifact(path)
        if self.log_history_plot and len(self._history) >= 2:
            try:
                self._log_plot(mlflow)
            except Exception:
                logger.warning("MLFlowCallback: history plot failed", exc_info=True)
        mlflow.end_run()

    def _log_plot(self, mlflow) -> None:
        """Reward/loss curves as a png artifact (parity: the reference's plot
        artifacts, mlflow_callback.py:360-404)."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        xs = [h["env_steps"] for h in self._history]
        keys = [
            k for k in self._history[-1]
            if k != "env_steps" and any(k in h for h in self._history)
        ][:6]
        fig, axes = plt.subplots(len(keys), 1, figsize=(8, 2.2 * max(len(keys), 1)),
                                 sharex=True, squeeze=False)
        for ax, k in zip(axes[:, 0], keys):
            ys = [h.get(k, float("nan")) for h in self._history]
            ax.plot(xs, ys)
            ax.set_ylabel(k)
            ax.grid(True, alpha=0.3)
        axes[-1, 0].set_xlabel("env_steps")
        fig.tight_layout()
        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "history.png")
            fig.savefig(path, dpi=100)
            mlflow.log_artifact(path)
        plt.close(fig)


def load_parameter_from_mlflow(runner, run_id: str) -> None:
    """(parity: Runner.load_mlflow, runner/runner.py:1445)"""
    import mlflow

    path = mlflow.artifacts.download_artifacts(
        run_id=run_id, artifact_path="parameter.pkl.xz"
    )
    runner.load_parameter(path)


def load_runner_from_mlflow(run_id: str):
    """Rebuild a Runner entirely from a logged run: config.yaml -> Runner, then
    parameter artifact -> restore (parity: srl.load_mlflow / load_runner_from_mlflow,
    runner/runner.py:1454, mlflow_callback.py:404-465)."""
    import mlflow

    from .runner import Runner

    cfg_path = mlflow.artifacts.download_artifacts(
        run_id=run_id, artifact_path="runner.yaml"
    )
    runner = Runner.load(cfg_path)
    # only the artifact-NOT-FOUND case is tolerable (a run recorded before
    # checkpoint logging was enabled); a corrupt/failed restore must not
    # silently hand back a freshly-initialized runner that looks trained
    # (round-3 advisor finding)
    try:
        arts = {a.path for a in mlflow.artifacts.list_artifacts(run_id=run_id)}
    except Exception:
        logger.warning(
            "load_runner_from_mlflow: listing artifacts failed; attempting "
            "parameter restore anyway", exc_info=True,
        )
        arts = None
    if arts is not None and "parameter.pkl.xz" not in arts:
        return runner  # genuinely no checkpoint logged
    load_parameter_from_mlflow(runner, run_id)
    return runner
