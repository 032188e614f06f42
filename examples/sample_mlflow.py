"""MLflow experiment tracking (parity: /root/reference/examples/sample_mlflow.py).
Requires mlflow installed; metrics/params/parameter artifact land in the local
mlruns/ store.

Run:  PYTHONPATH=. python examples/sample_mlflow.py
"""

import simple_distributed_rl_tpu as srl
from simple_distributed_rl_tpu.algorithms import QLConfig
from simple_distributed_rl_tpu.runner.mlflow_callback import (
    MLFlowCallback,
    load_parameter_from_mlflow,
)


def main():
    runner = srl.Runner("Grid", QLConfig(), num_envs=256, seed=1)
    cb = MLFlowCallback(experiment_name="srl_tpu_demo", interval=5.0)
    runner.train(max_train_count=50_000, callbacks=[cb])

    # later: pull the logged parameter back into a fresh runner
    # load_parameter_from_mlflow(new_runner, run_id="...")


if __name__ == "__main__":
    main()
