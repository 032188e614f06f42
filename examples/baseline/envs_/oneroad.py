"""OneRoad baselines — a 10-step corridor with one rewarding path (bar 1.0;
hard-exploration variant OneRoad-hard). Recipes from tests/test_algorithms.py
and tests/test_go_explore.py."""

import simple_distributed_rl_tpu as srl
from simple_distributed_rl_tpu.algorithms import QLConfig, SearchDynaQConfig


def _finish(r, episodes=100):
    ok = r.evaluate_compare_to_baseline_single_player(episodes=episodes)
    print(f"[{r.algo.get_name()}] baseline {'PASS' if ok else 'FAIL'}")
    return ok


def main_ql():
    r = srl.Runner("OneRoad", QLConfig(), num_envs=64, seed=1)
    r.train(max_steps=100_000)
    return _finish(r)


def main_search_dynaq():
    # UCB-driven exploration solves the corridor with a fraction of QL's budget
    cfg = SearchDynaQConfig(action_ucb_penalty_rate=0.5, q_int_discount=0.99)
    r = srl.Runner("OneRoad", cfg, num_envs=64, seed=1)
    r.train(max_steps=60_000, train_steps_per_chunk=1)
    return _finish(r)


if __name__ == "__main__":
    main_ql()
    main_search_dynaq()
