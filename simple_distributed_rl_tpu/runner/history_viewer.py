"""History loading + plotting (parity: srl/runner/callbacks/history_viewer.py —
HistoryViewer/HistoryViewers over the jsonl logs written by HistoryOnFile)."""

from __future__ import annotations

import json
import os
from typing import List, Optional


class HistoryViewer:
    def __init__(self, save_dir: Optional[str] = None, records: Optional[list] = None):
        self.save_dir = save_dir
        if records is not None:
            # in-memory history (parity: HistoryOnMemory -> Runner.get_history())
            self.records = list(records)
            return
        assert save_dir is not None, "need save_dir or records"
        path = os.path.join(save_dir, "history.jsonl")
        self.records = []
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line:
                    self.records.append(json.loads(line))

    def to_df(self):
        import pandas as pd

        return pd.DataFrame(self.records)

    def plot(
        self,
        xlabel: str = "env_steps",
        ylabels: Optional[List[str]] = None,
        show: bool = True,
        save_path: Optional[str] = None,
    ):
        import matplotlib

        if not show:
            matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        df = self.to_df()
        ylabels = ylabels or [
            c for c in ("mean_episode_reward", "eval_reward", "loss") if c in df.columns
        ]
        fig, axes = plt.subplots(len(ylabels), 1, figsize=(8, 3 * max(len(ylabels), 1)))
        if len(ylabels) == 1:
            axes = [axes]
        for ax, y in zip(axes, ylabels):
            sub = df.dropna(subset=[y]) if y in df.columns else df
            ax.plot(sub[xlabel], sub[y])
            ax.set_xlabel(xlabel)
            ax.set_ylabel(y)
            ax.grid(True, alpha=0.3)
        fig.tight_layout()
        if save_path:
            fig.savefig(save_path)
        if show:
            plt.show()
        plt.close(fig)
        return df


class HistoryViewers:
    """Compare multiple runs (parity: HistoryViewers)."""

    def __init__(self, save_dirs: List[str]):
        self.viewers = {d: HistoryViewer(d) for d in save_dirs}

    def plot(self, xlabel="env_steps", ylabel="mean_episode_reward", save_path=None, show=True):
        import matplotlib

        if not show:
            matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(8, 5))
        for name, v in self.viewers.items():
            df = v.to_df()
            if ylabel in df.columns:
                sub = df.dropna(subset=[ylabel])
                ax.plot(sub[xlabel], sub[ylabel], label=os.path.basename(name))
        ax.set_xlabel(xlabel)
        ax.set_ylabel(ylabel)
        ax.legend()
        ax.grid(True, alpha=0.3)
        if save_path:
            fig.savefig(save_path)
        if show:
            plt.show()
        plt.close(fig)
