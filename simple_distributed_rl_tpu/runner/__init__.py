from .callbacks import Checkpoint, Evaluate, HistoryOnFile, OrbaxCheckpoint, PrintProgress, RunCallback
from .engine import PlayEngine
from .runner import Runner

__all__ = [
    "Checkpoint",
    "OrbaxCheckpoint",
    "Evaluate",
    "HistoryOnFile",
    "PlayEngine",
    "PrintProgress",
    "RunCallback",
    "Runner",
]
