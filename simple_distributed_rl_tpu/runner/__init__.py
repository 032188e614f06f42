from .callbacks import Checkpoint, Evaluate, HistoryOnFile, PrintProgress, RunCallback
from .engine import PlayEngine
from .runner import Runner

__all__ = [
    "Checkpoint",
    "Evaluate",
    "HistoryOnFile",
    "PlayEngine",
    "PrintProgress",
    "RunCallback",
    "Runner",
]
