from . import multihost
from .data_parallel import DataParallelEngine, make_mesh

__all__ = ["DataParallelEngine", "make_mesh", "multihost"]
