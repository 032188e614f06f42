from . import host_per

__all__ = ["host_per"]
