from . import sim3

__all__ = ["sim3"]
