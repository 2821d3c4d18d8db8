from . import gradient, matching

__all__ = ["gradient", "matching"]
