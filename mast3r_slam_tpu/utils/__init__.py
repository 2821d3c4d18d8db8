from . import metrics, timing

__all__ = ["metrics", "timing"]
