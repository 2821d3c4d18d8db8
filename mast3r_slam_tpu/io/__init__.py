from . import datasets, export, image

__all__ = ["datasets", "export", "image"]
