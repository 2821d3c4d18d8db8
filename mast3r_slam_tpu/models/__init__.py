from . import convert, dpt, layers, mast3r, rope, vit
from .mast3r import MASt3RConfig, TINY, init_params

__all__ = ["convert", "dpt", "layers", "mast3r", "rope", "vit",
           "MASt3RConfig", "TINY", "init_params"]
