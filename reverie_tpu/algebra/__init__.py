from . import gf2, z64

__all__ = ["gf2", "z64"]
