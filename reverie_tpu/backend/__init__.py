from . import cpu

__all__ = ["cpu"]
