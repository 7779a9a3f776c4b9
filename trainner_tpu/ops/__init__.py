from . import blocks

__all__ = ["blocks"]
