from . import scalar, text

__all__ = ["scalar", "text"]
