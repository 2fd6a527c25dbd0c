from . import dedup, multimodal, relational, sampling, similarity, textstats

__all__ = [
    "dedup",
    "multimodal",
    "relational",
    "sampling",
    "similarity",
    "textstats",
]
