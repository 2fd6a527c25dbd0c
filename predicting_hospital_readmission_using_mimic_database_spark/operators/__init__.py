from . import dedup, graph, multimodal, relational, sampling, similarity, textstats

__all__ = [
    "dedup",
    "graph",
    "multimodal",
    "relational",
    "sampling",
    "similarity",
    "textstats",
]
