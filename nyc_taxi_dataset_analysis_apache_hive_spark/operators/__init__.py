from . import (
    analysis,
    asof,
    dedup,
    etl,
    multimodal,
    packing,
    quality,
    sampling,
    similarity,
    skew,
    textops,
)

__all__ = [
    "analysis",
    "asof",
    "dedup",
    "etl",
    "multimodal",
    "packing",
    "quality",
    "sampling",
    "similarity",
    "skew",
    "textops",
]
