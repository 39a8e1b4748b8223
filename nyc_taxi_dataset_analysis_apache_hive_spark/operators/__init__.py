from . import (
    analysis,
    asof,
    cohorts,
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
    "cohorts",
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
