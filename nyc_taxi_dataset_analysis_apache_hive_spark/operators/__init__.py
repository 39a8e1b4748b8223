from . import analysis, dedup, etl, quality, similarity, textops

__all__ = ["analysis", "dedup", "etl", "quality", "similarity", "textops"]
