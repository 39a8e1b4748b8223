"""Vector math over ``array<float|double>`` columns via higher-order functions.

Everything stays JVM-side (``zip_with`` / ``aggregate`` / ``transform``) --
no UDF, no Python per-row cost; whole-stage codegen applies.  Inputs are cast
to array<double> so arithmetic is double-precision end to end (and matches a
DuckDB DOUBLE[] oracle bit-for-bit in practice).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double_array(v: str | Column) -> Column:
    c = F.col(v) if isinstance(v, str) else v
    return c.cast("array<double>")


def dot(a: str | Column, b: str | Column) -> Column:
    """Dot product: fold over zip_with products (sequential, deterministic)."""
    prods = F.zip_with(as_double_array(a), as_double_array(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(v: str | Column) -> Column:
    sq = F.transform(as_double_array(v), lambda x: x * x)
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: str | Column, b: str | Column) -> Column:
    """Cosine similarity; NULL when either vector has zero norm."""
    return dot(a, b) / F.nullif(l2_norm(a) * l2_norm(b), F.lit(0.0))


def sign_bucket(v: str | Column, n_bits: int = 8) -> Column:
    """Deterministic LSH bucket: sign pattern of the first ``n_bits`` dims.

    A data-independent axis-aligned random-hyperplane LSH (the hyperplanes
    are the coordinate axes).  Two vectors with high cosine similarity agree
    on most coordinate signs, so near neighbours collide with high
    probability; at scale this turns brute-force O(Q*N) into a bucket-local
    join on the 2^n_bits buckets.
    """
    arr = as_double_array(v)
    bits = [
        F.when(F.element_at(arr, i + 1) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for i in range(n_bits)
    ]
    return F.concat(*bits)
