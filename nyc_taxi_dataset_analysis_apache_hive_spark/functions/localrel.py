"""Tiny in-plan relations, built JVM-side.

``spark.createDataFrame(py_list)`` parallelizes a PYTHON-backed RDD:
every job that touches the relation re-deserializes it through python
workers and schedules one task per default-parallelism slice -- on
local[32] that is a 32-task stage plus (cold) a worker-pool spin-up,
measured seconds of overhead for a two-row lookup table.  For the tiny
driver-known relations the operators join against (query-term maps,
named-seed maps, artifact geometry rows), the right spelling is a
literal ``inline(array(named_struct(...)))`` over ``range(1)``: a pure
JVM LocalRelation that constant-folds, broadcasts for free, and adds
zero python in the plan.  (Found r17 via the PCA maintenance fold --
its per-trigger one-row state frame was paying the whole spin-up.)

Only scalar types a literal can spell are supported: str, int, float,
bool, None -- plus lists of float/None (spelled ``array(...)`` with
double elements; r17, for the driver-trained centroid tables).
Anything bigger-than-driver-tiny does not belong in a literal plan at
all -- read it from storage instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _sql_literal(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, int):
        return f"CAST({v} AS BIGINT)"
    if isinstance(v, float):
        # repr round-trips doubles exactly (the house float-literal rule)
        return f"{v!r}D"
    if isinstance(v, str):
        escaped = v.replace("\\", "\\\\").replace("'", "\\'")
        return f"'{escaped}'"
    if isinstance(v, list):
        # array<double> literal: float/None elements only.  A NULL
        # element needs an explicit CAST so the array stays typed even
        # when every element is NULL.
        if not v:
            raise TypeError(
                "inline_rows: empty list literals carry no element type"
            )
        if not all(x is None or isinstance(x, float) for x in v):
            raise TypeError(
                "inline_rows: list literals must hold float/None elements"
            )
        def _dbl(x) -> str:
            if x is None:
                return "CAST(NULL AS DOUBLE)"
            if x != x:  # NaN: repr() would spell invalid SQL ("nanD")
                return "CAST('NaN' AS DOUBLE)"
            if x in (float("inf"), float("-inf")):
                return f"CAST('{'-' if x < 0 else ''}Infinity' AS DOUBLE)"
            return f"{x!r}D"

        return f"array({', '.join(_dbl(x) for x in v)})"
    raise TypeError(f"inline_rows: unsupported literal type {type(v).__name__}")


def inline_rows(
    spark: SparkSession, cols: tuple[str, ...], rows: list[tuple]
) -> DataFrame:
    """A tiny relation as a pure-JVM literal plan: one row per tuple in
    ``rows``, columns named ``cols``.  Empty ``rows`` raises -- an
    empty lookup table is almost always a caller bug, and a literal
    empty relation has no schema to carry types on."""
    if not rows:
        raise ValueError("inline_rows: rows must be non-empty")
    if any(len(r) != len(cols) for r in rows):
        raise ValueError("inline_rows: every row must match cols in length")
    structs = ", ".join(
        "named_struct("
        + ", ".join(
            f"'{c}', {_sql_literal(v)}" for c, v in zip(cols, row)
        )
        + ")"
        for row in rows
    )
    from pyspark.sql import functions as F

    return spark.range(1).select(F.expr(f"inline(array({structs}))"))
