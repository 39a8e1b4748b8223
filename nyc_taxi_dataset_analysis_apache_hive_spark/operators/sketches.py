"""Mergeable-sketch pre-aggregation (the incremental-OLAP scale pattern).

``a10_distinct_counts`` answers approx-distinct in one pass; at 100 TB the
winning pattern is to never re-scan raw data at query time at all:
materialize a tiny (period, sketch) table once per ingest, then answer ANY
period-range distinct-count by merging sketches -- seconds over kilobytes
instead of a full scan.  Spark 4 ships Apache DataSketches HLL natively
(``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``), so the
whole pattern stays JVM-side and the sketch column is a plain BINARY that
parquet round-trips.

Set union is associative, so daily sketches compose into weekly/monthly/
arbitrary ranges losslessly -- union-then-estimate equals
estimate-of-union by construction (asserted in tests, not assumed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sketch_rollup(
    df: DataFrame,
    time_col: str,
    key_col: str,
    grain: str = "day",
    lg_k: int = 12,
) -> DataFrame:
    """(period, n_rows, sketch): one HLL sketch of ``key_col`` per time
    grain -- the table you persist.  One shuffle on the period key; the
    sketch state is bounded (~2^lg_k bytes) regardless of row count, so
    reducers never spill on cardinality.
    """
    return (
        df.groupBy(F.date_trunc(grain, F.col(time_col)).alias("period"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.hll_sketch_agg(F.col(key_col), F.lit(lg_k)).alias("sketch"),
        )
    )


def distinct_by_period(sketches: DataFrame) -> DataFrame:
    """Per-period distinct estimates from the persisted rollup: narrow map
    over kilobytes, no raw-data scan."""
    return sketches.select(
        "period",
        "n_rows",
        F.hll_sketch_estimate("sketch").alias("n_distinct_est"),
    )


def distinct_over_range(
    sketches: DataFrame, start=None, end=None
) -> DataFrame:
    """One-row distinct estimate for [start, end): merge the range's
    sketches with ``hll_union_agg`` and estimate -- the arbitrary-range
    query that never touches raw events.  ``allowDifferentLgConfigK``
    stays False: every sketch came from :func:`sketch_rollup` at one
    lg_k, and a silent downgrade-on-merge would loosen accuracy."""
    s = sketches
    if start is not None:
        s = s.filter(F.col("period") >= start)
    if end is not None:
        s = s.filter(F.col("period") < end)
    return s.agg(
        F.hll_sketch_estimate(
            F.hll_union_agg(F.col("sketch"), F.lit(False))
        ).alias("n_distinct_est")
    )
