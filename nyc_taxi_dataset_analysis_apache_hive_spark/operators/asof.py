"""As-of (nearest-preceding-event) join -- a time-series operator Spark has
no built-in for.

Composed from existing DataFrame ops (SURVEY.md guidance: composition before
Pandas UDFs): tag the two sides, union them, and take ``last(right-side
attrs, ignoreNulls)`` over a per-key window ordered by event time.  One
shuffle on the key, one task-local sort -- the same cost as a sort-merge
join -- instead of the naive range-join (left x right per key) which
explodes quadratically on hot keys.

At 100 TB this is the only shape that survives: state per row is O(1)
(carry-forward of the latest right-side row), the per-key window never
materializes pairs, and skewed keys degrade to a large sort, not a cross
product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    strict: bool = True,
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right_ts < left_ts`` (``<=`` when ``strict=False``), per ``on`` key.

    Returns the left rows plus ``right_cols`` (NULL when no right row
    precedes).  Ties on equal timestamps: right rows sort before left rows
    when strict (so an equal-time right row is NOT matched), after when
    non-strict (it IS matched) -- deterministic either way.
    """
    lcols = left.columns
    # Tie order at equal _ts decides strictness: the carry-forward window
    # ends at the current row, so a right row sorting BEFORE the left row is
    # visible to it (matched, <=) and one sorting AFTER is not (<).
    side_right = 1 if strict else 0
    side_left = 1 - side_right

    tagged_r = right.select(
        F.col(on).alias(on),
        F.col(right_ts).alias("_ts"),
        F.lit(side_right).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
        *[F.lit(None).alias(f"_l_{c}") for c in lcols if c != on],
    )
    tagged_l = left.select(
        F.col(on),
        F.col(left_ts).alias("_ts"),
        F.lit(side_left).alias("_side"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"_r_{c}") for c in right_cols],
        *[F.col(c).alias(f"_l_{c}") for c in lcols if c != on],
    )
    w = (
        Window.partitionBy(on)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged_r.unionByName(tagged_l).select(
        on,
        "_ts",
        "_side",
        *[F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_rv_{c}") for c in right_cols],
        *[F.col(f"_l_{c}") for c in lcols if c != on],
    )
    return carried.filter(F.col("_side") == side_left).select(
        F.col(on),
        F.col("_ts").alias(left_ts),
        *[F.col(f"_l_{c}").alias(c) for c in lcols if c not in (on, left_ts)],
        *[F.col(f"_rv_{c}").alias(f"{c}_asof") for c in right_cols],
    )
