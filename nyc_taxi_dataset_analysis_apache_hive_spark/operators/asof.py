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
product.  For the pathological hot key (one key holding most of the left
rows), ``n_salts`` sub-partitions the window: left rows fan out over
``n_salts`` salt buckets while the key's (typically far smaller) right
timeline replicates into every bucket -- each bucket still sees the full
right history, so results are bit-identical and the hot key's sort spreads
over ``n_salts`` tasks instead of one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    strict: bool = True,
    n_salts: int | None = None,
    salt_from: str | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right_ts < left_ts`` (``<=`` when ``strict=False``), per ``on`` key
    (a single column name or a composite-key list -- e.g. ``["symbol",
    "exchange"]`` for market data; both sides must carry every key).

    Returns the left rows plus ``right_cols`` (NULL when no right row
    precedes).  Ties on equal timestamps: right rows sort before left rows
    when strict (so an equal-time right row is NOT matched), after when
    non-strict (it IS matched) -- deterministic either way.

    ``n_salts`` is the hot-key treatment (same deterministic-salt family
    as ``skew.salted_join``): left rows take ``salt =
    hash(salt_from) % n_salts`` (default ``salt_from=left_ts`` -- within a
    hot key the timestamps vary, so its rows spread ~uniformly) and every
    right row replicates to ALL ``n_salts`` buckets, so the carry-forward
    window -- now partitioned by ``(on, salt)`` -- still sees the key's
    complete right timeline in every bucket.  Results are bit-identical to
    the unsalted form (equivalence-tested on a 90%-one-key fixture); the
    cost is an ``n_salts``-fold right-side replication, the right trade
    when the left side is events (huge, skewed) and the right side is
    state changes (small).  Default None keeps the single-window plan.
    """
    if n_salts is not None and n_salts < 1:
        raise ValueError(f"n_salts must be >= 1, got {n_salts}")
    salted = n_salts is not None and n_salts > 1
    if salt_from is not None and not salted:
        raise ValueError(
            "salt_from requires n_salts > 1 -- passing it alone would "
            "silently run the unsalted plan"
        )
    keys = [on] if isinstance(on, str) else list(on)
    lcols = left.columns
    # Tie order at equal _ts decides strictness: the carry-forward window
    # ends at the current row, so a right row sorting BEFORE the left row is
    # visible to it (matched, <=) and one sorting AFTER is not (<).
    side_right = 1 if strict else 0
    side_left = 1 - side_right

    # ONE projection list serves both the plain and salted paths (the salt
    # is the only difference): left rows carry their deterministic salt,
    # right rows explode to every bucket so each bucket holds the key's
    # full right timeline.
    l_salt_cols, part_keys = [], list(keys)
    if salted:
        from .skew import _salt

        src = salt_from if salt_from is not None else left_ts
        l_salt_cols = [_salt(F.col(src), n_salts).alias("_asof_salt")]
        part_keys.append("_asof_salt")
    tagged_r = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("_ts"),
        F.lit(side_right).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
        *[F.lit(None).alias(f"_l_{c}") for c in lcols if c not in keys],
    )
    tagged_l = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("_ts"),
        F.lit(side_left).alias("_side"),
        *l_salt_cols,
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"_r_{c}") for c in right_cols],
        *[F.col(c).alias(f"_l_{c}") for c in lcols if c not in keys],
    )
    if salted:
        tagged_r = tagged_r.withColumn(
            "_asof_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
        )
    w = (
        Window.partitionBy(*part_keys)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged_r.unionByName(tagged_l).select(
        *keys,
        "_ts",
        "_side",
        *[F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_rv_{c}") for c in right_cols],
        *[F.col(f"_l_{c}") for c in lcols if c not in keys],
    )
    return carried.filter(F.col("_side") == side_left).select(
        *[F.col(k) for k in keys],
        F.col("_ts").alias(left_ts),
        *[F.col(f"_l_{c}").alias(c) for c in lcols if c not in (*keys, left_ts)],
        *[F.col(f"_rv_{c}").alias(f"{c}_asof") for c in right_cols],
    )


def _derive_bin_seconds(
    intervals: DataFrame, start_ts: str, end_ts: str
) -> int:
    """Median interval length in whole seconds (>= 1), via the distributed
    Greenwald-Khanna sketch -- one small aggregate job, no full collect.
    Falls back to 3600 on an empty/degenerate interval set."""
    dur = intervals.select(
        (F.unix_timestamp(end_ts) - F.unix_timestamp(start_ts))
        .cast("double")
        .alias("_dur")
    ).filter(F.col("_dur") >= 0)
    med = dur.approxQuantile("_dur", [0.5], 0.01)
    if not med or med[0] <= 0:
        return 3600
    return max(1, int(med[0]))


def range_join(
    events: DataFrame,
    intervals: DataFrame,
    event_ts: str,
    start_ts: str,
    end_ts: str,
    bin_seconds: int | None = None,
    keys: list[str] | None = None,
) -> DataFrame:
    """Interval (range) join: each event row paired with every interval row
    whose ``[start_ts, end_ts]`` contains it (optionally also matching on
    equi ``keys``).

    Spark plans a bare ``l.ts BETWEEN r.s AND r.e`` as a nested-loop /
    cartesian filter -- quadratic and non-startable at scale.  This
    operator bins the time axis: intervals explode to the bins they cover
    (``sequence`` of bin ids -- one row per covered bin), events map to
    their single bin, and the join becomes an EQUI-join on (keys..., bin)
    with the exact BETWEEN predicate re-applied as a post-filter.  Each
    event belongs to exactly one bin, so no dedup is needed.  Cost:
    interval replication x (duration / bin_seconds) rows -- pick
    bin_seconds near the typical interval length so replication stays
    O(1) per interval while each bin's candidate set stays small.

    ``bin_seconds=None`` (the default) derives the bin width from the
    MEDIAN interval length (one small approxQuantile job): a fixed
    default degrades badly when interval lengths are far from it
    (replication factor = duration / bin), while the median pins the
    typical interval's replication at ~1-2 rows regardless of whether
    intervals span minutes or months (bounded-replication pytest:
    tests/test_asof_skew.py).
    """
    from ..functions.exprs import epoch_bin

    if bin_seconds is None:
        bin_seconds = _derive_bin_seconds(intervals, start_ts, end_ts)
    if bin_seconds <= 0:
        raise ValueError(f"bin_seconds must be positive, got {bin_seconds}")
    if "_bin" in events.columns or "_bin" in intervals.columns:
        raise ValueError("inputs must not carry a column named '_bin'")
    keys = keys or []
    iv_bins = F.sequence(
        epoch_bin(start_ts, bin_seconds),
        epoch_bin(end_ts, bin_seconds),
        F.lit(bin_seconds).cast("long"),
    )
    e = events.withColumn("_bin", epoch_bin(event_ts, bin_seconds)).alias("e")
    i = (
        # degenerate intervals (start > end) match nothing under BETWEEN;
        # drop them BEFORE sequence(), which would otherwise step backwards
        intervals.filter(F.col(start_ts) <= F.col(end_ts))
        .withColumn("_bin", F.explode(iv_bins))
        .alias("i")
    )
    cond = F.col("e._bin") == F.col("i._bin")
    for k in keys:
        cond = cond & (F.col(f"e.{k}") == F.col(f"i.{k}"))
    joined = e.join(i, cond).filter(
        F.col(f"e.{event_ts}").between(
            F.col(f"i.{start_ts}"), F.col(f"i.{end_ts}")
        )
    )
    # interval columns whose names collide with event columns (beyond the
    # equi-matched keys, where both sides are equal) are kept under a
    # `_interval` suffix -- never silently dropped
    out_cols = [F.col(f"e.{c}") for c in events.columns]
    for c in intervals.columns:
        if c in keys:
            continue
        if c in events.columns:
            out_cols.append(F.col(f"i.{c}").alias(f"{c}_interval"))
        else:
            out_cols.append(F.col(f"i.{c}"))
    return joined.select(*out_cols)
