"""Cohort / retention analytics over an event stream.

The classic product-analytics triangle: users grouped by their first-seen
period (the cohort), counted as active in each subsequent period.  Pure
DataFrame composition -- two aggregates and one equi-join on the user key:

    first-seen per user  (groupBy user, min ts)        -- 1 shuffle
    distinct active periods per user (groupBy user, p) -- 1 shuffle
    join on user + count distinct users per cell       -- co-keyed

At 100 TB the user-keyed shuffles dominate and are the minimum any cohort
computation needs; no window over raw events, no per-user state beyond the
aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: seconds per supported fixed-width period
_PERIOD_SECONDS = {"hour": 3_600, "day": 86_400, "week": 7 * 86_400}


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
) -> DataFrame:
    """Retention triangle: (cohort_start, periods_since, n_active_users).

    ``cohort_start`` is the start of the user's first-event period;
    ``periods_since`` counts whole periods between the cohort start and
    each period the user was active in (0 = the cohort period itself).
    ``hour``/``day``/``week`` periods are fixed-width windows aligned to
    the Unix epoch (true floor binning -- engine-portable, DuckDB-oracled
    in tests/test_cohorts.py; hourly is the launch-day/incident shape).  ``month`` uses CALENDAR months
    (``date_trunc('month')`` + ``months_between`` in the session
    timezone): the shape real product analytics wants, but deliberately
    Spark-side-only -- engines disagree on month arithmetic across
    timezones, so its gate is a python recompute of the same UTC-session
    semantics, not the cross-engine oracle.
    """
    if period == "month":
        return _cohort_retention_calendar_month(events, user_col, ts_col)

    from ..functions.exprs import epoch_bin

    if period not in _PERIOD_SECONDS:
        raise ValueError(
            f"period must be one of {sorted([*_PERIOD_SECONDS, 'month'])}"
        )
    width = _PERIOD_SECONDS[period]

    firsts = (
        events.groupBy(user_col)
        .agg(F.min(ts_col).alias("first_ts"))
        .select(user_col, epoch_bin(F.col("first_ts"), width).alias("cohort_p"))
    )
    active = events.select(
        user_col, epoch_bin(F.col(ts_col), width).alias("act_p")
    ).distinct()
    cells = active.join(firsts, user_col).select(
        user_col,
        "cohort_p",
        ((F.col("act_p") - F.col("cohort_p")) / width).cast("long").alias(
            "periods_since"
        ),
    )
    # count(*), not countDistinct: `active` is already distinct on
    # (user, act_p) and act_p -> periods_since is injective per cohort, so
    # each (cohort, period, user) cell holds exactly one row -- a distinct
    # aggregate would add a whole extra shuffle for nothing.
    return (
        cells.groupBy("cohort_p", "periods_since")
        .agg(F.count(F.lit(1)).alias("n_active_users"))
        .select(
            F.timestamp_seconds(F.col("cohort_p")).alias("cohort_start"),
            "periods_since",
            "n_active_users",
        )
    )


def _cohort_retention_calendar_month(
    events: DataFrame, user_col: str, ts_col: str
) -> DataFrame:
    """Calendar-month retention triangle: identical plan shape to the
    fixed-width path (two user-keyed aggs + one co-keyed join), with
    ``date_trunc('month')`` as the period function.  ``months_between`` on
    two month-starts is always a whole number, so the long cast is exact.
    """
    firsts = (
        events.groupBy(user_col)
        .agg(F.min(ts_col).alias("first_ts"))
        .select(
            user_col, F.date_trunc("month", F.col("first_ts")).alias("cohort_p")
        )
    )
    active = events.select(
        user_col, F.date_trunc("month", F.col(ts_col)).alias("act_p")
    ).distinct()
    cells = active.join(firsts, user_col).select(
        user_col,
        "cohort_p",
        F.months_between(F.col("act_p"), F.col("cohort_p"))
        .cast("long")
        .alias("periods_since"),
    )
    # count(*) for the same reason as the fixed-width path: `active` is
    # distinct on (user, act_p) and act_p -> periods_since is injective
    # per cohort, so each cell holds one row per user.
    return (
        cells.groupBy("cohort_p", "periods_since")
        .agg(F.count(F.lit(1)).alias("n_active_users"))
        .select(
            F.col("cohort_p").alias("cohort_start"),
            "periods_since",
            "n_active_users",
        )
    )
