"""Cohort-retention gate: DuckDB oracle at driver-compare rigor (the same
value-hash machinery the correctness gate uses), over the events table."""

from __future__ import annotations

from nyc_taxi_dataset_analysis_apache_hive_spark.operators import cohorts
from nyc_taxi_dataset_analysis_apache_hive_spark.sources.readers import load_table
from tests.parity import compare, duckdb_conn


def _oracle(width: int) -> str:
    # All-BIGINT arithmetic: DuckDB's `//` on DOUBLE/DECIMAL is NOT floor
    # division (1706657176.22 // 86400 -> 19752.976..., and a later CAST
    # ROUNDS it up) -- and even on BIGINT `//` TRUNCATES toward zero
    # (-5 // 2 = -2), so the floor bin uses the portable integer identity
    # ``e - ((e % w) + w) % w``, the exact mirror of Spark's
    # ``sec - pmod(sec, w)`` in functions.exprs.epoch_bin.
    # make_timestamp() (not to_timestamp) keeps the result a naive
    # TIMESTAMP matching Spark's session-UTC TimestampType.
    width_us = width * 1_000_000
    fb = f"(e - (((e % {width_us}) + {width_us}) % {width_us}))"
    return f"""
    WITH f0 AS (
      SELECT user_id, epoch_us(min(ts)) AS e FROM events GROUP BY user_id
    ),
    firsts AS (SELECT user_id, {fb} AS cohort_us FROM f0),
    a0 AS (SELECT DISTINCT user_id, epoch_us(ts) AS e FROM events),
    active AS (SELECT DISTINCT user_id, {fb} AS act_us FROM a0)
    SELECT make_timestamp(cohort_us) AS cohort_start,
           CAST((act_us - cohort_us) // {width_us} AS BIGINT) AS periods_since,
           CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_active_users
    FROM active a JOIN firsts f USING (user_id)
    GROUP BY cohort_us, periods_since
    """


def test_cohort_retention_matches_duckdb(spark, sf0001_dir):
    ev = load_table(spark, sf0001_dir, "events")
    con = duckdb_conn(sf0001_dir)
    for period, width in (("hour", 3_600), ("day", 86_400), ("week", 7 * 86_400)):
        df = cohorts.cohort_retention(ev, period=period)
        probs = compare(df, con, _oracle(width), f"cohorts_{period}")
        assert not probs, probs
    con.close()


def test_cohort_retention_calendar_month_matches_python(spark, sf0001_dir):
    """Calendar-month gate: python recompute of the same UTC-session
    semantics (deliberately not the DuckDB oracle -- engines disagree on
    month arithmetic across timezones, see the operator docstring)."""
    ev = load_table(spark, sf0001_dir, "events")
    got = {
        (r["cohort_start"], r["periods_since"]): r["n_active_users"]
        for r in cohorts.cohort_retention(ev, period="month").collect()
    }

    raw = ev.select("user_id", "ts").collect()
    month_of = {}
    active = set()
    for r in raw:
        ym = (r["ts"].year, r["ts"].month)
        u = r["user_id"]
        active.add((u, ym))
        if u not in month_of or ym < month_of[u]:
            month_of[u] = ym
    import datetime

    expected: dict = {}
    for u, ym in active:
        cy, cm = month_of[u]
        periods = (ym[0] - cy) * 12 + (ym[1] - cm)
        key = (datetime.datetime(cy, cm, 1), periods)
        expected[key] = expected.get(key, 0) + 1
    assert got == expected and got
    assert all(p >= 0 for (_, p) in got)


def test_cohort_retention_rejects_unknown_period(spark, sf0001_dir):
    import pytest

    ev = load_table(spark, sf0001_dir, "events")
    with pytest.raises(ValueError, match="period"):
        cohorts.cohort_retention(ev, period="fortnight")


def test_epoch_bin_true_floor_across_epoch_zero(spark):
    """epoch_bin must floor (uniform-width bins), not truncate toward zero:
    truncation would make one double-width bin straddling 1970 and shift
    every pre-1970 bin start by +width."""
    import math

    from pyspark.sql import functions as F

    from nyc_taxi_dataset_analysis_apache_hive_spark.functions.exprs import (
        epoch_bin,
    )

    import random

    rng = random.Random(20260813)
    secs = [-7 * 86_400, -129_601, -86_400, -43_200, -1, 0, 1, 43_200, 90_000]
    secs += [rng.randint(-2_000_000_000, 2_000_000_000) for _ in range(200)]
    df = spark.createDataFrame([(s,) for s in secs], "s long").select(
        "s", F.timestamp_seconds("s").alias("ts")
    )
    for width in (3_600, 86_400, 7 * 86_400):
        rows = df.select("s", epoch_bin("ts", width).alias("b")).collect()
        for r in rows:
            assert r["b"] == math.floor(r["s"] / width) * width, (r, width)
            assert 0 <= r["s"] - r["b"] < width, (r, width)


def test_cohort_retention_invariants(spark, sf0001_dir):
    ev = load_table(spark, sf0001_dir, "events")
    rows = cohorts.cohort_retention(ev, period="week").collect()
    assert rows
    # period 0 of each cohort contains every user of that cohort, so no
    # later period can exceed it
    by_cohort: dict = {}
    for r in rows:
        by_cohort.setdefault(r["cohort_start"], {})[r["periods_since"]] = r[
            "n_active_users"
        ]
    for cohort, periods in by_cohort.items():
        assert 0 in periods, cohort
        assert all(n <= periods[0] for n in periods.values()), cohort
    assert all(r["periods_since"] >= 0 for r in rows)
