"""Cohort-retention gate: DuckDB oracle at driver-compare rigor (the same
value-hash machinery the correctness gate uses), over the events table."""

from __future__ import annotations

from nyc_taxi_dataset_analysis_apache_hive_spark.operators import cohorts
from nyc_taxi_dataset_analysis_apache_hive_spark.sources.readers import load_table
from tests.parity import compare, duckdb_conn


def _oracle(width: int) -> str:
    # All-BIGINT arithmetic: DuckDB's `//` on DOUBLE/DECIMAL is NOT floor
    # division (1706657176.22 // 86400 -> 19752.976..., and a later CAST
    # ROUNDS it up) -- epoch_us() returns BIGINT where // is true integer
    # division.  make_timestamp() (not to_timestamp) keeps the result a
    # naive TIMESTAMP matching Spark's session-UTC TimestampType.
    width_us = width * 1_000_000
    return f"""
    WITH firsts AS (
      SELECT user_id,
             (epoch_us(min(ts)) // {width_us}) * {width_us} AS cohort_us
      FROM events GROUP BY user_id
    ),
    active AS (
      SELECT DISTINCT user_id,
             (epoch_us(ts) // {width_us}) * {width_us} AS act_us
      FROM events
    )
    SELECT make_timestamp(cohort_us) AS cohort_start,
           CAST((act_us - cohort_us) // {width_us} AS BIGINT) AS periods_since,
           CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_active_users
    FROM active a JOIN firsts f USING (user_id)
    GROUP BY cohort_us, periods_since
    """


def test_cohort_retention_matches_duckdb(spark, sf0001_dir):
    ev = load_table(spark, sf0001_dir, "events")
    con = duckdb_conn(sf0001_dir)
    for period, width in (("day", 86_400), ("week", 7 * 86_400)):
        df = cohorts.cohort_retention(ev, period=period)
        probs = compare(df, con, _oracle(width), f"cohorts_{period}")
        assert not probs, probs
    con.close()


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
