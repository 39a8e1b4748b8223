"""Mergeable HLL sketch rollup: per-period accuracy vs exact, range-merge
accuracy, union associativity (merge-of-halves == direct), and parquet
round-trip of the persisted sketch table."""

from __future__ import annotations

from datetime import datetime

import pytest

from pyspark.sql import functions as F

from nyc_taxi_dataset_analysis_apache_hive_spark.operators import sketches as sk
from nyc_taxi_dataset_analysis_apache_hive_spark.sources.readers import load_table


@pytest.fixture(scope="module")
def events(spark, sf0001_dir):
    return load_table(spark, sf0001_dir, "events")


@pytest.fixture(scope="module")
def daily(events):
    return sk.sketch_rollup(events, "ts", "user_id", grain="day").localCheckpoint()


def _tol(exact: int) -> float:
    return max(0.05 * exact, 2.0)


def test_per_day_estimates_close_to_exact(spark, events, daily):
    exact = {
        r["period"]: r["n"]
        for r in events.groupBy(
            F.date_trunc("day", "ts").alias("period")
        )
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    got = {r["period"]: r["n_distinct_est"] for r in sk.distinct_by_period(daily).collect()}
    assert set(got) == set(exact)
    for p, n in exact.items():
        assert abs(got[p] - n) <= _tol(n), p


def test_range_merge_close_to_exact(spark, events, daily):
    start, end = datetime(2024, 1, 10), datetime(2024, 1, 20)
    exact = (
        events.filter((F.col("ts") >= start) & (F.col("ts") < end))
        .agg(F.countDistinct("user_id").alias("n"))
        .first()["n"]
    )
    est = sk.distinct_over_range(daily, start, end).first()["n_distinct_est"]
    assert exact > 0 and abs(est - exact) <= _tol(exact)


def test_union_of_halves_equals_direct_sketch(spark, events):
    """Associativity: merging the two halves' sketches estimates exactly
    what one sketch over everything estimates (same lg_k, same keys)."""
    whole = events.agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg(F.col("user_id"), F.lit(12))
        ).alias("est")
    ).first()["est"]
    halves = (
        events.groupBy((F.col("event_id") % 2).alias("half"))
        .agg(F.hll_sketch_agg(F.col("user_id"), F.lit(12)).alias("sketch"))
    )
    merged = halves.agg(
        F.hll_sketch_estimate(
            F.hll_union_agg(F.col("sketch"), F.lit(False))
        ).alias("est")
    ).first()["est"]
    assert merged == whole


def test_sketch_table_parquet_roundtrip(spark, daily, tmp_path):
    """The persisted pattern: sketch column is plain BINARY, survives a
    parquet round-trip, and answers queries without the raw table."""
    out = str(tmp_path / "daily_sketches")
    daily.write.mode("overwrite").parquet(out)
    back = spark.read.parquet(out)
    a = {r["period"]: r["n_distinct_est"] for r in sk.distinct_by_period(daily).collect()}
    b = {r["period"]: r["n_distinct_est"] for r in sk.distinct_by_period(back).collect()}
    assert a == b
