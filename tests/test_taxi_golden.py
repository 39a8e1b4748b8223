"""Golden-value + DuckDB-parity tests for the taxi surface (SURVEY.md §5).

Replays the reference's de-facto test corpus (expected-value comments beside
each query) against the deterministic synthetic fixture: hand-derived counts
from the fixture's injection table, plus order-insensitive DuckDB parity for
every DQ check (REF:60-243) and analysis query (REF:286-390).
"""

from __future__ import annotations

import os

import duckdb
import pytest

from nyc_taxi_dataset_analysis_apache_hive_spark.operators import analysis, etl, quality
from nyc_taxi_dataset_analysis_apache_hive_spark.sources.readers import (
    read_trips_csv,
    read_trips_parquet,
)
from nyc_taxi_dataset_analysis_apache_hive_spark.sources.writers import (
    write_clean_partitioned,
)

from tests.parity import compare
from tests.taxi_fixture import (
    DIRTY,
    N_CLEAN,
    NULLS,
    dirty_count,
    removed_count,
    total_count,
    write_fixture,
)

HOUR_DIFF_SQL = (
    "(epoch(tpep_dropoff_datetime) - epoch(tpep_pickup_datetime)) / 3600"
)

#: conjunctive clean filter, the REF:268-269 form (NULLs drop out).
CLEAN_WHERE = f"""
    fare_amount >= 0 AND tip_amount >= 0
    AND extra IN (0.0, 0.5, 1.0)
    AND passenger_count > 0
    AND tolls_amount >= 0 AND improvement_surcharge >= 0
    AND mta_tax >= 0 AND total_amount >= 0
    AND ratecodeid <> '99'
    AND year(tpep_pickup_datetime) = 2017
    AND month(tpep_pickup_datetime) IN (11, 12)
    AND {HOUR_DIFF_SQL} >= 0 AND {HOUR_DIFF_SQL} <= 24
"""


@pytest.fixture(scope="module")
def fixture_paths(tmp_path_factory):
    return write_fixture(str(tmp_path_factory.mktemp("taxi")))


@pytest.fixture(scope="module")
def trips(spark, fixture_paths):
    return read_trips_parquet(spark, fixture_paths["parquet"])


@pytest.fixture(scope="module")
def clean(trips):
    return etl.clean_trips(trips)


@pytest.fixture(scope="module")
def taxi_con(fixture_paths):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW trips AS SELECT * FROM "
        f"read_parquet('{fixture_paths['parquet']}')"
    )
    con.execute(
        "CREATE VIEW clean AS SELECT *,"
        " CAST(year(tpep_pickup_datetime) AS INT) AS yr,"
        " CAST(month(tpep_pickup_datetime) AS INT) AS mnth"
        f" FROM trips WHERE {CLEAN_WHERE}"
    )
    return con


# ---------------------------------------------------------------------------
# Hand-derived golden counts (the SURVEY §5 corpus shape, fixture values)
# ---------------------------------------------------------------------------


def _as_map(df, key_col, val_col):
    return {r[key_col]: r[val_col] for r in df.collect()}


def test_vendor_counts_golden(trips):
    got = _as_map(quality.vendor_counts(trips), "vendor", "total")
    assert got == {v: total_count(v) for v in ("1", "2")}


def test_dirty_row_counts_golden(trips):
    got = _as_map(quality.dirty_row_counts(trips), "vendorid", "cnt")
    assert got == {v: dirty_count(v) for v in ("1", "2")}


def test_removed_vs_dirty_distinguishes_nulls(trips):
    """NULL rows are removed by the clean filter but NOT dirty-matched."""
    got = _as_map(etl.removed_row_counts(trips), "vendorid", "cnt")
    assert got == {v: removed_count(v) for v in ("1", "2")}
    assert any(removed_count(v) != dirty_count(v) for v in ("1", "2"))


def test_clean_counts_golden(clean):
    got = _as_map(etl.clean_vendor_counts(clean), "vendorid", "cnt")
    assert got == dict(N_CLEAN)


def test_validate_clean_empty(clean):
    assert etl.validate_clean(clean).count() == 0


def test_negative_distances_empty(trips):
    assert quality.negative_distances(trips).count() == 0


@pytest.mark.parametrize(
    "check,category",
    [
        ("negative_tips", "neg_tip"),
        ("negative_fares", "neg_fare"),
        ("nonpositive_passengers", "zero_passenger"),
    ],
)
def test_negative_row_checks_golden(trips, check, category):
    df = getattr(quality, check)(trips)
    per_vendor = _as_map(df.groupBy("vendorid").count(), "vendorid", "count")
    assert per_vendor == DIRTY[category]


def test_invalid_duration_golden(trips):
    df = quality.invalid_duration_trips(trips)
    per_vendor = _as_map(df.groupBy("vendorid").count(), "vendorid", "count")
    expected = {
        v: DIRTY["neg_duration"].get(v, 0) + DIRTY["long_duration"].get(v, 0)
        for v in ("1", "2")
    }
    assert per_vendor == expected


def test_count_col_skips_nulls(trips):
    """A2: COUNT(col) vs COUNT(*) -- null_tolls rows must not be counted."""
    # All negative-toll rows are vendor 2 by construction; the vendor-1
    # NULL-toll row is neither negative nor counted.
    got = _as_map(
        quality.negative_toll_counts(trips), "vendorid", "count_negative_tolls"
    )
    assert got == DIRTY["neg_tolls"]


def test_samples_respect_limit(trips):
    assert quality.negative_mta_sample(trips, 5).count() == min(
        5, sum(DIRTY["neg_mta"].values())
    )
    assert quality.peek(trips, 3).count() == 3


# ---------------------------------------------------------------------------
# DuckDB parity: every DQ check (REF:60-243)
# ---------------------------------------------------------------------------

QUALITY_ORACLES = {
    "vendor_counts": (
        "SELECT vendorid AS vendor, count(*) AS total FROM trips "
        "GROUP BY vendorid"
    ),
    "vendor_pct": (
        "SELECT vendorid, count(*) AS vendor_cnt, "
        "CAST(count(*) * 100.0 / sum(count(*)) OVER () AS DECIMAL(10,2)) "
        "AS vendorid_percent FROM trips GROUP BY vendorid"
    ),
    "date_range_by_vendor": (
        "SELECT vendorid, min(tpep_pickup_datetime) AS min_pickup_time, "
        "min(tpep_dropoff_datetime) AS min_dropoff_time, "
        "max(tpep_pickup_datetime) AS max_pickup_time, "
        "max(tpep_dropoff_datetime) AS max_dropoff_time "
        "FROM trips GROUP BY vendorid"
    ),
    "hour_diff_stats": (
        f"SELECT vendorid, min({HOUR_DIFF_SQL}) AS minval, "
        f"max({HOUR_DIFF_SQL}) AS maxval, avg({HOUR_DIFF_SQL}) AS average "
        "FROM trips GROUP BY vendorid"
    ),
    "invalid_duration_trips": (
        f"SELECT vendorid, {HOUR_DIFF_SQL} AS hour_diff FROM trips "
        f"WHERE {HOUR_DIFF_SQL} < 0 OR {HOUR_DIFF_SQL} > 24"
    ),
    "negative_tips": (
        "SELECT vendorid, tip_amount FROM trips WHERE tip_amount < 0"
    ),
    "negative_fares": (
        "SELECT vendorid, fare_amount FROM trips WHERE fare_amount < 0"
    ),
    "negative_fare_counts": (
        "SELECT vendorid, count(fare_amount) AS cnt FROM trips "
        "WHERE fare_amount < 0 GROUP BY vendorid"
    ),
    "nonstandard_extra_distribution": (
        "SELECT vendorid, extra, count(*) AS cnt FROM trips "
        "WHERE extra NOT IN (0.0, 0.5, 1.0) GROUP BY vendorid, extra"
    ),
    "nonstandard_extra_counts": (
        "SELECT vendorid, count(*) AS cnt FROM trips "
        "WHERE extra NOT IN (0.0, 0.5, 1.0) GROUP BY vendorid"
    ),
    "nonpositive_passengers": (
        "SELECT vendorid, passenger_count FROM trips WHERE passenger_count <= 0"
    ),
    "zero_passenger_counts": (
        "SELECT vendorid, passenger_count, count(passenger_count) AS cnt "
        "FROM trips WHERE passenger_count <= 0 GROUP BY vendorid, passenger_count"
    ),
    "negative_toll_counts": (
        "SELECT vendorid, count(tolls_amount) AS count_negative_tolls "
        "FROM trips WHERE tolls_amount < 0 GROUP BY vendorid"
    ),
    "negative_surcharge_counts": (
        "SELECT vendorid, count(improvement_surcharge) AS "
        "count_negative_improvement_charge FROM trips "
        "WHERE improvement_surcharge < 0 GROUP BY vendorid"
    ),
    "negative_mta_counts": (
        "SELECT vendorid, count(*) AS no_of_records FROM trips "
        "WHERE mta_tax < 0 GROUP BY vendorid"
    ),
    "negative_total_counts": (
        "SELECT vendorid, count(*) AS cnt FROM trips "
        "WHERE total_amount < 0 GROUP BY vendorid"
    ),
    "payment_type_distribution": (
        "SELECT vendorid, payment_type, count(*) AS cnt FROM trips "
        "GROUP BY vendorid, payment_type"
    ),
    "store_fwd_distribution": (
        "SELECT vendorid, store_and_fwd_flag, count(*) AS cnt FROM trips "
        "GROUP BY vendorid, store_and_fwd_flag"
    ),
    "ratecode_distribution": (
        "SELECT vendorid, ratecodeid, count(*) AS cnt FROM trips "
        "GROUP BY vendorid, ratecodeid"
    ),
    "negative_distances": (
        "SELECT vendorid, trip_distance FROM trips WHERE trip_distance < 0"
    ),
    "dirty_row_counts": (
        "SELECT vendorid, count(*) AS cnt FROM trips WHERE "
        "fare_amount < 0 OR tip_amount < 0 "
        "OR extra NOT IN (0.0, 0.5, 1.0) OR passenger_count <= 0 "
        "OR tolls_amount < 0 OR improvement_surcharge < 0 OR mta_tax < 0 "
        "OR total_amount < 0 OR ratecodeid = '99' "
        f"OR {HOUR_DIFF_SQL} < 0 OR {HOUR_DIFF_SQL} > 24 "
        "OR year(tpep_pickup_datetime) <> 2017 "
        "OR month(tpep_pickup_datetime) NOT IN (11, 12) "
        "GROUP BY vendorid"
    ),
}


@pytest.mark.parametrize("name", sorted(QUALITY_ORACLES))
def test_quality_check_parity(name, trips, taxi_con):
    df = getattr(quality, name)(trips)
    problems = compare(df, taxi_con, QUALITY_ORACLES[name], name, float_tol=1e-9)
    assert not problems, "\n".join(problems)


# ---------------------------------------------------------------------------
# DuckDB parity: analysis queries over the cleaned table (REF:286-390)
# ---------------------------------------------------------------------------

ANALYSIS_ORACLES = {
    "avg_fare_by_month": (
        "SELECT mnth, round(avg(fare_amount), 2) AS avg FROM clean GROUP BY mnth"
    ),
    "passenger_count_pct": (
        "SELECT passenger_count AS level, count(*) AS number_of_trips, "
        "CAST(count(*) * 100.0 / sum(count(*)) OVER () AS DECIMAL(10,2)) "
        "AS pct_number_of_trips FROM clean GROUP BY passenger_count"
    ),
    "payment_type_pct": (
        "SELECT payment_type AS paymt_type, count(*) AS paymt_cnt, "
        "CAST(count(*) * 100.0 / sum(count(*)) OVER () AS DECIMAL(10,2)) "
        "AS pct_paymt_cnt FROM clean GROUP BY payment_type"
    ),
    "avg_tip": "SELECT round(avg(tip_amount), 2) AS avg_tip FROM clean",
    "extra_charge_fraction": (
        "SELECT round(CAST(a.extra AS DOUBLE) / b.total, 2) "
        "AS pct_trips_with_extra_charge FROM "
        "(SELECT count(*) AS extra FROM clean WHERE extra > 0) a, "
        "(SELECT count(*) AS total FROM clean) b"
    ),
    "corr_passengers_tip": (
        "SELECT round(corr(passenger_count, tip_amount), 2) "
        "AS corr_passenger_tip FROM clean"
    ),
    "avg_tip_by_passenger_count": (
        "SELECT passenger_count AS level, avg(tip_amount) AS avg_tip_amt "
        "FROM clean GROUP BY passenger_count"
    ),
    "tip_segment_pct": (
        "SELECT CASE WHEN tip_amount < 5 THEN '[0-5)' "
        "WHEN tip_amount >= 5 AND tip_amount < 10 THEN '[5-10)' "
        "WHEN tip_amount >= 10 AND tip_amount < 15 THEN '[10-15)' "
        "WHEN tip_amount >= 15 AND tip_amount < 20 THEN '[15-20)' "
        "ELSE '>=20' END AS tip_segment, "
        "CAST(count(*) * 100.0 / sum(count(*)) OVER () AS DECIMAL(10,2)) "
        "AS tip_segment_percent FROM clean GROUP BY tip_segment"
    ),
    "avg_speed_by_month": (
        "SELECT mnth, round(avg(trip_distance / "
        f"nullif({HOUR_DIFF_SQL}, 0)), 2) AS avg_speed_per_hour "
        "FROM clean GROUP BY mnth"
    ),
    "avg_speed_2017": (
        "SELECT round(avg(trip_distance / "
        f"nullif({HOUR_DIFF_SQL}, 0)), 2) AS avg_speed_in_2017 "
        "FROM clean WHERE year(tpep_pickup_datetime) = 2017"
    ),
    "avg_speed_holidays": (
        "SELECT CAST(tpep_pickup_datetime AS DATE) AS pickup_date, "
        "round(avg(trip_distance / "
        f"nullif({HOUR_DIFF_SQL}, 0)), 2) AS avg_speed_per_hour "
        "FROM clean WHERE mnth = 12 "
        "AND day(tpep_pickup_datetime) IN (25, 31) "
        "GROUP BY CAST(tpep_pickup_datetime AS DATE)"
    ),
}


@pytest.mark.parametrize("name", sorted(ANALYSIS_ORACLES))
def test_analysis_parity(name, clean, taxi_con):
    df = getattr(analysis, name)(clean)
    problems = compare(df, taxi_con, ANALYSIS_ORACLES[name], name, float_tol=1e-9)
    assert not problems, "\n".join(problems)


def test_tip_percentiles_exact_parity(clean, taxi_con):
    df = analysis.tip_percentiles(clean, exact=True)
    sql = (
        "SELECT [quantile_cont(tip_amount, 0.25), "
        "quantile_cont(tip_amount, 0.50), "
        "quantile_cont(tip_amount, 0.75)] AS tip_percentiles FROM clean"
    )
    problems = compare(df, taxi_con, sql, "tip_percentiles", float_tol=1e-9)
    assert not problems, "\n".join(problems)


def test_tip_percentiles_default_is_approx_and_tracks_exact(clean):
    """The no-arg call takes the sketch path (the 100-TB default: mergeable
    one-pass percentile_approx, no global sort) and must track the exact
    interpolated percentile within the sketch's accuracy."""
    [d] = analysis.tip_percentiles(clean).collect()  # default = approx
    [e] = analysis.tip_percentiles(clean, exact=True).collect()
    p25, p50, p75 = d["tip_percentiles"]
    assert 0 <= p25 <= p50 <= p75
    for a, x in zip(d["tip_percentiles"], e["tip_percentiles"]):
        assert a == pytest.approx(x, rel=0.02, abs=0.05), (a, x)


# ---------------------------------------------------------------------------
# Sources: CSV scan parity (S1) and the partitioned ETL sink (S2/S3)
# ---------------------------------------------------------------------------


def test_csv_parquet_scan_parity(spark, fixture_paths, trips):
    """S1: schema'd CSV read reproduces the parquet contents exactly."""
    csv_df = read_trips_csv(spark, fixture_paths["csv"])
    assert [f.simpleString() for f in csv_df.schema.fields] == [
        f.simpleString() for f in trips.schema.fields
    ]
    key = [
        "vendorid",
        "tpep_pickup_datetime",
        "fare_amount",
        "tip_amount",
        "total_amount",
    ]
    csv_rows = sorted(map(tuple, csv_df.select(*key).collect()))
    pq_rows = sorted(map(tuple, trips.select(*key).collect()))
    assert csv_rows == pq_rows


def test_partitioned_write_roundtrip(spark, clean, tmp_path):
    """S3: dynamic-partition write produces yr=/mnth= dirs and round-trips."""
    out = str(tmp_path / "clean_out")
    write_clean_partitioned(clean, out)
    assert sorted(
        d for d in os.listdir(out) if d.startswith("yr=")
    ) == ["yr=2017"]
    months = sorted(os.listdir(os.path.join(out, "yr=2017")))
    assert months == ["mnth=11", "mnth=12"]
    back = spark.read.parquet(out)
    assert back.count() == clean.count()
    # partition pruning: a mnth filter must scan only the Dec directory
    plan = back.filter("mnth = 12")._jdf.queryExecution().executedPlan().toString()
    assert "mnth=11" not in plan


def test_dynamic_partition_overwrite_preserves_other_partition(
    spark, clean, tmp_path
):
    """Dynamic mode (REF:4-10 analog): overwriting December must not delete
    November."""
    out = str(tmp_path / "clean_dyn")
    write_clean_partitioned(clean, out)
    nov_before = spark.read.parquet(out).filter("mnth = 11").count()
    dec_only = spark.read.parquet(out).filter("mnth = 12").limit(10)
    dec_only.write.mode("overwrite").partitionBy("yr", "mnth").parquet(out)
    assert spark.read.parquet(out).filter("mnth = 11").count() == nov_before
    assert spark.read.parquet(out).filter("mnth = 12").count() == 10
