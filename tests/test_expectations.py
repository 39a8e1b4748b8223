"""Generic DQ gate: golden tags incl. strict-NULL semantics, split
round-trip, DuckDB oracle for the report, and single-scan plan shape."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from nyc_taxi_dataset_analysis_apache_hive_spark.operators import expectations as ex
from nyc_taxi_dataset_analysis_apache_hive_spark.sources.readers import load_table
from tests.parity import compare, duckdb_conn

RULES = lambda: {  # noqa: E731 -- fresh Columns per test
    "qty_positive": F.col("l_quantity") > 0,
    "price_positive": F.col("l_extendedprice") > 0,
    "discount_in_range": (F.col("l_discount") >= 0) & (F.col("l_discount") <= 1),
}


def test_tags_and_strict_null_semantics(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, -1.0), (3, None)], "id long, x double"
    )
    got = {
        r["id"]: (r["violations"], r["passed"])
        for r in ex.apply_expectations(df, {"x_pos": F.col("x") > 0}).collect()
    }
    # NULL x violates: the rule can't prove the row clean
    assert got == {1: ([], True), 2: (["x_pos"], False), 3: (["x_pos"], False)}


def test_multiple_violations_sorted(spark):
    df = spark.createDataFrame([(1, -1.0, -2.0)], "id long, a double, b double")
    row = ex.apply_expectations(
        df, {"b_pos": F.col("b") > 0, "a_pos": F.col("a") > 0}
    ).first()
    assert row["violations"] == ["a_pos", "b_pos"]  # deterministic order


def test_quarantine_split_partitions_exactly(spark, sf0001_dir):
    li = load_table(spark, sf0001_dir, "lineitem").withColumn(
        "l_quantity",
        F.when(F.col("l_orderkey") % 97 == 0, -F.col("l_quantity")).otherwise(
            F.col("l_quantity")
        ),
    )
    clean, quar = ex.quarantine_split(li, RULES())
    n, nc, nq = li.count(), clean.count(), quar.count()
    assert nc + nq == n and nq > 0
    assert clean.columns == li.columns  # audit columns dropped
    assert "violations" in quar.columns
    assert quar.filter(F.size("violations") == 0).count() == 0


def test_expectation_report_oracle(spark, sf0001_dir):
    li = load_table(spark, sf0001_dir, "lineitem")
    got = ex.expectation_report(
        li,
        {
            "qty_le_49": F.col("l_quantity") <= 49,
            "discount_under_7pct": F.col("l_discount") < 0.07,
        },
    )
    oracle = """
        WITH t AS (
          SELECT count(*) AS n_rows,
                 sum(CASE WHEN NOT coalesce(l_quantity <= 49, FALSE)
                     THEN 1 ELSE 0 END) AS v1,
                 sum(CASE WHEN NOT coalesce(l_discount < 0.07, FALSE)
                     THEN 1 ELSE 0 END) AS v2
          FROM lineitem
        )
        SELECT 'qty_le_49' AS rule, v1 AS n_violations, n_rows,
               round(v1 / CAST(n_rows AS DOUBLE), 6) AS violation_rate FROM t
        UNION ALL
        SELECT 'discount_under_7pct', v2, n_rows,
               round(v2 / CAST(n_rows AS DOUBLE), 6) FROM t
    """
    assert compare(got, duckdb_conn(sf0001_dir), oracle, "dq_report") == []


def test_report_is_single_scan(spark, sf0001_dir):
    li = load_table(spark, sf0001_dir, "lineitem")
    plan = (
        ex.expectation_report(li, RULES())
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("FileScan parquet") + plan.count("Scan parquet") <= 2
