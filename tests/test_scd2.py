"""SCD type-2 merge: hand goldens over every merge case, idempotent
re-feed, multi-batch version chains, and history invariants on real
supplier rows."""

from __future__ import annotations

from datetime import datetime

import pytest

from pyspark.sql import functions as F

from nyc_taxi_dataset_analysis_apache_hive_spark.operators import etl
from nyc_taxi_dataset_analysis_apache_hive_spark.sources.readers import load_table

DIM_SCHEMA = (
    "k long, attr string, valid_from timestamp, valid_to timestamp,"
    " is_current boolean"
)
UPD_SCHEMA = "k long, attr string, effective_ts timestamp"


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


@pytest.fixture()
def dim(spark):
    return spark.createDataFrame(
        [
            (1, "a1", _ts("2020-01-01"), _ts("2021-01-01"), False),
            (1, "a2", _ts("2021-01-01"), None, True),
            (2, "b1", _ts("2020-06-01"), None, True),
            (3, "c1", _ts("2020-09-01"), None, True),
        ],
        DIM_SCHEMA,
    )


@pytest.fixture()
def updates(spark):
    return spark.createDataFrame(
        [
            (1, "a3", _ts("2022-01-01")),  # changed -> close + new version
            (2, "b1", _ts("2022-01-01")),  # identical -> no-op
            (4, "d0", _ts("2021-06-01")),  # superseded intra-batch
            (4, "d1", _ts("2022-01-01")),  # new key, latest wins
        ],
        UPD_SCHEMA,
    )


def _rows(df):
    return {
        (r["k"], r["valid_from"]): (r["attr"], r["valid_to"], r["is_current"])
        for r in df.collect()
    }


def test_scd2_all_merge_cases(spark, dim, updates):
    got = _rows(etl.scd2_upsert(dim, updates, keys=["k"]))
    assert got == {
        (1, _ts("2020-01-01")): ("a1", _ts("2021-01-01"), False),  # history
        (1, _ts("2021-01-01")): ("a2", _ts("2022-01-01"), False),  # closed
        (1, _ts("2022-01-01")): ("a3", None, True),  # new version
        (2, _ts("2020-06-01")): ("b1", None, True),  # identical no-op
        (3, _ts("2020-09-01")): ("c1", None, True),  # untouched
        (4, _ts("2022-01-01")): ("d1", None, True),  # new key, latest wins
    }


def test_scd2_idempotent_refeed(spark, dim, updates):
    once = etl.scd2_upsert(dim, updates, keys=["k"])
    twice = etl.scd2_upsert(once, updates, keys=["k"])
    assert _rows(twice) == _rows(once)


def test_scd2_multi_batch_chain(spark, dim):
    b1 = spark.createDataFrame([(3, "c2", _ts("2021-01-01"))], UPD_SCHEMA)
    b2 = spark.createDataFrame([(3, "c3", _ts("2022-01-01"))], UPD_SCHEMA)
    got = _rows(
        etl.scd2_upsert(etl.scd2_upsert(dim, b1, keys=["k"]), b2, keys=["k"])
    )
    assert got[(3, _ts("2020-09-01"))] == ("c1", _ts("2021-01-01"), False)
    assert got[(3, _ts("2021-01-01"))] == ("c2", _ts("2022-01-01"), False)
    assert got[(3, _ts("2022-01-01"))] == ("c3", None, True)


def test_scd2_invariants_on_supplier(spark, sf0001_dir):
    """Real-table batch: exactly one open version per key, closed rows
    chain contiguously (valid_to = successor's valid_from)."""
    sup = load_table(spark, sf0001_dir, "supplier")
    dim = sup.select(
        F.col("s_suppkey").alias("k"),
        F.col("s_acctbal").cast("string").alias("attr"),
        F.lit(_ts("2020-01-01")).alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    upd = (
        sup.filter(F.col("s_suppkey") % 2 == 0)
        .select(
            F.col("s_suppkey").alias("k"),
            F.concat(F.col("s_acctbal").cast("string"), F.lit("-v2")).alias(
                "attr"
            ),
            F.lit(_ts("2023-01-01")).alias("effective_ts"),
        )
    )
    out = etl.scd2_upsert(dim, upd, keys=["k"])
    per_key = (
        out.groupBy("k")
        .agg(
            F.sum(F.col("is_current").cast("int")).alias("n_open"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .collect()
    )
    assert all(r["n_open"] == 1 for r in per_key)
    even = [r for r in per_key if r["k"] % 2 == 0]
    odd = [r for r in per_key if r["k"] % 2 == 1]
    assert even and all(r["n_rows"] == 2 for r in even)
    assert odd and all(r["n_rows"] == 1 for r in odd)
    # contiguity: every closed row's valid_to equals the next valid_from
    from pyspark.sql.window import Window

    w = Window.partitionBy("k").orderBy("valid_from")
    gaps = (
        out.withColumn("next_from", F.lead("valid_from").over(w))
        .filter(~F.col("is_current"))
        .filter(F.col("valid_to") != F.col("next_from"))
        .count()
    )
    assert gaps == 0


def test_scd2_plans_one_full_outer_join(spark, sf0001_dir):
    """The merge must stay a single full-outer join: emitting the kept/
    closed current version and the new open version as two union branches
    would plan the join twice -- the conditional-struct explode keeps it
    at one."""
    o = load_table(spark, sf0001_dir, "orders")
    dim = o.select(
        "o_orderkey",
        "o_orderpriority",
        F.col("o_orderdate").cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    upd = o.select(
        "o_orderkey",
        F.lit("X").alias("o_orderpriority"),
        F.lit("2020-01-01 00:00:00").cast("timestamp").alias("effective_ts"),
    )
    plan = (
        etl.scd2_upsert(dim, upd, ["o_orderkey"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("FullOuter") == 1, plan[:2000]
