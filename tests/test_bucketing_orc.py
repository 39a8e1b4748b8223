"""S2 sink semantics: bucketed catalog tables (CLUSTERED BY ... SORTED BY,
REF:255) and the ORC format variant (REF:256-258).

The point of bucketing is plan-visible: two tables bucketed on the same key
join WITHOUT a shuffle (no Exchange above either scan), which is the
100-TB payoff the reference bought with its 5-bucket layout.
"""

from __future__ import annotations

import re

import pytest

from pyspark.sql import functions as F

from nyc_taxi_dataset_analysis_apache_hive_spark.plans.explain import explain_str
from nyc_taxi_dataset_analysis_apache_hive_spark.sources.readers import load_table
from nyc_taxi_dataset_analysis_apache_hive_spark.sources.writers import (
    write_clean_partitioned,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    """orders + lineitem bucketed 4-ways on the join key, via saveAsTable."""
    # spark.sql.warehouse.dir is static; tables land in the session's
    # default warehouse and are dropped in teardown
    import shutil

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    o = load_table(spark, SF, "orders")
    li = load_table(spark, SF, "lineitem")
    for df, name, key in ((o, "orders_b", "o_orderkey"), (li, "lineitem_b", "l_orderkey")):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        # an orphaned location from a previous session blocks saveAsTable
        shutil.rmtree(f"{wh}/{name}", ignore_errors=True)
        (
            df.write.mode("overwrite")
            .bucketBy(4, key)
            .sortBy(key)
            .format("parquet")
            .saveAsTable(name)
        )
    yield "orders_b", "lineitem_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    ot, lt = bucketed_tables
    o = spark.table(ot)
    li = spark.table(lt)
    # at this tiny SF Catalyst would broadcast; force the sort-merge path the
    # bucket layout exists for (at 100 TB neither side broadcasts)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = o.join(li, o.o_orderkey == li.l_orderkey).groupBy(
            "o_orderpriority"
        ).count()
        plan = explain_str(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # the join must not be preceded by an Exchange on either side; the only
    # allowed exchange is the one for the groupBy above the join
    join_idx = plan.index("SortMergeJoin")
    below_join = plan[join_idx:]
    assert "Exchange hashpartitioning" not in below_join
    assert "SelectedBucketsCount" in plan


def test_bucketed_join_matches_unbucketed(spark, bucketed_tables):
    ot, lt = bucketed_tables
    o_raw = load_table(spark, SF, "orders")
    li_raw = load_table(spark, SF, "lineitem")
    bucketed = (
        spark.table(ot)
        .join(spark.table(lt), F.col("o_orderkey") == F.col("l_orderkey"))
        .count()
    )
    plain = o_raw.join(li_raw, o_raw.o_orderkey == li_raw.l_orderkey).count()
    assert bucketed == plain


def test_orc_partitioned_roundtrip(spark, tmp_path):
    """The reference's actual sink format (STORED AS ORC + Snappy)."""
    li = load_table(spark, SF, "lineitem").withColumn(
        "yr", F.year("l_shipdate").cast("int")
    )
    out = str(tmp_path / "orc_out")
    write_clean_partitioned(li, out, fmt="orc", partition_cols=("yr",))
    back = spark.read.orc(out)
    assert back.count() == li.count()
    assert sorted(back.columns) == sorted(li.columns)
    # ORC predicate pushdown on a partition column prunes directories
    years = [r["yr"] for r in back.select("yr").distinct().collect()]
    assert len(years) > 1
    one_year = back.filter(F.col("yr") == years[0])
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", explain_str(one_year))
    assert m and "yr" in m.group(1)
