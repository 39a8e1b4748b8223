"""Reference-mandated operators (SURVEY §2): P/A/W/J/O/F families, S3 ETL, set ops (u1), rollup/cube (r1), scalar/JSON function surfaces.

Split out of the monolithic registry.py in round 8 (registration
order preserved by the package __init__; see its docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .base import (
    register,
    register_legs,
    _t,
)


# ---------------------------------------------------------------------------
# §2.2 Projections / filters / predicates
# ---------------------------------------------------------------------------


#: p3's DQ-gate leg: rule name -> GOOD-row predicate (strict-null: False
#: OR NULL quarantines).  One definition; the oracle mirrors each
#: predicate textually below.
_P3_DQ_RULES_SQL: list[tuple[str, str]] = [
    ("discount_le_09", "l_discount <= 0.09"),
    ("qty_under_45", "l_quantity < 45"),
    ("tax_nonneg", "l_tax >= 0"),
]

_P3_VIOL_SQL = (
    "list_sort(list_filter(["
    + ", ".join(
        f"CASE WHEN NOT coalesce({expr}, FALSE) THEN '{name}' END"
        for name, expr in _P3_DQ_RULES_SQL
    )
    + "], x -> x IS NOT NULL))"
)


@register(
    "p3_filter_compare",
    f"""
    WITH tagged AS (
      SELECT l_orderkey, l_linenumber, {_P3_VIOL_SQL} AS viol FROM lineitem
    )
    SELECT 'filter' AS op, CAST(NULL AS VARCHAR) AS rule,
           CAST(l_orderkey AS BIGINT) AS k1, CAST(l_linenumber AS BIGINT) AS k2,
           l_discount AS val
    FROM lineitem WHERE l_discount < 0.02
    UNION ALL
    SELECT 'dq_report' AS op, r.rule,
           CAST(sum(CASE WHEN list_contains(t.viol, r.rule) THEN 1 ELSE 0 END)
             AS BIGINT) AS k1,
           CAST(count(*) AS BIGINT) AS k2,
           round(sum(CASE WHEN list_contains(t.viol, r.rule) THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE), 6) AS val
    FROM tagged t
    CROSS JOIN (VALUES {", ".join(f"('{n}')" for n, _ in _P3_DQ_RULES_SQL)})
      AS r(rule)
    GROUP BY r.rule
    UNION ALL
    SELECT 'quarantine' AS op, array_to_string(viol, ',') AS rule,
           CAST(l_orderkey AS BIGINT) AS k1, CAST(l_linenumber AS BIGINT) AS k2,
           CAST(NULL AS DOUBLE) AS val
    FROM tagged WHERE len(viol) > 0
    """,
)
def p3_filter_compare(spark, sf):
    """P3 (REF:102-110) + the generic row-level DQ gate
    (operators/expectations.py), tagged and stacked (u1/r1 precedent):

    - ``op='filter'``: the reference's comparison filter on a numeric
      column -- full matching row set value-verified.
    - ``op='dq_report'``: ``expectation_report`` -- N rules evaluated in
      ONE scan (vs the reference's N-SELECT audit, REF:74-224), per-rule
      violation counts + rates.
    - ``op='quarantine'``: ``apply_expectations``'s per-row tagging -- the
      dead-letter rows with their sorted violation lists, exactly the
      quarantine side of ``quarantine_split``.

    Strict-NULL semantics (False OR NULL violates) mirrored in the oracle
    via ``NOT coalesce(rule, FALSE)``; NULL-bearing inputs are exercised in
    tests/test_expectations.py."""
    from ..operators import expectations

    li = _t(spark, sf, "lineitem")
    rules = {
        name: F.expr(expr) for name, expr in _P3_DQ_RULES_SQL
    }
    filt = li.filter(F.col("l_discount") < 0.02).select(
        F.lit("filter").alias("op"),
        F.lit(None).cast("string").alias("rule"),
        F.col("l_orderkey").cast("long").alias("k1"),
        F.col("l_linenumber").cast("long").alias("k2"),
        F.col("l_discount").alias("val"),
    )
    rep = expectations.expectation_report(li, rules).select(
        F.lit("dq_report").alias("op"),
        "rule",
        F.col("n_violations").cast("long").alias("k1"),
        F.col("n_rows").cast("long").alias("k2"),
        F.col("violation_rate").alias("val"),
    )
    quar = (
        expectations.apply_expectations(li, rules)
        .filter(~F.col("passed"))
        .select(
            F.lit("quarantine").alias("op"),
            F.array_join("violations", ",").alias("rule"),
            F.col("l_orderkey").cast("long").alias("k1"),
            F.col("l_linenumber").cast("long").alias("k2"),
            F.lit(None).cast("double").alias("val"),
        )
    )
    return filt.unionByName(rep).unionByName(quar)


@register(
    "p456_predicate_surface",
    """
    SELECT 'not_in_set' AS op, l_returnflag, count(*) AS cnt
    FROM lineitem
    WHERE l_quantity NOT IN (1.0, 2.0, 3.0)
    GROUP BY l_returnflag
    UNION ALL
    SELECT 'dirty_or' AS op, l_returnflag, count(*) AS cnt
    FROM (
      SELECT l_returnflag, l_quantity, l_discount, l_tax, l_shipdate,
             l_extendedprice * (1 - l_discount) AS profit
      FROM lineitem
    )
    WHERE l_quantity <= 2 OR l_discount > 0.09 OR l_tax < 0.01
       OR profit > 90000 OR year(l_shipdate) = 1995
       OR month(l_shipdate) NOT IN (2,3,4,5,6,7,8,9,10,11,12)
    GROUP BY l_returnflag
    UNION ALL
    SELECT 'in_list' AS op, l_returnflag, count(*) AS cnt
    FROM lineitem
    WHERE month(l_shipdate) IN (11, 12)
    GROUP BY l_returnflag
    """,
)
def p456_predicate_surface(spark, sf):
    """P4+P5+P6 (REF:123-126, REF:235-243, REF:241,385) tagged and stacked
    (the u1/r1 tagged-union precedent -- the driver evaluates at most 50
    queries, so the three predicate shapes share one slot and each branch's
    full result set stays value-verified): ``not_in_set`` = conjunctive
    not-in-set on doubles; ``dirty_or`` = the reference's hardest DQ shape,
    a 6-term OR dirty-row predicate over a derived projection; ``in_list``
    = IN-list on a date part.  Each branch is an independent scan -> filter
    -> partial-agg; the union adds no shuffle."""
    li = _t(spark, sf, "lineitem")

    def branch(df: DataFrame, label: str) -> DataFrame:
        return (
            df.groupBy("l_returnflag")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .select(F.lit(label).alias("op"), "l_returnflag", "cnt")
        )

    dirty = (
        (F.col("l_quantity") <= 2)
        | (F.col("l_discount") > 0.09)
        | (F.col("l_tax") < 0.01)
        | ((F.col("l_extendedprice") * (1 - F.col("l_discount"))) > 90000)
        | (F.year("l_shipdate") == 1995)
        | ~F.month("l_shipdate").isin(*range(2, 13))
    )
    return (
        branch(li.filter(~F.col("l_quantity").isin(1.0, 2.0, 3.0)), "not_in_set")
        .unionByName(branch(li.filter(dirty), "dirty_or"))
        .unionByName(branch(li.filter(F.month("l_shipdate").isin(11, 12)), "in_list"))
    )


@register(
    "p7_derived_duration_join",
    """
    SELECT o_orderpriority,
           min(delay_hours) AS min_delay,
           max(delay_hours) AS max_delay,
           round(avg(delay_hours), 2) AS avg_delay
    FROM (
      SELECT o.o_orderpriority,
             (epoch(l.l_shipdate) - epoch(o.o_orderdate)) / 3600 AS delay_hours
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    )
    GROUP BY o_orderpriority
    """,
)
def p7_derived_duration_join(spark, sf):
    """P7+A5 (REF:87-91) on an equi-join: duration-in-hours between two
    timestamps, aggregated per key.  The join (orders is the small side at
    scale-per-partition) is Catalyst's choice: broadcast under the threshold,
    sort-merge beyond it; AQE re-plans at runtime."""
    o = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    j = o.join(li, o.o_orderkey == li.l_orderkey)
    delay = (F.unix_timestamp("l_shipdate") - F.unix_timestamp("o_orderdate")) / F.lit(
        3600
    )
    return (
        j.select("o_orderpriority", delay.alias("delay_hours"))
        .groupBy("o_orderpriority")
        .agg(
            F.min("delay_hours").alias("min_delay"),
            F.max("delay_hours").alias("max_delay"),
            F.round(F.avg("delay_hours"), 2).alias("avg_delay"),
        )
    )


@register(
    "p8_derived_rate",
    """
    SELECT event_type, round(avg(rate), 2) AS avg_rate
    FROM (
      SELECT event_type,
             value / nullif((epoch_us(ts) - epoch_us(date_trunc('day', ts))) / 3600000000.0, 0) AS rate
      FROM events
    )
    GROUP BY event_type
    """,
)
def p8_derived_rate(spark, sf):
    """P8 (REF:368): derived rate = value / elapsed-hours with NULL-safe
    division (micros precision -- unix_timestamp would truncate seconds)."""
    ev = _t(spark, sf, "events")
    hours = (
        F.unix_micros("ts") - F.unix_micros(F.date_trunc("day", F.col("ts")))
    ) / F.lit(3600000000.0)
    rate = F.col("value") / F.nullif(hours, F.lit(0.0))
    return (
        ev.select("event_type", rate.alias("rate"))
        .groupBy("event_type")
        .agg(F.round(F.avg("rate"), 2).alias("avg_rate"))
    )


# ---------------------------------------------------------------------------
# §2.4 Aggregations
# ---------------------------------------------------------------------------


@register(
    "a1_group_count",
    "SELECT l_returnflag, count(*) AS cnt FROM lineitem GROUP BY l_returnflag",
)
def a1_group_count(spark, sf):
    """A1 (REF:65-66): COUNT(*) by one key."""
    return (
        _t(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@register(
    "a3_two_key_count",
    """
    SELECT l_returnflag, l_linestatus, count(*) AS cnt,
           count(l_quantity) AS cnt_qty
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
)
def a3_two_key_count(spark, sf):
    """A2+A3 (REF:114-116, REF:123-126): COUNT(*) by two keys (distribution
    table) alongside COUNT(col) -- non-null semantics differ under NULLs,
    both preserved in one distribution query."""
    return (
        _t(spark, sf, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.count("l_quantity").alias("cnt_qty"),
        )
    )


@register(
    "a4_minmax_timestamp",
    """
    SELECT o_orderstatus,
           min(o_orderdate) AS min_date, max(o_orderdate) AS max_date
    FROM orders GROUP BY o_orderstatus
    """,
)
def a4_minmax_timestamp(spark, sf):
    """A4 (REF:80-83): MIN/MAX on timestamps by key."""
    return (
        _t(spark, sf, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.min("o_orderdate").alias("min_date"),
            F.max("o_orderdate").alias("max_date"),
        )
    )


@register(
    "a5_derived_stats",
    """
    SELECT event_type, min(value) AS minval, max(value) AS maxval,
           round(avg(value), 2) AS average
    FROM events GROUP BY event_type
    """,
)
def a5_derived_stats(spark, sf):
    """A5 (REF:87-91): min/max/avg of a double measure by key."""
    return (
        _t(spark, sf, "events")
        .groupBy("event_type")
        .agg(
            F.min("value").alias("minval"),
            F.max("value").alias("maxval"),
            F.round(F.avg("value"), 2).alias("average"),
        )
    )


@register(
    "a6_global_avg",
    "SELECT round(avg(l_extendedprice), 2) AS avg_price FROM lineitem",
)
def a6_global_avg(spark, sf):
    """A6 (REF:315): global AVG, rounded."""
    return _t(spark, sf, "lineitem").agg(
        F.round(F.avg("l_extendedprice"), 2).alias("avg_price")
    )


@register(
    "a7_avg_by_key",
    """
    SELECT CAST(year(l_shipdate) AS BIGINT) AS yr,
           round(avg(l_extendedprice), 2) AS avg_price
    FROM lineitem GROUP BY yr
    """,
)
def a7_avg_by_key(spark, sf):
    """A7 (REF:292-293): AVG by a derived date-part key."""
    return (
        _t(spark, sf, "lineitem")
        .groupBy(F.year("l_shipdate").cast("long").alias("yr"))
        .agg(F.round(F.avg("l_extendedprice"), 2).alias("avg_price"))
    )


@register(
    "a8_corr",
    "SELECT round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price FROM lineitem",
)
def a8_corr(spark, sf):
    """A8 (REF:335): Pearson correlation aggregate."""
    return _t(spark, sf, "lineitem").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price")
    )


@register(
    "a9_percentile",
    """
    SELECT round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
           round(quantile_cont(l_extendedprice, 0.50), 4) AS p50,
           round(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
           true AS approx_ok
    FROM lineitem
    """,
)
def a9_percentile(spark, sf):
    """A9 (REF:318), both variants in one gated entry.

    Exact: Spark ``percentile`` == DuckDB ``quantile_cont`` (index p*(n-1))
    -- value-hashed against the oracle.  Approx: ``percentile_approx``
    (GK sketch, REF:318's own function) is not bit-stable across engines, so
    the query validates it IN-PLANE: ``approx_ok`` asserts every approx
    quantile lands within 1% of the exact one, and the oracle expects
    ``true``.  The sketch's accuracy is thereby driver-gated, not just
    pytest-gated.  At 100 TB the approx variant is the default path:
    mergeable one-pass sketch, no global sort, bounded memory -- the exact
    variant buffers all values per group and exists as the gate/baseline.
    """
    li = _t(spark, sf, "lineitem")
    # One percentile aggregate with an array argument -> a single sorted
    # state instead of three (3x less agg memory/time).
    both = li.agg(
        F.expr("percentile(l_extendedprice, array(0.25D, 0.50D, 0.75D))").alias(
            "ps"
        ),
        F.percentile_approx(
            "l_extendedprice", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))
        ).alias("pa"),
    )
    within = [
        (
            F.abs(F.element_at("pa", i) - F.element_at("ps", i))
            <= 0.01 * F.abs(F.element_at("ps", i))
        )
        for i in (1, 2, 3)
    ]
    return both.select(
        F.round(F.element_at("ps", 1), 4).alias("p25"),
        F.round(F.element_at("ps", 2), 4).alias("p50"),
        F.round(F.element_at("ps", 3), 4).alias("p75"),
        (within[0] & within[1] & within[2]).alias("approx_ok"),
    )


# ---------------------------------------------------------------------------
# §2.5 Window, §2.3 join, §2.6 sort/limit, §2.7 set ops, F9 CASE
# ---------------------------------------------------------------------------


@register(
    "w1_pct_share",
    """
    SELECT o_orderpriority, count(*) AS cnt,
           round(count(*) * 100.0 / sum(count(*)) OVER (), 2) AS pct
    FROM orders GROUP BY o_orderpriority
    """,
)
def w1_pct_share(spark, sf):
    """W1 (REF:71-73): the signature percent-share-of-total operator --
    aggregate-over-aggregate with an empty global window frame.  The window
    runs over the already-aggregated handful of rows (SURVEY §2.5)."""
    grouped = (
        _t(spark, sf, "orders")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy()
    return grouped.withColumn(
        "pct", F.round(F.col("cnt") * F.lit(100.0) / F.sum("cnt").over(w), 2)
    )


@register(
    "j1_scalar_cross_ratio",
    """
    SELECT round(CAST(flagged AS DOUBLE) / total, 2) AS discounted_fraction
    FROM (SELECT count(*) AS flagged FROM lineitem WHERE l_discount > 0) i1,
         (SELECT count(*) AS total FROM lineitem) i2
    """,
)
def j1_scalar_cross_ratio(spark, sf):
    """J1 (REF:324-326): implicit cross join of two single-row aggregates.
    Catalyst plans a broadcast nested-loop join over 1x1 inputs."""
    li = _t(spark, sf, "lineitem")
    flagged = li.filter(F.col("l_discount") > 0).agg(
        F.count(F.lit(1)).alias("flagged")
    )
    total = li.agg(F.count(F.lit(1)).alias("total"))
    return flagged.crossJoin(total).select(
        F.round(F.col("flagged") / F.col("total"), 2).alias("discounted_fraction")
    )


@register(
    "f9_case_segmentation",
    """
    SELECT price_segment, count(*) AS cnt,
           round(count(*) * 100.0 / sum(count(*)) OVER (), 2) AS segment_pct
    FROM (
      SELECT CASE
        WHEN l_extendedprice < 10000 THEN '[0-10k)'
        WHEN l_extendedprice >= 10000 AND l_extendedprice < 30000 THEN '[10k-30k)'
        WHEN l_extendedprice >= 30000 AND l_extendedprice < 60000 THEN '[30k-60k)'
        WHEN l_extendedprice >= 60000 AND l_extendedprice < 90000 THEN '[60k-90k)'
        ELSE '>=90k' END AS price_segment
      FROM lineitem
    )
    GROUP BY price_segment
    """,
)
def f9_case_segmentation(spark, sf):
    """F9+W1 (REF:349-361): CASE bucketing + percent share per bucket."""
    p = F.col("l_extendedprice")
    seg = (
        F.when(p < 10000, "[0-10k)")
        .when((p >= 10000) & (p < 30000), "[10k-30k)")
        .when((p >= 30000) & (p < 60000), "[30k-60k)")
        .when((p >= 60000) & (p < 90000), "[60k-90k)")
        .otherwise(">=90k")
    )
    grouped = (
        _t(spark, sf, "lineitem")
        .select(seg.alias("price_segment"))
        .groupBy("price_segment")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy()
    return grouped.withColumn(
        "segment_pct",
        F.round(F.col("cnt") * F.lit(100.0) / F.sum("cnt").over(w), 2),
    )


@register(
    "o3_topk_multi_sort",
    """
    SELECT p_brand, count(*) AS cnt FROM part GROUP BY p_brand
    ORDER BY cnt DESC, p_brand DESC LIMIT 5
    """,
)
def o3_topk_multi_sort(spark, sf):
    """O3+O5 (REF:300,306): multi-key DESC sort + LIMIT -> Spark plans
    TakeOrderedAndProject (true top-k, no global sort).  p_brand tie-break
    makes the k-boundary deterministic across engines."""
    return (
        _t(spark, sf, "part")
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("p_brand").desc())
        .limit(5)
    )


@register(
    "w2_rank_per_group",
    """
    SELECT o_orderpriority, o_orderkey, o_totalprice, rn FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             CAST(row_number() OVER (
               PARTITION BY o_orderpriority
               ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def w2_rank_per_group(spark, sf):
    """W2 (extension -- ranking window beyond the reference's W1): top-3
    orders by price per priority class via row_number."""
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        _t(spark, sf, "orders")
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice", "rn")
    )


@register(
    "u1_set_ops",
    """
    SELECT 'union' AS op, o_custkey FROM (
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      UNION
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    )
    UNION ALL
    SELECT 'intersect' AS op, o_custkey FROM (
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      INTERSECT
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    )
    UNION ALL
    SELECT 'except' AS op, o_custkey FROM (
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      EXCEPT
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    )
    """,
)
def u1_set_ops(spark, sf):
    """U (extension, §2.7): the whole set-operation family -- UNION
    DISTINCT, INTERSECT, EXCEPT -- tagged and stacked so each op's full
    result set is value-verified in one registry slot.  Each branch is an
    independent distinct/anti hash-aggregate; Spark unions them without an
    extra shuffle."""
    o = _t(spark, sf, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    op = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")

    def tag(df: DataFrame, label: str) -> DataFrame:
        return df.select(F.lit(label).alias("op"), "o_custkey")

    return (
        tag(f.union(op).distinct(), "union")
        .unionByName(tag(f.intersect(op), "intersect"))
        .unionByName(tag(f.subtract(op), "except"))
    )


@register(
    "r1_rollup_cube",
    """
    SELECT 'rollup' AS op, l_returnflag AS flag, l_linestatus AS status,
           count(*) AS cnt, round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
    UNION ALL
    SELECT 'cube' AS op, l_returnflag AS flag, l_linestatus AS status,
           count(*) AS cnt, round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def r1_rollup_cube(spark, sf):
    """R (extension): grouping-set lattices -- ROLLUP (subtotals + grand
    total) and CUBE (all 4 combinations), tagged and stacked.  Each runs as
    Expand + ONE hash aggregate (one shuffle per lattice, not one per
    grouping set)."""
    li = _t(spark, sf, "lineitem")

    def agg(grouped, label: str) -> DataFrame:
        return grouped.agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        ).select(
            F.lit(label).alias("op"),
            F.col("l_returnflag").alias("flag"),
            F.col("l_linestatus").alias("status"),
            "cnt",
            "sum_qty",
        )

    return agg(li.rollup("l_returnflag", "l_linestatus"), "rollup").unionByName(
        agg(li.cube("l_returnflag", "l_linestatus"), "cube")
    )


# ---------------------------------------------------------------------------
# S3 ETL analog (clean filter + partition-column derivation)
# ---------------------------------------------------------------------------


@register(
    "s3_etl_clean_derive",
    """
    SELECT CAST(year(l_shipdate) AS BIGINT) AS yr,
           CAST(month(l_shipdate) AS BIGINT) AS mnth,
           count(*) AS cnt
    FROM lineitem
    WHERE l_quantity > 0 AND l_extendedprice >= 0
      AND l_discount BETWEEN 0 AND 0.08 AND l_tax >= 0
      AND year(l_shipdate) BETWEEN 1995 AND 2000
    GROUP BY yr, mnth
    """,
)
def s3_etl_clean_derive(spark, sf):
    """S3 (REF:261-269): conjunctive clean filter + yr/mnth partition-column
    derivation -- the transform half of the dynamic-partition ETL (the write
    half is exercised in tests/test_taxi_golden.py with an actual
    partitioned sink: test_partitioned_write_roundtrip and the
    dynamic-overwrite test)."""
    li = _t(spark, sf, "lineitem")
    clean = (
        (F.col("l_quantity") > 0)
        & (F.col("l_extendedprice") >= 0)
        & F.col("l_discount").between(0, 0.08)
        & (F.col("l_tax") >= 0)
        & F.year("l_shipdate").between(1995, 2000)
    )
    return (
        li.filter(clean)
        .withColumn("yr", F.year("l_shipdate").cast("long"))
        .withColumn("mnth", F.month("l_shipdate").cast("long"))
        .groupBy("yr", "mnth")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


# ---------------------------------------------------------------------------
# Scalar-function breadth (F1-F11 + JSON extension)
# ---------------------------------------------------------------------------


@register(
    "f_scalar_surface",
    """
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT) AS yr,
           CAST(month(o_orderdate) AS BIGINT) AS mn,
           CAST(day(o_orderdate) AS BIGINT) AS dy,
           CAST(o_orderdate AS DATE) AS order_date,
           upper(o_orderpriority) AS prio_upper,
           substr(o_orderpriority, 1, 1) AS prio_code,
           concat(o_orderpriority, ':', CAST(o_orderkey % 7 AS VARCHAR))
             AS tagged,
           CAST(length(o_orderpriority) AS BIGINT) AS prio_len,
           replace(o_orderpriority, '-', '_') AS prio_snake,
           CAST(regexp_extract(o_orderpriority, '[0-9]+', 0) AS BIGINT)
             AS prio_num
    FROM orders WHERE o_orderkey % 500 = 0
    """,
)
def f_scalar_surface(spark, sf):
    """F1-F5 (REF:89,241,383-386) + the string-scalar extension surface in
    one projection: year/month/day/date date-part family alongside
    upper/substr/concat/length/replace/regexp_extract (REF uses no string
    functions -- SURVEY §2.8 -- so these ride the same slot).  All JVM
    scalar expressions inside whole-stage codegen."""
    o = _t(spark, sf, "orders").filter(F.col("o_orderkey") % 500 == 0)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mn"),
        F.dayofmonth("o_orderdate").cast("long").alias("dy"),
        F.to_date("o_orderdate").alias("order_date"),
        F.upper("o_orderpriority").alias("prio_upper"),
        F.substring("o_orderpriority", 1, 1).alias("prio_code"),
        F.concat_ws(
            "", F.col("o_orderpriority"), F.lit(":"),
            (F.col("o_orderkey") % 7).cast("string"),
        ).alias("tagged"),
        F.length("o_orderpriority").cast("long").alias("prio_len"),
        F.replace(F.col("o_orderpriority"), F.lit("-"), F.lit("_")).alias(
            "prio_snake"
        ),
        F.regexp_extract("o_orderpriority", "[0-9]+", 0)
        .cast("long")
        .alias("prio_num"),
    )


@register(
    "f_json_extract",
    r"""
    SELECT k_val, count(*) AS cnt FROM (
      SELECT CASE
               WHEN regexp_matches(t, '^[+-]?[0-9]+$')
                 THEN TRY_CAST(t AS BIGINT)
               WHEN regexp_matches(t, '^[+-]?[0-9]*\.[0-9]*$')
                 THEN CASE WHEN regexp_matches(t, '^[+-]?\.')
                           THEN 0
                           ELSE TRY_CAST(regexp_extract(t,
                                  '^[+-]?[0-9]+', 0) AS BIGINT) END
             END AS k_val
      FROM (
        -- Spark's cast trims ALL control/space chars <= 0x20 (trimAll),
        -- not just ' ' like DuckDB trim()
        SELECT regexp_replace(CASE WHEN json_valid(props)
                 THEN json_extract_string(props, '$.k') END,
                 '^[\x00-\x20]+|[\x00-\x20]+$', '', 'g') AS t
        FROM events
      )
    ) GROUP BY k_val
    """,
)
def f_json_extract(spark, sf):
    """F (extension): JSON field extraction from a string column.

    Engine semantics on dirty input (Hive/Spark ``get_json_object`` +
    non-ANSI CAST to BIGINT, all probed on this build): malformed JSON
    and JSON null give NULL; numeric strings are trimmed of EVERY char
    <= 0x20 (UTF8String.trimAll -- tabs/newlines too, not just spaces)
    and TRUNCATED TOWARD ZERO on a fraction ('1.7' -> 1, '-1.7' -> -1,
    '.5' -> 0, and the digitless separators '.'/'-.'/'+.' -> 0);
    exponent forms, overflow (in EITHER branch: '99..9.5' with a
    too-big integer part is NULL, not 0), and garbage give NULL
    ('5e2'/'+'/'..'/'1.2.3' -> NULL).  The oracle replicates each
    branch explicitly: a ``json_valid`` guard (DuckDB's
    ``json_extract_string`` ERRORS on malformed JSON), a regex trimAll,
    exact ``TRY_CAST`` for pure-integer strings (overflow -> NULL, no
    double roundtrip), and integer-part extraction for fractional
    strings (DuckDB's own TRY_CAST would ROUND '1.7' to 2) with the
    digitless-separator 0 carved out so TRY_CAST overflow can stay
    NULL.  The dirty rows live in the adversarial corpus
    (tests/test_adversarial_corpus.py)."""
    ev = _t(spark, sf, "events")
    return ev.groupBy(
        F.get_json_object("props", "$.k").cast("long").alias("k_val")
    ).agg(F.count(F.lit(1)).alias("cnt"))
# ---------------------------------------------------------------------------
# Leg declarations (r15): tagged-union entries, for bench.py's per-leg
# timing breakdown.  Values are pinned by tests/test_bench_legs.py
# against the distinct tag values the entry actually produces.
register_legs("p3_filter_compare", "op", ("dq_report", "filter", "quarantine"))
register_legs(
    "p456_predicate_surface", "op", ("dirty_or", "in_list", "not_in_set")
)
register_legs("u1_set_ops", "op", ("except", "intersect", "union"))
register_legs("r1_rollup_cube", "op", ("cube", "rollup"))
