"""Analysis operators over the cleaned table (REF:286-390).

All pure transforms ``(clean: DataFrame) -> DataFrame``.  Together they cover
A6-A9, W1, J1, F9, P8, O3-O4 from SURVEY.md §2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.exprs import pct_share, speed_mph, tip_segment


def avg_fare_by_month(clean: DataFrame) -> DataFrame:
    """A7: average fare per month (REF:292-293)."""
    return (
        clean.groupBy("mnth")
        .agg(F.round(F.avg("fare_amount"), 2).alias("avg"))
        .orderBy("mnth")
    )


def passenger_count_pct(clean: DataFrame) -> DataFrame:
    """W1: trips and % share per passenger_count level (REF:298-300)."""
    out = pct_share(
        clean.withColumnRenamed("passenger_count", "level"),
        ["level"],
        "number_of_trips",
        "pct_number_of_trips",
    )
    return out.orderBy(
        F.col("number_of_trips").desc(), F.col("pct_number_of_trips").desc()
    )


def payment_type_pct(clean: DataFrame) -> DataFrame:
    """W1: trips and % share per payment type (REF:304-306)."""
    out = pct_share(
        clean.withColumnRenamed("payment_type", "paymt_type"),
        ["paymt_type"],
        "paymt_cnt",
        "pct_paymt_cnt",
    )
    return out.orderBy(F.col("paymt_cnt").desc(), F.col("pct_paymt_cnt").desc())


def avg_tip(clean: DataFrame) -> DataFrame:
    """A6: global average tip, rounded (REF:315)."""
    return clean.agg(F.round(F.avg("tip_amount"), 2).alias("avg_tip"))


def tip_percentiles(clean: DataFrame, exact: bool = False) -> DataFrame:
    """A9: 25/50/75th percentile of tip_amount (REF:318).

    ``exact=False`` reproduces Hive's ``percentile_approx`` (GK-sketch
    family, mergeable -> single-pass distributed, the 100-TB path).
    ``exact=True`` uses the exact interpolated percentile for
    oracle-comparable output (SURVEY §7.4) -- exact percentile collects the
    per-group value multiset and should be reserved for small/medium groups.
    """
    fn = "percentile" if exact else "percentile_approx"
    return clean.select(
        F.expr(f"{fn}(tip_amount, array(0.25D, 0.50D, 0.75D))").alias("tip_percentiles")
    )


def extra_charge_fraction(clean: DataFrame) -> DataFrame:
    """J1: fraction of trips with an extra charge (REF:324-326).

    The reference's implicit cross join of two single-row aggregates.  Both
    sides reduce to one row before the join, so Catalyst plans a broadcast
    nested-loop join over singletons -- constant cost at any scale.  (A
    conditional-aggregation rewrite would do it in one pass; we keep the
    reference's two-aggregate cross-join shape because J1 is the workload's
    only join operator.)
    """
    with_extra = clean.filter(F.col("extra") > 0).agg(F.count(F.lit(1)).alias("extra"))
    total = clean.agg(F.count(F.lit(1)).alias("total"))
    return with_extra.crossJoin(total).select(
        F.round(F.col("extra") / F.col("total"), 2).alias("pct_trips_with_extra_charge")
    )


def corr_passengers_tip(clean: DataFrame) -> DataFrame:
    """A8: Pearson correlation of passenger_count vs tip_amount (REF:335)."""
    return clean.agg(
        F.round(F.corr("passenger_count", "tip_amount"), 2).alias("corr_passenger_tip")
    )


def avg_tip_by_passenger_count(clean: DataFrame) -> DataFrame:
    """A7+O4: average tip per passenger level, highest first (REF:340-342)."""
    return (
        clean.groupBy(F.col("passenger_count").alias("level"))
        .agg(F.avg("tip_amount").alias("avg_tip_amt"))
        .orderBy(F.col("avg_tip_amt").desc())
    )


def tip_segment_pct(clean: DataFrame) -> DataFrame:
    """F9+W1: % share of the five tip segments (REF:349-361)."""
    segmented = clean.select(tip_segment().alias("tip_segment"))
    out = pct_share(segmented, ["tip_segment"], "cnt", "tip_segment_percent").drop("cnt")
    return out.orderBy(F.col("tip_segment_percent").desc())


def avg_speed_by_month(clean: DataFrame) -> DataFrame:
    """P8+A7: average speed (mph) per month, ascending (REF:368-371)."""
    return (
        clean.groupBy("mnth")
        .agg(F.round(F.avg(speed_mph()), 2).alias("avg_speed_per_hour"))
        .orderBy("avg_speed_per_hour")
    )


def avg_speed_2017(clean: DataFrame) -> DataFrame:
    """P8+A6: overall 2017 average speed (REF:377-379)."""
    return clean.filter(F.year("tpep_pickup_datetime") == 2017).agg(
        F.round(F.avg(speed_mph()), 2).alias("avg_speed_in_2017")
    )


def avg_speed_holidays(clean: DataFrame) -> DataFrame:
    """P6+F4/F5: average speed on Dec 25 / Dec 31 (REF:383-386).

    The ``mnth in (12)`` conjunct hits the partition column, so on the
    partitioned cleaned table this scans only the December directories
    (partition pruning -- SURVEY §4).
    """
    return (
        clean.filter(
            F.col("mnth").isin(12) & F.dayofmonth("tpep_pickup_datetime").isin(25, 31)
        )
        .groupBy(F.to_date("tpep_pickup_datetime").alias("pickup_date"))
        .agg(F.round(F.avg(speed_mph()), 2).alias("avg_speed_per_hour"))
        .orderBy("pickup_date")
    )


ALL_ANALYSES = {
    "avg_fare_by_month": avg_fare_by_month,
    "passenger_count_pct": passenger_count_pct,
    "payment_type_pct": payment_type_pct,
    "avg_tip": avg_tip,
    "tip_percentiles": tip_percentiles,
    "extra_charge_fraction": extra_charge_fraction,
    "corr_passengers_tip": corr_passengers_tip,
    "avg_tip_by_passenger_count": avg_tip_by_passenger_count,
    "tip_segment_pct": tip_segment_pct,
    "avg_speed_by_month": avg_speed_by_month,
    "avg_speed_2017": avg_speed_2017,
    "avg_speed_holidays": avg_speed_holidays,
}
