"""Data-quality check operators (SURVEY.md §3 entry point 2, REF:60-243).

Each check is a pure transform ``(trips: DataFrame) -> DataFrame`` over the
raw taxi table.  Physical shape per check: Scan -> Project -> Filter ->
partial HashAggregate -> Exchange(vendorid) -> final HashAggregate -> Sort --
exactly one shuffle each, on a low-cardinality key; at 100 TB the partial
aggregate collapses almost all rows map-side, so the exchange moves only
per-(key)-per-task partials.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.exprs import dirty_predicate, hour_diff, nonstandard_extra, pct_share


def peek(trips: DataFrame, n: int = 3) -> DataFrame:
    """P1: structure smoke-check, ``SELECT * LIMIT 3`` (REF:58)."""
    return trips.limit(n)


def vendor_counts(trips: DataFrame) -> DataFrame:
    """A1: records per TPEP provider (REF:65-66)."""
    return (
        trips.groupBy(F.col("vendorid").alias("vendor"))
        .agg(F.count(F.lit(1)).alias("total"))
        .orderBy("vendor")
    )


def vendor_pct(trips: DataFrame) -> DataFrame:
    """W1 on vendorid: percent of records per provider (REF:71-73)."""
    return pct_share(trips, ["vendorid"], "vendor_cnt", "vendorid_percent").orderBy(
        "vendorid"
    )


def date_range_by_vendor(trips: DataFrame) -> DataFrame:
    """A4: min/max pickup & dropoff timestamps per vendor (REF:80-83)."""
    return (
        trips.groupBy("vendorid")
        .agg(
            F.min("tpep_pickup_datetime").alias("min_pickup_time"),
            F.min("tpep_dropoff_datetime").alias("min_dropoff_time"),
            F.max("tpep_pickup_datetime").alias("max_pickup_time"),
            F.max("tpep_dropoff_datetime").alias("max_dropoff_time"),
        )
        .orderBy("vendorid")
    )


def hour_diff_stats(trips: DataFrame) -> DataFrame:
    """A5: min/max/avg trip duration (hours) per vendor (REF:87-91)."""
    return (
        trips.withColumn("hour_diff", hour_diff())
        .groupBy("vendorid")
        .agg(
            F.min("hour_diff").alias("minval"),
            F.max("hour_diff").alias("maxval"),
            F.avg("hour_diff").alias("average"),
        )
        .orderBy("vendorid")
    )


def invalid_duration_trips(trips: DataFrame) -> DataFrame:
    """P3/P7: trips with hour_diff < 0 or > 24 (REF:93-98)."""
    hd = hour_diff()
    return trips.select("vendorid", hd.alias("hour_diff")).filter(
        (F.col("hour_diff") < 0) | (F.col("hour_diff") > 24)
    )


def negative_tips(trips: DataFrame) -> DataFrame:
    """P3+O1: rows with negative tip, sorted ascending (REF:102-104)."""
    return (
        trips.filter(F.col("tip_amount") < 0)
        .select("vendorid", "tip_amount")
        .orderBy(F.col("tip_amount").asc())
    )


def negative_fares(trips: DataFrame) -> DataFrame:
    """P3+O1: rows with negative fare (REF:108-110)."""
    return (
        trips.filter(F.col("fare_amount") < 0)
        .select("vendorid", "fare_amount")
        .orderBy(F.col("fare_amount").asc())
    )


def negative_fare_counts(trips: DataFrame) -> DataFrame:
    """A2: COUNT(fare_amount) -- non-null count -- per vendor (REF:114-116)."""
    return (
        trips.filter(F.col("fare_amount") < 0)
        .groupBy("vendorid")
        .agg(F.count("fare_amount").alias("cnt"))
    )


def nonstandard_extra_distribution(trips: DataFrame) -> DataFrame:
    """P4+A3: distribution of out-of-set extra values (REF:123-126)."""
    return (
        trips.filter(nonstandard_extra())
        .groupBy("vendorid", "extra")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("vendorid")
    )


def nonstandard_extra_counts(trips: DataFrame) -> DataFrame:
    """P4+A1: count of out-of-set extra values per vendor (REF:132-135)."""
    return (
        trips.filter(nonstandard_extra())
        .groupBy("vendorid")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("vendorid")
    )


def nonpositive_passengers(trips: DataFrame) -> DataFrame:
    """P3+O1: trips with passenger_count <= 0 (REF:140-142)."""
    return (
        trips.filter(F.col("passenger_count") <= 0)
        .select("vendorid", "passenger_count")
        .orderBy(F.col("passenger_count").asc())
    )


def zero_passenger_counts(trips: DataFrame) -> DataFrame:
    """A2/A3: COUNT(passenger_count) by (vendor, level) (REF:148-151)."""
    return (
        trips.filter(F.col("passenger_count") <= 0)
        .groupBy("vendorid", "passenger_count")
        .agg(F.count("passenger_count").alias("cnt"))
        .orderBy("vendorid")
    )


def negative_toll_counts(trips: DataFrame) -> DataFrame:
    """A2: COUNT(tolls_amount) per vendor where negative (REF:156-158)."""
    return (
        trips.filter(F.col("tolls_amount") < 0)
        .groupBy("vendorid")
        .agg(F.count("tolls_amount").alias("count_negative_tolls"))
    )


def negative_surcharge_counts(trips: DataFrame) -> DataFrame:
    """A2: COUNT(improvement_surcharge) per vendor where negative (REF:163-165)."""
    return (
        trips.filter(F.col("improvement_surcharge") < 0)
        .groupBy("vendorid")
        .agg(F.count("improvement_surcharge").alias("count_negative_improvement_charge"))
    )


def negative_mta_sample(trips: DataFrame, n: int = 5) -> DataFrame:
    """P3+O5: sample of negative mta_tax rows (REF:170-173)."""
    return trips.filter(F.col("mta_tax") < 0).select("vendorid", "mta_tax").limit(n)


def negative_mta_counts(trips: DataFrame) -> DataFrame:
    """A1: negative mta_tax count per vendor (REF:178-181)."""
    return (
        trips.filter(F.col("mta_tax") < 0)
        .groupBy("vendorid")
        .agg(F.count(F.lit(1)).alias("no_of_records"))
    )


def negative_total_sample(trips: DataFrame, n: int = 5) -> DataFrame:
    """P3+O5: sample of negative total_amount rows (REF:185-188)."""
    return trips.filter(F.col("total_amount") < 0).select("vendorid", "total_amount").limit(n)


def negative_total_counts(trips: DataFrame) -> DataFrame:
    """A1: negative total_amount count per vendor (REF:192-195)."""
    return (
        trips.filter(F.col("total_amount") < 0)
        .groupBy("vendorid")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def payment_type_distribution(trips: DataFrame) -> DataFrame:
    """A3: (vendor, payment_type) counts (REF:199-202)."""
    return (
        trips.groupBy("vendorid", "payment_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("vendorid")
    )


def store_fwd_distribution(trips: DataFrame) -> DataFrame:
    """A3: (vendor, store_and_fwd_flag) counts (REF:206-209)."""
    return (
        trips.groupBy("vendorid", "store_and_fwd_flag")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("vendorid")
    )


def ratecode_distribution(trips: DataFrame) -> DataFrame:
    """A3: (vendor, ratecodeid) counts -- surfaces the '99' rows (REF:214-217)."""
    return (
        trips.groupBy("vendorid", "ratecodeid")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("vendorid")
    )


def negative_distances(trips: DataFrame) -> DataFrame:
    """P3: negative trip_distance rows -- expected empty (REF:221-223)."""
    return trips.filter(F.col("trip_distance") < 0).select("vendorid", "trip_distance")


def dirty_row_counts(trips: DataFrame) -> DataFrame:
    """P5+A1: the combined 12-term dirty-row count per vendor (REF:235-243)."""
    return (
        trips.filter(dirty_predicate())
        .groupBy("vendorid")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("vendorid")
    )


#: name -> callable, for programmatic iteration (tests, benchmarks).
ALL_CHECKS = {
    "vendor_counts": vendor_counts,
    "vendor_pct": vendor_pct,
    "date_range_by_vendor": date_range_by_vendor,
    "hour_diff_stats": hour_diff_stats,
    "invalid_duration_trips": invalid_duration_trips,
    "negative_tips": negative_tips,
    "negative_fares": negative_fares,
    "negative_fare_counts": negative_fare_counts,
    "nonstandard_extra_distribution": nonstandard_extra_distribution,
    "nonstandard_extra_counts": nonstandard_extra_counts,
    "nonpositive_passengers": nonpositive_passengers,
    "zero_passenger_counts": zero_passenger_counts,
    "negative_toll_counts": negative_toll_counts,
    "negative_surcharge_counts": negative_surcharge_counts,
    "negative_mta_sample": negative_mta_sample,
    "negative_mta_counts": negative_mta_counts,
    "negative_total_sample": negative_total_sample,
    "negative_total_counts": negative_total_counts,
    "payment_type_distribution": payment_type_distribution,
    "store_fwd_distribution": store_fwd_distribution,
    "ratecode_distribution": ratecode_distribution,
    "negative_distances": negative_distances,
    "dirty_row_counts": dirty_row_counts,
}
