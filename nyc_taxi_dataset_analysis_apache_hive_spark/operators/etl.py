"""ETL operators (SURVEY.md §3 entry point 3, REF:245-283).

``clean_trips`` is the pure transform behind the reference's INSERT OVERWRITE
(REF:261-269); the writers in ``sources.writers`` are its sinks.  Keeping the
transform side-effect-free makes it unit-testable and lets the same plan feed
either the path-based or the bucketed-table sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.exprs import clean_predicate, dirty_predicate
from ..schema import CLEAN_COLUMN_ORDER


def clean_trips(trips: DataFrame) -> DataFrame:
    """S3 transform: keep-filter + partition-column derivation (REF:261-269).

    Applies the conjunctive clean predicate (REF:268-269) and appends
    ``yr = year(pickup)``, ``mnth = month(pickup)`` (REF:263), reordering
    columns per the cleaned DDL (REF:252-254).

    Scale note: this is a single narrow Project+Filter over the scan -- no
    shuffle.  The date-part derivations are Catalyst expressions, so ORC/
    parquet readers still get column pruning and the filter's sargable
    conjuncts (fare_amount >= 0 etc.) are pushed to the scan.
    """
    return (
        trips.filter(clean_predicate())
        .select(*CLEAN_COLUMN_ORDER)
        .withColumn("yr", F.year("tpep_pickup_datetime"))
        .withColumn("mnth", F.month("tpep_pickup_datetime"))
    )


def validate_clean(clean: DataFrame) -> DataFrame:
    """Post-write validation: dirty rows remaining -- expected empty (REF:272-275).

    The reference re-runs the dirty OR-predicate (minus the hour_diff terms,
    exactly as REF:274-275 does) against the cleaned table.
    """
    hourless_dirty = (
        (F.col("fare_amount") < 0)
        | (F.col("tip_amount") < 0)
        | (~F.col("extra").isin(0.0, 0.5, 1.0))
        | (F.col("passenger_count") <= 0)
        | (F.col("tolls_amount") < 0)
        | (F.col("improvement_surcharge") < 0)
        | (F.col("mta_tax") < 0)
        | (F.col("total_amount") < 0)
        | (F.col("ratecodeid") == "99")
        | (F.year("tpep_pickup_datetime") != 2017)
        | (~F.month("tpep_pickup_datetime").isin(11, 12))
    )
    return clean.filter(hourless_dirty)


def clean_vendor_counts(clean: DataFrame) -> DataFrame:
    """A1 on the cleaned table: records per vendor (REF:281-283)."""
    return (
        clean.groupBy("vendorid").agg(F.count(F.lit(1)).alias("cnt")).orderBy("vendorid")
    )


def removed_row_counts(trips: DataFrame) -> DataFrame:
    """Convenience: rows the ETL filter drops, per vendor (REF:229 golden).

    Note this equals ``dirty_row_counts`` only on NULL-free data; the ETL
    keep-filter also drops NULL-bearing rows that the dirty OR-predicate
    misses (3-valued logic, SURVEY §7.4) -- hence its own operator.
    """
    return (
        trips.filter(~F.coalesce(clean_predicate(), F.lit(False)))
        .groupBy("vendorid")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("vendorid")
    )


__all__ = [
    "clean_trips",
    "upsert",
    "validate_clean",
    "clean_vendor_counts",
    "removed_row_counts",
    "dirty_predicate",
]


def upsert(base: DataFrame, updates: DataFrame, keys: list[str]) -> DataFrame:
    """SCD-1 merge: updates win on key collision, unmatched updates insert,
    unmatched base rows carry forward (MERGE INTO semantics on plain
    DataFrames).

    Full-outer join on the keys + per-column coalesce(update, base).  At
    scale: join shuffles both sides once on the keys; pair with the
    dynamic-partition writer so only partitions containing touched keys
    rewrite.  Null-safe key equality so NULL keys merge rather than
    duplicate.
    """
    cols = base.columns
    b, u = base.alias("b"), updates.alias("u")
    cond = None
    for k in keys:
        term = F.col(f"b.{k}").eqNullSafe(F.col(f"u.{k}"))
        cond = term if cond is None else (cond & term)
    joined = b.join(u, on=cond, how="full_outer")
    return joined.select(
        *[F.coalesce(F.col(f"u.{c}"), F.col(f"b.{c}")).alias(c) for c in cols]
    )
