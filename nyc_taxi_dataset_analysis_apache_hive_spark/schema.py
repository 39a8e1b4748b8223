"""Canonical schemas (SURVEY.md §1.2-1.3).

The reference declares the raw taxi table schema explicitly (REF:32-55) and
re-declares it, reordered, for the cleaned ORC table (REF:251-258).  We keep
one StructType per table.  Per REF:26-29: IDs are strings, integers int,
floating points double.  Unlike Hive's OpenCSVSerde (which silently surfaces
every column as STRING), Spark's CSV reader honours this schema directly.
"""

from __future__ import annotations

from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: Raw trips table -- column order exactly as REF:34-50.
TRIP_SCHEMA = StructType(
    [
        StructField("vendorid", StringType()),
        StructField("tpep_pickup_datetime", TimestampType()),
        StructField("tpep_dropoff_datetime", TimestampType()),
        StructField("passenger_count", IntegerType()),
        StructField("trip_distance", DoubleType()),
        StructField("ratecodeid", StringType()),
        StructField("store_and_fwd_flag", StringType()),
        StructField("pulocationid", StringType()),
        StructField("dolocationid", StringType()),
        StructField("payment_type", StringType()),
        StructField("fare_amount", DoubleType()),
        StructField("extra", DoubleType()),
        StructField("mta_tax", DoubleType()),
        StructField("tip_amount", DoubleType()),
        StructField("tolls_amount", DoubleType()),
        StructField("improvement_surcharge", DoubleType()),
        StructField("total_amount", DoubleType()),
    ]
)

#: Cleaned table: raw columns reordered per REF:252-254 plus the partition
#: columns yr/mnth (REF:254, derived REF:263).
CLEAN_COLUMN_ORDER = [
    "vendorid",
    "tpep_pickup_datetime",
    "tpep_dropoff_datetime",
    "passenger_count",
    "trip_distance",
    "pulocationid",
    "dolocationid",
    "ratecodeid",
    "store_and_fwd_flag",
    "payment_type",
    "fare_amount",
    "extra",
    "mta_tax",
    "improvement_surcharge",
    "tip_amount",
    "tolls_amount",
    "total_amount",
]

CLEAN_SCHEMA = StructType(
    [next(f for f in TRIP_SCHEMA.fields if f.name == c) for c in CLEAN_COLUMN_ORDER]
    + [StructField("yr", IntegerType()), StructField("mnth", IntegerType())]
)

#: Driver-provided synthetic tables (TESTDATA.md) used by the correctness
#: registry and the scale extensions.
TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]
