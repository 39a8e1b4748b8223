"""Sinks (SURVEY.md §2.1 S2/S3).

The reference's sink is an ORC table partitioned by (yr, mnth) with 5 sorted
buckets on tip_amount, Snappy-compressed, loaded via dynamic-partition INSERT
OVERWRITE (REF:251-258, REF:261-269).  Spark-native:

* ``write_clean_partitioned`` -- path-based partitioned columnar write
  (parquet or ORC).  Dynamic overwrite replaces only the partitions present
  in the incoming data (``partitionOverwriteMode=dynamic``), the exact analog
  of Hive's ``INSERT OVERWRITE ... PARTITION(yr,mnth)`` with
  ``hive.exec.dynamic.partition=true`` (REF:4-10).
* ``write_clean_table`` -- catalog-table variant adding
  ``bucketBy(5, tip_amount).sortBy(tip_amount)`` (REF:255).  Spark bucketing
  is not file-compatible with Hive bucketing, but reproduces the semantics
  that matter: co-located, per-bucket-sorted data that lets Spark elide
  shuffles/sorts on the bucketed key.  Bucketing is optional for correctness
  (no reference query answer depends on bucket layout -- SURVEY §7.4).

Scale notes (100 TB): partition columns (yr, mnth) are low-cardinality so the
dynamic write produces few directories; within a partition, output file count
equals upstream task count -- callers control it with df.repartition(N, keys)
before writing to avoid small files.  maxRecordsPerFile guards huge files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_clean_partitioned(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_cols: tuple[str, ...] = ("yr", "mnth"),
    compression: str = "snappy",
    max_records_per_file: int = 5_000_000,
) -> None:
    """S3: dynamic-partition overwrite of the cleaned table to ``path``."""
    (
        df.write.mode("overwrite")
        .format(fmt)
        .option("compression", compression)
        .option("maxRecordsPerFile", str(max_records_per_file))
        .partitionBy(*partition_cols)
        .save(path)
    )


def write_clean_table(
    df: DataFrame,
    table: str,
    fmt: str = "parquet",
    partition_cols: tuple[str, ...] = ("yr", "mnth"),
    bucket_col: str = "tip_amount",
    n_buckets: int = 5,
    compression: str = "snappy",
) -> None:
    """S2+S3: bucketed catalog-table sink (REF:251-258).

    ``CLUSTERED BY (tip_amount) SORTED BY (tip_amount) INTO 5 BUCKETS``
    (REF:255) -> ``bucketBy(5).sortBy(...)``; requires saveAsTable.
    """
    (
        df.write.mode("overwrite")
        .format(fmt)
        .option("compression", compression)
        .partitionBy(*partition_cols)
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .saveAsTable(table)
    )
