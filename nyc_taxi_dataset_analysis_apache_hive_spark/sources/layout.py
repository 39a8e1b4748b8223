"""Multi-dimensional data layout (Z-order clustering) for file skipping.

At 100 TB the cheapest query is the one that never opens most files:
parquet footers carry per-column min/max, and both Spark's scan and any
lakehouse table format (Delta/Iceberg ``OPTIMIZE ZORDER``) prune files
whose stats can't match the predicate.  A range-sort on ONE column gives
perfect skipping on that column and none on the others; interleaving the
bits of several columns' quantile-bucket indexes (a Morton / Z-curve)
gives useful skipping on ALL of them at once, because nearby Z-values are
nearby in every dimension -- each output file covers a small bounding box.

Scale shape: one ``approxQuantile`` pass computes per-column cut points
(a tiny driver-side array, NOT a global sort), the Z-value is a single
whole-stage-codegen expression (HOF bucket lookup + shift/or interleave,
no Python), and the only shuffle is the ``repartitionByRange`` that any
layout job needs.  This is a write-amortized pattern: you pay it once per
compaction, every subsequent selective scan skips files.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket_index(col: Column, cut_points: list[float]) -> Column:
    """Quantile-bucket index in [0, len(cut_points)]: the number of cut
    points <= value, via an array HOF (JVM-side, O(n_buckets) per row).
    NULLs land in bucket 0, i.e. sort first -- same convention as a
    NULLS FIRST range sort."""
    bnds = F.lit(cut_points)
    return F.size(F.filter(bnds, lambda x: x <= col.cast("double")))


def _interleave_bits(bucket_cols: list[Column], bits: int) -> Column:
    """Morton code: bit i of column j lands at position i*n_cols + j.
    Stays a single codegen'd long expression -- no UDF."""
    n = len(bucket_cols)
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(bucket_cols):
            bit = F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + j))
    return z


def zorder_value(
    df: DataFrame, cols: list[str], bits_per_col: int = 8
) -> tuple[Column, dict[str, list[float]]]:
    """Build the Z-value expression for ``cols`` over ``df``.

    Cut points come from ``approxQuantile`` (relative error 1e-3) so
    buckets are equi-populated even under skew -- a linear min/max split
    would put all of a hot key's rows in one bucket.  Returns the column
    expression plus the per-column cut points (tiny; persist them if you
    want to bucket later increments identically).
    """
    if len(cols) < 1:
        raise ValueError("zorder_value needs at least one column")
    if len(cols) * bits_per_col > 63:
        raise ValueError(
            f"{len(cols)} cols x {bits_per_col} bits = "
            f"{len(cols) * bits_per_col} bits > 63 (long overflow); "
            "lower bits_per_col"
        )
    n_buckets = 1 << bits_per_col
    probs = [k / n_buckets for k in range(1, n_buckets)]
    casted = df.select(
        *[F.col(c).cast("double").alias(c) for c in cols]
    )
    cuts: dict[str, list[float]] = {}
    for c in cols:
        qs = casted.stat.approxQuantile(c, probs, 1e-3)
        # skewed columns repeat quantiles; duplicate cut points would
        # waste bucket codes without changing the ordering
        cuts[c] = sorted(set(qs))
    zcol = _interleave_bits(
        [_bucket_index(F.col(c), cuts[c]) for c in cols], bits_per_col
    )
    return zcol, cuts


def cluster_by_zorder(
    df: DataFrame,
    cols: list[str],
    n_files: int,
    bits_per_col: int = 8,
) -> DataFrame:
    """Rows range-partitioned + sorted by Z-value, ready to write: each
    output file covers one contiguous Z-range, i.e. a small bounding box
    in every clustered dimension.  One shuffle (the range exchange that
    any layout rewrite pays); the Z expression itself is map-side."""
    zcol, _ = zorder_value(df, cols, bits_per_col)
    tagged = df.withColumn("__zval", zcol)
    return (
        tagged.repartitionByRange(n_files, "__zval")
        .sortWithinPartitions("__zval")
        .drop("__zval")
    )


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 32,
    bits_per_col: int = 8,
    mode: str = "overwrite",
) -> None:
    """Compaction job: rewrite ``df`` as ``n_files`` Z-clustered parquet
    files at ``path``.  Parquet min/max footer stats then prune files for
    predicates on ANY of ``cols`` -- no table format required."""
    cluster_by_zorder(df, cols, n_files, bits_per_col).write.mode(
        mode
    ).parquet(path)


def file_stats(spark, path: str, cols: list[str]) -> list[dict]:
    """Per-file min/max for ``cols`` from parquet footers (driver-side,
    metadata only) -- what a skipping scan consults.  One dict per data
    file, RECURSIVE over hive-partition subdirectories:
    ``{"file": <path relative to the dataset root>, col: (min, max)}``.

    Goes through the Hadoop FileSystem API end to end -- ONE recursive
    LIST (``sources.fs.list_files``) plus a few small tail reads per
    footer (``sources.fs.HadoopBinaryFile`` feeding pyarrow's footer
    decoder) -- so ``path`` may be ``hdfs://``/``s3a://``/``file://``/
    local, same as :func:`partition_file_report`.  Never touches file
    data pages."""
    import pyarrow.parquet as pq

    from . import fs as hfs

    base = hfs.qualified(spark, path).rstrip("/")
    out = []
    for rel, _size in hfs.list_files(spark, path, suffix=".parquet"):
        with hfs.HadoopBinaryFile(spark, f"{base}/{rel}") as fobj:
            md = pq.read_metadata(fobj)
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        rec: dict = {"file": rel}
        for c in cols:
            lo, hi = None, None
            # hive-partition columns live in directory names, not footers:
            # report (None, None) = "no stats", which candidate_files must
            # treat as unprunable, never as prunable
            if c in idx:
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(idx[c]).statistics
                    if st is None or not st.has_min_max:
                        lo, hi = None, None
                        break
                    lo = st.min if lo is None else min(lo, st.min)
                    hi = st.max if hi is None else max(hi, st.max)
            rec[c] = (lo, hi)
        out.append(rec)
    return out


# ---------------------------------------------------------------------------
# Small-file compaction (bin-pack a dataset's files to a target size)
# ---------------------------------------------------------------------------


def partition_file_report(spark, path: str) -> list[dict]:
    """Listing of a (possibly hive-partitioned) parquet dataset: one dict
    per partition directory -- ``{"partition": rel_dir ('' for flat),
    "n_files": int, "bytes": int}``.  Goes through the Hadoop FileSystem
    API (``sources.fs``), so ``path`` can be ``hdfs://``/``s3a://``/any
    configured scheme; on an object store this is exactly the LIST a
    table format's manifest would replace.  Metadata only -- names and
    lengths, never file contents."""
    from . import fs as hfs

    groups: dict[str, dict] = {}
    for rel, size in hfs.list_files(spark, path, suffix=".parquet"):
        key = rel.rsplit("/", 1)[0] if "/" in rel else ""
        g = groups.setdefault(key, {"n_files": 0, "bytes": 0})
        g["n_files"] += 1
        g["bytes"] += size
    return [
        {"partition": k, **v} for k, v in sorted(groups.items())
    ]


def compact_plan(
    report: list[dict], target_bytes: int = 128 * 1024 * 1024
) -> dict[str, int]:
    """Per-partition output file counts: ceil(bytes / target), min 1.
    128 MB default target -- the conventional parquet sweet spot (row
    groups stay scannable, file count stays listable)."""
    return {
        r["partition"]: max(1, -(-r["bytes"] // target_bytes))
        for r in report
    }


def compact_dataset(
    spark,
    in_path: str,
    out_path: str,
    target_bytes: int = 128 * 1024 * 1024,
    partition_cols: list[str] | None = None,
    key_col: str = None,
) -> dict:
    """Rewrite a small-file-fragmented dataset with ~target-size files,
    preserving hive partitioning.  Returns ``{"before": report,
    "plan": plan, "after": report}``.

    Plan shape: ONE read + ONE hash shuffle + ONE write -- the shuffle
    key is (partition cols, bucket) where ``bucket =
    pmod(xxhash64(key_col), n_buckets(partition))`` and the per-partition
    bucket counts come from the driver-side size report (tiny; broadcast
    into the plan as a literal MAP lookup).  Each (partition, bucket)
    group lands in one task, and the partitioned write emits one file per
    partition per task, so every partition dir ends up with at most its
    planned file count (hash collisions between buckets can only MERGE
    files, never fragment).  Flat datasets take the same path with a
    single global bucket count."""
    before = partition_file_report(spark, in_path)
    plan = compact_plan(before, target_bytes)
    df = spark.read.parquet(in_path)

    if not partition_cols:
        n = plan.get("", 1)
        df.repartition(n).write.mode("overwrite").parquet(out_path)
    else:
        if key_col is None:
            raise ValueError(
                "partitioned compaction needs key_col (a stable row key "
                "to hash into per-partition buckets)"
            )
        # Plan keys are directory names; the DataFrame carries partition
        # VALUES.  Re-encoding values into dir strings would have to
        # replicate Hive's escaping (URL-escaped specials,
        # __HIVE_DEFAULT_PARTITION__ for NULL -- and a plain concat NULLs
        # out the whole expression), so instead DECODE each dir key into
        # its value tuple (percent-unescape, NULL sentinel) and match on a
        # sentinel-joined value string both sides build identically.
        from urllib.parse import unquote

        NULL_TOKEN = "\x00__NULL__\x00"
        SEP = "\x01"

        def _dir_key_values(rel_dir: str) -> str:
            vals: dict[str, str] = {}
            for piece in rel_dir.split("/"):
                c, _, v = piece.partition("=")
                vals[c] = (
                    NULL_TOKEN
                    if v == "__HIVE_DEFAULT_PARTITION__"
                    else unquote(v)
                )
            return SEP.join(vals[c] for c in partition_cols)

        part_expr = F.concat_ws(
            SEP,
            *[
                F.coalesce(F.col(c).cast("string"), F.lit(NULL_TOKEN))
                for c in partition_cols
            ],
        )
        mapping = F.create_map(
            *[
                lit
                for k, n in plan.items()
                for lit in (F.lit(_dir_key_values(k)), F.lit(n))
            ]
        )
        buckets = F.element_at(mapping, part_expr)
        bucketed = df.withColumn(
            "__bucket",
            F.pmod(F.xxhash64(F.col(key_col)), F.coalesce(buckets, F.lit(1))),
        )
        n_tasks = max(sum(plan.values()) * 2, 1)
        (
            bucketed.repartition(
                n_tasks, *[F.col(c) for c in partition_cols], F.col("__bucket")
            )
            .drop("__bucket")
            .write.mode("overwrite")
            .partitionBy(*partition_cols)
            .parquet(out_path)
        )
    return {
        "before": before,
        "plan": plan,
        "after": partition_file_report(spark, out_path),
    }


def candidate_files(
    stats: list[dict], predicate: dict[str, tuple]
) -> list[str]:
    """Files a stats-pruning scan must open for a conjunctive box
    predicate ``{col: (lo, hi)}``: footer range intersects every queried
    interval.  Mirrors the pruning both Spark's parquet scan (row-group
    level) and lakehouse manifests (file level) perform."""
    hits = []
    for rec in stats:
        ok = True
        for c, (qlo, qhi) in predicate.items():
            flo, fhi = rec.get(c, (None, None))
            if flo is None or fhi is None:
                # no footer stats for this column (absent stats, or a
                # hive-partition column): the file cannot be PROVEN
                # non-matching, so a correct pruner must open it
                continue
            if fhi < qlo or flo > qhi:
                ok = False
                break
        if ok:
            hits.append(rec["file"])
    return hits
