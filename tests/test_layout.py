"""Z-order layout: Morton-code parity vs a python recompute, row
preservation through the rewrite, and the point of it all -- measured
footer-stats file skipping on BOTH clustered columns vs a single-column
range sort, which can only skip on one."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nyc_taxi_dataset_analysis_apache_hive_spark.sources import layout
from nyc_taxi_dataset_analysis_apache_hive_spark.sources.readers import load_table

N_FILES = 8
BITS = 6


@pytest.fixture(scope="module")
def lineitem(spark, sf0001_dir):
    return load_table(spark, sf0001_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )


@pytest.fixture(scope="module")
def zpath(lineitem, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("layout") / "li_zorder")
    layout.write_zordered(
        lineitem, p, ["l_orderkey", "l_partkey"], n_files=N_FILES, bits_per_col=BITS
    )
    return p


@pytest.fixture(scope="module")
def rangepath(lineitem, tmp_path_factory):
    """The contrast layout: same file count, range-sorted on the FIRST
    column only (what a naive ORDER BY compaction gives you)."""
    p = str(tmp_path_factory.mktemp("layout") / "li_range")
    (
        lineitem.repartitionByRange(N_FILES, "l_orderkey")
        .sortWithinPartitions("l_orderkey")
        .write.mode("overwrite")
        .parquet(p)
    )
    return p


def test_morton_code_matches_python_recompute(spark, lineitem):
    """The codegen'd shift/or expression is a real Morton code: recompute
    bucket indexes + bit interleave in python from the same cut points."""
    zcol, cuts = layout.zorder_value(lineitem, ["l_partkey", "l_suppkey"], BITS)
    rows = (
        lineitem.select("l_partkey", "l_suppkey", zcol.alias("z"))
        .limit(500)
        .collect()
    )

    def bucket(v, cps):
        return sum(1 for c in cps if c <= v)

    def morton(b1, b2):
        z = 0
        for i in range(BITS):
            z |= ((b1 >> i) & 1) << (2 * i)
            z |= ((b2 >> i) & 1) << (2 * i + 1)
        return z

    for r in rows:
        expect = morton(
            bucket(r["l_partkey"], cuts["l_partkey"]),
            bucket(r["l_suppkey"], cuts["l_suppkey"]),
        )
        assert r["z"] == expect, r


def test_rewrite_preserves_rows_exactly(spark, lineitem, zpath):
    back = spark.read.parquet(zpath)
    assert back.count() == lineitem.count()
    key = F.concat_ws("|", "l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
    a = lineitem.select(F.sum(F.crc32(key)).alias("s"), F.count("*").alias("n"))
    b = back.select(F.sum(F.crc32(key)).alias("s"), F.count("*").alias("n"))
    assert a.first() == b.first()


def test_zorder_skips_files_on_second_dimension(spark, zpath, rangepath, lineitem):
    """The clustering payoff: a mid-range predicate on the SECOND
    clustered column must open fewer files under Z-order than under a
    first-column-only range sort, which cannot skip on it at all."""
    cols = ["l_orderkey", "l_partkey"]
    zstats = layout.file_stats(spark, zpath, cols)
    rstats = layout.file_stats(spark, rangepath, cols)
    assert len(zstats) == N_FILES and len(rstats) == N_FILES

    plo, phi = lineitem.stat.approxQuantile("l_partkey", [0.45, 0.55], 0.0)
    part_box = {"l_partkey": (plo, phi)}
    z_hits = layout.candidate_files(zstats, part_box)
    r_hits = layout.candidate_files(rstats, part_box)
    # range layout sorted on l_orderkey spreads every l_partkey value
    # across all files -> no skipping on the second dimension
    assert len(r_hits) == N_FILES
    assert len(z_hits) < N_FILES

    olo, ohi = lineitem.stat.approxQuantile("l_orderkey", [0.45, 0.55], 0.0)
    box = {"l_orderkey": (olo, ohi), "l_partkey": (plo, phi)}
    z_box = layout.candidate_files(zstats, box)
    assert len(z_box) <= len(z_hits)
    assert len(z_box) < N_FILES


def test_single_column_zorder_is_a_range_sort(spark, lineitem, tmp_path):
    """Degenerate case: one column's Z-value is just its bucket index, so
    files tile the value range -- point predicates hit ~1 file."""
    p = str(tmp_path / "li_z1")
    layout.write_zordered(lineitem, p, ["l_partkey"], n_files=4, bits_per_col=8)
    stats = layout.file_stats(spark, p, ["l_partkey"])
    med = lineitem.stat.approxQuantile("l_partkey", [0.5], 0.0)[0]
    hits = layout.candidate_files(stats, {"l_partkey": (med, med)})
    assert len(hits) <= 2


def test_bits_overflow_guard(lineitem):
    with pytest.raises(ValueError, match="63"):
        layout.zorder_value(lineitem, ["l_partkey", "l_suppkey"], 32)


# ---------------------------------------------------------------------------
# Small-file compaction
# ---------------------------------------------------------------------------


def test_compact_plan_bin_packing():
    report = [
        {"partition": "", "n_files": 64, "bytes": 300 * 1024 * 1024},
    ]
    # ceil(300MB / 128MB) = 3; tiny partitions floor at 1 file
    assert layout.compact_plan(report) == {"": 3}
    assert layout.compact_plan(
        [{"partition": "d=1", "n_files": 40, "bytes": 10}]
    ) == {"d=1": 1}


def _crc_sum(df, cols):
    return (
        df.select(
            F.sum(
                F.crc32(F.concat_ws("|", *[F.col(c).cast("string") for c in cols]))
            ).alias("s")
        ).first()["s"]
    )


def test_compact_flat_dataset(spark, lineitem, tmp_path):
    """64 tiny files -> exactly the planned file count, zero rows lost."""
    frag = str(tmp_path / "frag")
    out = str(tmp_path / "compacted")
    lineitem.repartition(64).write.parquet(frag)
    before = layout.partition_file_report(spark, frag)
    assert before[0]["n_files"] == 64
    target = max(1, before[0]["bytes"] // 4)
    res = layout.compact_dataset(spark, frag, out, target_bytes=target)
    want = res["plan"][""]
    assert res["after"][0]["n_files"] == want <= 8
    a = spark.read.parquet(frag)
    b = spark.read.parquet(out)
    cols = a.columns
    assert b.count() == a.count()
    assert _crc_sum(a, cols) == _crc_sum(b, cols)


def test_compact_partitioned_dataset(spark, sf0001_dir, tmp_path):
    """Hive-partitioned fragmentation: every partition dir compacts to at
    most its planned bucket count (collisions only merge), partition
    values and rows survive bit-exactly."""
    orders = load_table(spark, sf0001_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    )
    frag = str(tmp_path / "frag_part")
    out = str(tmp_path / "compact_part")
    (
        orders.repartition(12)
        .write.partitionBy("o_orderpriority")
        .parquet(frag)
    )
    before = layout.partition_file_report(spark, frag)
    assert all(r["n_files"] > 2 for r in before)
    res = layout.compact_dataset(
        spark,
        frag,
        out,
        target_bytes=max(r["bytes"] for r in before),
        partition_cols=["o_orderpriority"],
        key_col="o_orderkey",
    )
    after = {r["partition"]: r["n_files"] for r in res["after"]}
    assert set(after) == {r["partition"] for r in before}
    for part, n in after.items():
        assert 1 <= n <= res["plan"][part], part
    a = spark.read.parquet(frag)
    b = spark.read.parquet(out)
    cols = ["o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"]
    assert b.count() == a.count()
    assert _crc_sum(a, cols) == _crc_sum(b, cols)


def test_compact_partitioned_requires_key_col(spark, tmp_path, lineitem):
    frag = str(tmp_path / "x")
    lineitem.limit(10).write.partitionBy("l_suppkey").parquet(frag)
    with pytest.raises(ValueError, match="key_col"):
        layout.compact_dataset(
            spark, frag, str(tmp_path / "y"), partition_cols=["l_suppkey"]
        )


def test_compact_partitioned_nulls_and_special_chars(spark, tmp_path):
    """Partition values Hive dir-encodes (NULL ->
    __HIVE_DEFAULT_PARTITION__, specials URL-escaped) must still hit the
    bucket plan: the planner decodes dir names into VALUES instead of
    re-encoding values into dir strings, so every partition compacts to
    its planned count instead of silently coalescing to one file."""
    df = spark.createDataFrame(
        [(i, v) for i in range(400) for v in ("a b", "c:d", None)],
        "k int, part string",
    )
    frag = str(tmp_path / "frag_special")
    out = str(tmp_path / "out_special")
    df.repartition(8).write.partitionBy("part").parquet(frag)
    before = layout.partition_file_report(spark, frag)
    assert any("__HIVE_DEFAULT_PARTITION__" in r["partition"] for r in before)
    res = layout.compact_dataset(
        spark,
        frag,
        out,
        # force a >=4-file plan per partition so a silent 1-file coalesce
        # (the old dir-string mismatch) is unambiguous: task-hash
        # collisions can merge SOME buckets, but collapsing 4 to 1 has
        # ~1e-3 probability while the bug produces exactly 1 every time
        target_bytes=max(1, max(r["bytes"] for r in before) // 4),
        partition_cols=["part"],
        key_col="k",
    )
    assert all(n >= 4 for n in res["plan"].values())
    after = {r["partition"]: r["n_files"] for r in res["after"]}
    assert set(after) == {r["partition"] for r in before}
    for part, n in after.items():
        assert 2 <= n <= res["plan"][part], (part, n)
    a = spark.read.parquet(frag)
    b = spark.read.parquet(out)
    assert b.count() == a.count()
    assert _crc_sum(a, ["k", "part"]) == _crc_sum(b, ["k", "part"])


def test_partition_file_report_over_file_uri(spark, sf0001_dir, tmp_path):
    """The report lists through the Hadoop FileSystem API: a file:///
    URI (the code path hdfs://'/s3a:// take) yields the identical report
    a bare local path does, including hive-partition grouping."""
    orders = load_table(spark, sf0001_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    frag = tmp_path / "report_uri"
    orders.repartition(4).write.partitionBy("o_orderpriority").parquet(
        str(frag)
    )
    plain = layout.partition_file_report(spark, str(frag))
    via_uri = layout.partition_file_report(spark, frag.as_uri())
    assert plain == via_uri
    assert len(plain) == 5  # one group per priority dir
    assert all(r["partition"].startswith("o_orderpriority=") for r in plain)
    assert all(r["n_files"] == 4 and r["bytes"] > 0 for r in plain)


def test_file_stats_recurses_partition_dirs(spark, sf0001_dir, tmp_path):
    """file_stats walks hive-partition subdirectories: stats cover every
    data file under the dataset root (relative paths), and a predicate on
    a PARTITION column -- absent from footers -- must never prune (no
    stats means the file cannot be proven non-matching)."""
    orders = load_table(spark, sf0001_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    root = str(tmp_path / "stats_part")
    orders.repartition(3).write.partitionBy("o_orderpriority").parquet(root)
    stats = layout.file_stats(spark, root, ["o_totalprice", "o_orderpriority"])
    assert len(stats) == 15  # 5 priorities x 3 files
    assert all("/" in r["file"] for r in stats)  # relative, not basename
    assert all(r["o_orderpriority"] == (None, None) for r in stats)
    # partition-col predicate: no footer stats -> conservatively keep all
    hits = layout.candidate_files(stats, {"o_orderpriority": ("0", "9")})
    assert len(hits) == len(stats)
    # real-column predicate still prunes within the recursive stats
    lo = min(r["o_totalprice"][0] for r in stats)
    assert 0 < len(
        layout.candidate_files(stats, {"o_totalprice": (lo, lo)})
    ) < len(stats)


def test_zordered_etl_sink_prunes_files(spark, tmp_path):
    """End-to-end opt-in layout on the reference's S3 write path: the
    cleaned taxi table written with zorder_cols prunes at BOTH levels --
    mnth via hive partition dirs, tip_amount via parquet footer stats
    inside a partition -- and the rows survive the rewrite bit-exactly."""
    import os

    from nyc_taxi_dataset_analysis_apache_hive_spark.operators import etl
    from nyc_taxi_dataset_analysis_apache_hive_spark.sources.readers import (
        read_trips_parquet,
    )
    from nyc_taxi_dataset_analysis_apache_hive_spark.sources.writers import (
        write_clean_partitioned,
    )
    from tests.taxi_fixture import write_fixture

    paths = write_fixture(str(tmp_path / "taxi"))
    clean = etl.clean_trips(read_trips_parquet(spark, paths["parquet"]))
    out = str(tmp_path / "clean_z")
    write_clean_partitioned(
        clean, out, zorder_cols=["tip_amount", "trip_distance"], n_files=16
    )

    # level 1: the month predicate prunes whole directories
    dirs = sorted(
        d for d in os.listdir(os.path.join(out, "yr=2017"))
        if d.startswith("mnth=")
    )
    assert dirs == ["mnth=11", "mnth=12"]

    # level 2: footer min/max prune files inside a partition
    part_dir = os.path.join(out, "yr=2017", "mnth=11")
    stats = layout.file_stats(spark, part_dir, ["tip_amount", "trip_distance"])
    assert len(stats) >= 4, "need several files for skipping to mean anything"
    lo = min(r["tip_amount"][0] for r in stats)
    hi = max(r["tip_amount"][1] for r in stats)
    band = (lo, lo + (hi - lo) * 0.05)
    hits = layout.candidate_files(stats, {"tip_amount": band})
    assert 0 < len(hits) < len(stats), (
        f"5% tip_amount slice opened {len(hits)}/{len(stats)} files -- "
        "no measured skipping"
    )

    # fidelity: same rows before and after the layout rewrite
    b = spark.read.parquet(out)
    cols = clean.columns
    assert b.count() == clean.count()
    assert _crc_sum(clean, cols) == _crc_sum(b.select(cols), cols)


def test_file_stats_over_file_uri(spark, sf0001_dir, tmp_path):
    """file_stats goes through the Hadoop FS API end to end (LIST +
    footer tail reads), so a file:/// URI -- the same code path an
    hdfs:// or s3a:// audit takes, minus the wire -- yields stats
    byte-identical to the bare local path."""
    orders = load_table(spark, sf0001_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    root = str(tmp_path / "stats_uri")
    orders.repartition(4).write.parquet(root)
    plain = layout.file_stats(spark, root, ["o_totalprice"])
    via_uri = layout.file_stats(spark, "file://" + root, ["o_totalprice"])
    assert plain == via_uri
    assert len(plain) == 4
    assert all(r["o_totalprice"][0] is not None for r in plain)
