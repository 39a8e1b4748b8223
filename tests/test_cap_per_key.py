"""Per-key cap: exact per-key counts, uniform-hash determinism and
append-monotonicity, and salted two-phase == unsalted equality."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nyc_taxi_dataset_analysis_apache_hive_spark.operators.sampling import cap_per_key
from nyc_taxi_dataset_analysis_apache_hive_spark.sources.readers import load_table

CAP = 25


@pytest.fixture(scope="module")
def docs(spark, sf0001_dir):
    return load_table(spark, sf0001_dir, "documents")


def _ids(df):
    return {r["doc_id"] for r in df.select("doc_id").collect()}


def test_counts_capped_and_small_keys_untouched(spark, docs):
    capped = cap_per_key(docs, "lang", CAP)
    before = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    after = {r["lang"]: r["n"] for r in capped.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert set(after) == set(before)
    for k, n in before.items():
        assert after[k] == min(n, CAP), k


def test_deterministic_across_partitionings(spark, docs):
    a = _ids(cap_per_key(docs, "lang", CAP))
    b = _ids(cap_per_key(docs.repartition(17, "doc_id"), "lang", CAP))
    assert a == b


def test_salted_two_phase_equals_unsalted(spark, docs):
    plain = _ids(cap_per_key(docs, "lang", CAP))
    salted = _ids(cap_per_key(docs, "lang", CAP, n_salts=8))
    assert plain == salted


def test_append_never_readmits_dropped_rows(spark, docs):
    """Keep-set monotonicity: capping a PREFIX of the data keeps a
    superset-rank view -- rows dropped on the prefix stay dropped after
    more rows arrive (ranks only grow)."""
    half = docs.filter(F.crc32(F.col("doc_id").cast("string")) % 2 == 0)
    kept_half = _ids(cap_per_key(half, "lang", CAP))
    kept_full = _ids(cap_per_key(docs, "lang", CAP))
    dropped_on_half = _ids(half) - kept_half
    assert not (dropped_on_half & kept_full)
