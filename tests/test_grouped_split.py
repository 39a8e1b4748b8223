"""Leakage-safe grouped split (sampling.grouped_hash_split): cluster
members always share a split, singletons are bit-identical to the plain
per-doc hash_split, and the wiring works on real connected-components
output."""

from __future__ import annotations

from pyspark.sql import Row

from nyc_taxi_dataset_analysis_apache_hive_spark.operators import dedup, sampling


def test_cluster_members_share_split_and_singletons_match_plain(spark):
    ids = spark.createDataFrame([Row(doc_id=i) for i in range(200)])
    # docs 0..9 form one cluster (rep 0), 50..52 another (rep 50)
    groups = spark.createDataFrame(
        [Row(doc_id=i, cluster_id=0) for i in range(10)]
        + [Row(doc_id=i, cluster_id=50) for i in (50, 51, 52)]
    )
    out = {
        r["doc_id"]: r["split_id"]
        for r in sampling.grouped_hash_split(ids, groups).collect()
    }
    assert len(out) == 200
    assert len({out[i] for i in range(10)}) == 1
    assert len({out[i] for i in (50, 51, 52)}) == 1
    # cluster members inherit the REPRESENTATIVE's plain assignment
    plain = {
        r["doc_id"]: r["split_id"]
        for r in sampling.hash_split(ids, id_col="doc_id").collect()
    }
    assert out[7] == plain[0] and out[52] == plain[50]
    # singletons are bit-identical to the per-doc split
    clustered = set(range(10)) | {50, 51, 52}
    for i in set(range(200)) - clustered:
        assert out[i] == plain[i], i


def test_on_connected_components_output(spark):
    pairs = spark.createDataFrame(
        [
            Row(doc_a=1, doc_b=2),
            Row(doc_a=2, doc_b=3),
            Row(doc_a=10, doc_b=11),
        ]
    )
    comps = dedup.connected_components(pairs)
    ids = spark.createDataFrame([Row(doc_id=i) for i in (1, 2, 3, 10, 11, 99)])
    out = {
        r["doc_id"]: r["split_id"]
        for r in sampling.grouped_hash_split(ids, comps).collect()
    }
    assert out[1] == out[2] == out[3]
    assert out[10] == out[11]
    assert set(out) == {1, 2, 3, 10, 11, 99}
    assert all(v in (0, 1, 2) for v in out.values())


def test_split_fractions_roughly_hold(spark):
    ids = spark.createDataFrame([Row(doc_id=i) for i in range(3000)])
    empty = spark.createDataFrame([], "doc_id long, cluster_id long")
    out = sampling.grouped_hash_split(ids, empty).collect()
    counts = [0, 0, 0]
    for r in out:
        counts[r["split_id"]] += 1
    assert abs(counts[0] / 3000 - 0.8) < 0.05
    assert abs(counts[1] / 3000 - 0.1) < 0.03
    assert abs(counts[2] / 3000 - 0.1) < 0.03
