"""Streaming entity-dictionary maintenance (r16): the maintained
``(name, n_records, min_id)`` dictionary equals a batch rebuild over
everything streamed, the canonicalization read path over the
maintained state equals the batch path, and a replay is idempotent.
Uses the ``part`` table as a parquet drop zone (its p_name column is
the x-family fuzzy-linkage entity column).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from nyc_taxi_dataset_analysis_apache_hive_spark.operators import linkage
from nyc_taxi_dataset_analysis_apache_hive_spark.sources.readers import load_table
from nyc_taxi_dataset_analysis_apache_hive_spark.streaming import maintenance as mnt


@pytest.fixture(scope="module")
def parts_dir(spark, tmp_path_factory):
    """Part sf0.001 as 4 parquet files (4 micro-batches)."""
    pdf = load_table(spark, "/root/testdata/sf0.001", "part").toPandas()
    out = str(tmp_path_factory.mktemp("linkage_stream") / "part")
    os.makedirs(out)
    n = len(pdf)
    for i in range(4):
        pdf.iloc[n * i // 4 : n * (i + 1) // 4].to_parquet(
            os.path.join(out, f"{i:02d}.parquet"), index=False
        )
    return out


def _dict_map(df):
    return {r["name"]: (r["n_records"], r["min_id"]) for r in df.collect()}


def test_maintained_dictionary_equals_batch_rebuild(spark, parts_dir, tmp_path):
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    stream = (
        spark.readStream.schema(spark.read.parquet(parts_dir).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(parts_dir)
    )
    q = (
        mnt.linkage_maintenance_stream(
            stream, state, ckpt, "p_name", "p_partkey"
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = mnt.read_sketch_state(spark, state)
    assert got is not None
    want = linkage.name_dictionary(
        spark.read.parquet(parts_dir), "p_name", "p_partkey"
    )
    assert _dict_map(got) == _dict_map(want)

    # the deployment read path: canonicalization over maintained state
    # equals the batch path
    got_canon = linkage.canonical_map(linkage.blocked_pairs(got), got)
    want_canon = linkage.canonical_map(linkage.blocked_pairs(want), want)
    assert sorted(map(tuple, got_canon.collect())) == sorted(
        map(tuple, want_canon.collect())
    )


def test_fold_replay_is_idempotent(spark, parts_dir, tmp_path):
    state = str(tmp_path / "state")
    part = spark.read.parquet(parts_dir)
    half_a = part.filter(F.col("p_partkey") % 2 == 0)
    half_b = part.filter(F.col("p_partkey") % 2 == 1)
    mnt.fold_batch_into_name_dictionary(half_a, 0, state, "p_name", "p_partkey")
    mnt.fold_batch_into_name_dictionary(half_b, 1, state, "p_name", "p_partkey")
    once = _dict_map(mnt.read_sketch_state(spark, state))
    mnt.fold_batch_into_name_dictionary(half_b, 1, state, "p_name", "p_partkey")
    assert _dict_map(mnt.read_sketch_state(spark, state)) == once
    assert once == _dict_map(
        linkage.name_dictionary(part, "p_name", "p_partkey")
    )
