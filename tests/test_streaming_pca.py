"""Streaming PCA-moments maintenance (r17): the maintained (n, s, ss)
row equals a batch moments pass over everything streamed (allclose at
double precision -- float addition order differs between the fold
chain and the batch reduce; stated on the fold), the model read path
over the maintained state matches the batch fit, replay is
idempotent, and empty micro-batches are skipped without corrupting
the ledger.
"""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from nyc_taxi_dataset_analysis_apache_hive_spark.operators import pca
from nyc_taxi_dataset_analysis_apache_hive_spark.sources.readers import load_table
from nyc_taxi_dataset_analysis_apache_hive_spark.streaming import maintenance as mnt


@pytest.fixture(scope="module")
def vecs_dir(spark, tmp_path_factory):
    """Embeddings sf0.001 as 4 parquet files (4 micro-batches)."""
    pdf = load_table(spark, "/root/testdata/sf0.001", "embeddings").toPandas()
    out = str(tmp_path_factory.mktemp("pca_stream") / "embeddings")
    os.makedirs(out)
    n = len(pdf)
    for i in range(4):
        pdf.iloc[n * i // 4 : n * (i + 1) // 4].to_parquet(
            os.path.join(out, f"{i:02d}.parquet"), index=False
        )
    return out


def test_maintained_moments_equal_batch_pass(spark, vecs_dir, tmp_path):
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    stream = (
        spark.readStream.schema(spark.read.parquet(vecs_dir).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(vecs_dir)
    )
    q = (
        mnt.pca_maintenance_stream(stream, state, ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = mnt.read_moments_state(spark, state)
    assert got is not None
    n, s, ss = got
    batch = spark.read.parquet(vecs_dir)
    want = pca.embedding_moments(batch).collect()
    wn = sum(r["n"] for r in want)
    ws = np.sum([np.asarray(r["s"]) for r in want], axis=0)
    wss = np.sum([np.asarray(r["ss"]) for r in want], axis=0)
    assert n == wn
    np.testing.assert_allclose(s, ws, rtol=1e-12)
    np.testing.assert_allclose(ss, wss, rtol=1e-12)

    # the deployment read path: model from maintained state == batch fit
    got_model = pca.model_from_moments(n, s, ss, k=8)
    want_model = pca.pca_fit(batch, k=8)
    np.testing.assert_allclose(
        got_model["mean"], want_model["mean"], rtol=1e-9
    )
    np.testing.assert_allclose(
        got_model["components"], want_model["components"], rtol=1e-6,
        atol=1e-8,
    )


def test_fold_replay_is_idempotent_and_split_invariant(spark, vecs_dir, tmp_path):
    state = str(tmp_path / "state")
    vecs = spark.read.parquet(vecs_dir)
    half_a = vecs.filter(F.col("vec_id") % 2 == 0)
    half_b = vecs.filter(F.col("vec_id") % 2 == 1)
    mnt.fold_batch_into_moments(half_a, 0, state)
    mnt.fold_batch_into_moments(half_b, 1, state)
    n1, s1, ss1 = mnt.read_moments_state(spark, state)
    # replaying the newest batch re-reads v=0 and recommits v=1
    mnt.fold_batch_into_moments(half_b, 1, state)
    n2, s2, ss2 = mnt.read_moments_state(spark, state)
    assert n1 == n2
    np.testing.assert_allclose(s1, s2, rtol=0)
    np.testing.assert_allclose(ss1, ss2, rtol=0)
    # and the two-batch fold matches the one-shot batch pass
    want = pca.embedding_moments(vecs).collect()
    assert n1 == sum(r["n"] for r in want)
    np.testing.assert_allclose(
        s1, np.sum([np.asarray(r["s"]) for r in want], axis=0), rtol=1e-12
    )


def test_empty_batch_is_skipped_not_committed(spark, vecs_dir, tmp_path):
    state = str(tmp_path / "state")
    vecs = spark.read.parquet(vecs_dir)
    empty = vecs.filter(F.lit(False))
    all_null = vecs.select(
        "vec_id", F.lit(None).cast("array<float>").alias("embedding")
    )
    mnt.fold_batch_into_moments(vecs, 0, state)
    before = mnt.read_moments_state(spark, state)
    mnt.fold_batch_into_moments(empty, 1, state)
    mnt.fold_batch_into_moments(all_null, 2, state)
    after = mnt.read_moments_state(spark, state)
    assert after[0] == before[0]
    np.testing.assert_allclose(after[1], before[1], rtol=0)
