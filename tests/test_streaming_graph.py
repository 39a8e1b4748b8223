"""Streaming dup-pair-graph maintenance (r17): the maintained
symmetric distinct edge set equals a batch ``symmetric_edges`` over
every pair ever streamed, the graph read path (PageRank + triangle
counts) over the maintained state equals the batch path, and a replay
is idempotent.  The pair stream is the d3 MinHash-LSH pair table at
sf0.001 written as a parquet drop zone -- exactly what an incremental
near-dup admission emits per trigger (pairs may be RE-delivered across
batches; the set fold collapses them).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from nyc_taxi_dataset_analysis_apache_hive_spark.operators import dedup, graph
from nyc_taxi_dataset_analysis_apache_hive_spark.sources.readers import load_table
from nyc_taxi_dataset_analysis_apache_hive_spark.streaming import maintenance as mnt


@pytest.fixture(scope="module")
def pairs_dir(spark, tmp_path_factory):
    """The sf0.001 MinHash-LSH near-dup pairs as 4 parquet files (4
    micro-batches), with the LAST batch re-delivering the first
    batch's pairs (admission re-emits on doc re-appearance)."""
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    pdf = (
        dedup.minhash_lsh_pairs(docs, jaccard_threshold=0.2)
        .select("doc_a", "doc_b")
        .toPandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    assert len(pdf) >= 8, "fixture needs a non-trivial pair graph"
    out = str(tmp_path_factory.mktemp("graph_stream") / "pairs")
    os.makedirs(out)
    n = len(pdf)
    for i in range(3):
        pdf.iloc[n * i // 3 : n * (i + 1) // 3].to_parquet(
            os.path.join(out, f"{i:02d}.parquet"), index=False
        )
    # redundant re-delivery batch: the first third again
    pdf.iloc[: n // 3].to_parquet(os.path.join(out, "03.parquet"), index=False)
    return out


def _edge_set(df):
    return {(r["a"], r["b"]) for r in df.collect()}


def _vmap(df, val):
    return {r["v"]: r[val] for r in df.collect()}


def test_maintained_graph_equals_batch_rebuild(spark, pairs_dir, tmp_path):
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    stream = (
        spark.readStream.schema(spark.read.parquet(pairs_dir).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(pairs_dir)
    )
    q = (
        mnt.graph_maintenance_stream(stream, state, ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = mnt.read_sketch_state(spark, state)
    assert got is not None
    want = graph.symmetric_edges(spark.read.parquet(pairs_dir))
    assert _edge_set(got) == _edge_set(want)

    # the deployment read path: graph analytics over maintained state
    # equal the batch path (exact integers on both sides)
    assert _vmap(graph.pagerank(got), "pr") == _vmap(
        graph.pagerank(want), "pr"
    )
    assert _vmap(graph.triangle_counts(got), "n_tri") == _vmap(
        graph.triangle_counts(want), "n_tri"
    )


def test_fold_replay_is_idempotent_and_order_free(spark, pairs_dir, tmp_path):
    state = str(tmp_path / "state")
    pairs = spark.read.parquet(pairs_dir)
    half_a = pairs.filter(F.col("doc_a") % 2 == 0)
    half_b = pairs.filter(F.col("doc_a") % 2 == 1)
    mnt.fold_batch_into_edge_set(half_a, 0, state)
    mnt.fold_batch_into_edge_set(half_b, 1, state)
    once = _edge_set(mnt.read_sketch_state(spark, state))
    # replaying the newest batch re-reads v=0 and recommits v=1
    mnt.fold_batch_into_edge_set(half_b, 1, state)
    assert _edge_set(mnt.read_sketch_state(spark, state)) == once
    assert once == _edge_set(graph.symmetric_edges(pairs))
