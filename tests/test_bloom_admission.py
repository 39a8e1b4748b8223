"""Portable Bloom-filter dedup admission (dedup.bloom_fingerprint_
admission): the no-false-negative law, forced false positives at a tiny
geometry, prebuilt-filter reuse with the geometry guard, and position
parity against a python md5 reference."""

from __future__ import annotations

import hashlib
import random

import pytest
from pyspark.sql import functions as F

from nyc_taxi_dataset_analysis_apache_hive_spark.operators import dedup


def _docs(spark, texts: dict[int, str | None]):
    return spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )


def _ref_positions(fp: str, k: int, m: int) -> list[int]:
    return [
        int(hashlib.md5(f"bloom{i}:{fp}".encode()).hexdigest()[:15], 16) % m
        for i in range(k)
    ]


def test_positions_match_python_md5_reference(spark):
    fps = ["abc", "", "deadbeef" * 4]
    rows = (
        spark.createDataFrame([(f,) for f in fps], "fp string")
        .select("fp", dedup.bloom_bit_positions(F.col("fp")).alias("pos"))
        .collect()
    )
    for r in rows:
        assert list(r.pos) == _ref_positions(r.fp, dedup.BLOOM_K, dedup.BLOOM_M)


def test_no_false_negatives_and_classes_partition(spark):
    rng = random.Random(7)
    hist_texts = {i: f"history document number {i} " + " ".join(
        rng.choice("abcdef") for _ in range(10)) for i in range(40)}
    hist = _docs(spark, hist_texts)
    # batch: 10 exact copies (re-keyed) + 10 novel docs
    batch_texts = {1000 + i: hist_texts[i] for i in range(10)}
    batch_texts.update({2000 + i: f"novel text {i} entirely fresh" for i in range(10)})
    batch = _docs(spark, batch_texts)
    rep = {r.doc_id: r for r in
           dedup.bloom_fingerprint_admission(hist, batch).collect()}
    assert len(rep) == 20
    for i in range(10):
        r = rep[1000 + i]
        assert r.bloom_candidate and r.duplicate_exact and not r.admitted
    for i in range(10):
        r = rep[2000 + i]
        assert not r.duplicate_exact and r.admitted
    # classes partition: dup => candidate (no-FN law)
    assert all(r.bloom_candidate for r in rep.values() if r.duplicate_exact)


def test_tiny_geometry_forces_false_positives_but_never_negatives(spark):
    """m=16, k=2: with 60 history docs virtually every bit is set, so
    novel docs become bloom candidates (FP) -- yet the exact verify
    still admits them, and every true duplicate stays a candidate."""
    hist = _docs(spark, {i: f"doc {i} alpha beta" for i in range(60)})
    batch = _docs(
        spark,
        {1000: "doc 3 alpha beta", 2000: "completely new text here"},
    )
    rep = {r.doc_id: r for r in
           dedup.bloom_fingerprint_admission(hist, batch, k=2, m=16).collect()}
    assert rep[1000].bloom_candidate and rep[1000].duplicate_exact
    assert rep[2000].bloom_candidate  # saturated filter: FP
    assert not rep[2000].duplicate_exact and rep[2000].admitted


def test_prebuilt_bits_reuse_and_geometry_guard(spark):
    hist = _docs(spark, {i: f"doc {i}" for i in range(20)})
    batch = _docs(spark, {100: "doc 7", 200: "fresh"})
    bits = dedup.bloom_filter_build(hist)
    got = {
        r.doc_id: (r.bloom_candidate, r.duplicate_exact)
        for r in dedup.bloom_fingerprint_admission(
            hist, batch, bloom_bits=bits
        ).collect()
    }
    want = {
        r.doc_id: (r.bloom_candidate, r.duplicate_exact)
        for r in dedup.bloom_fingerprint_admission(hist, batch).collect()
    }
    assert got == want
    with pytest.raises(ValueError, match="geometry"):
        dedup.bloom_fingerprint_admission(
            hist, batch, bloom_bits=bits, m=dedup.BLOOM_M
        )


def test_filter_is_mergeable_and_bounded(spark):
    """bits is sorted/distinct and bounded by m; union of two shard
    filters equals the filter of the union (the maintenance law)."""
    a = _docs(spark, {i: f"shard a doc {i}" for i in range(30)})
    b = _docs(spark, {100 + i: f"shard b doc {i}" for i in range(30)})
    bits_a = dedup.bloom_filter_build(a).collect()[0].bits
    bits_b = dedup.bloom_filter_build(b).collect()[0].bits
    both = dedup.bloom_filter_build(a.unionByName(b)).collect()[0].bits
    assert list(both) == sorted(set(bits_a) | set(bits_b))
    assert bits_a == sorted(set(bits_a)) and len(bits_a) <= dedup.BLOOM_M


def test_candidate_only_join_plan(spark):
    """The exact verify must join only the candidate slice, broadcast
    the bloom row, and never plan a cartesian on the fingerprint."""
    hist = _docs(spark, {i: f"doc {i}" for i in range(30)})
    batch = _docs(spark, {100: "doc 7", 200: "fresh"})
    plan = (
        dedup.bloom_fingerprint_admission(hist, batch)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "bloom_candidate" in plan


def test_bloom_stream_matches_batch_and_operator(spark, tmp_path):
    """The stateless drop-zone form: stream == batch analog == the batch
    operator document for document.  No watermark machinery -- admission
    decisions emit the trigger they arrive, so no sentinel is needed."""
    import os

    import pandas as pd

    from nyc_taxi_dataset_analysis_apache_hive_spark.streaming import curation

    hist_texts = {i: f"history doc {i} words" for i in range(30)}
    hist = _docs(spark, hist_texts)
    batch_texts = {1000 + i: hist_texts[i] for i in range(8)}  # planted dups
    batch_texts.update({2000 + i: f"fresh doc {i}" for i in range(8)})

    out = str(tmp_path / "docs")
    os.makedirs(out)
    base = pd.Timestamp("2024-01-01 00:00:00")
    items = sorted(batch_texts.items())
    for s in range(2):
        chunk = pd.DataFrame(
            items[len(items) * s // 2 : len(items) * (s + 1) // 2],
            columns=["doc_id", "text"],
        )
        chunk["ts"] = pd.Series(
            [base + pd.Timedelta(hours=s)] * len(chunk), dtype="datetime64[us]"
        ).values
        chunk.to_parquet(os.path.join(out, f"{s:02d}.parquet"), index=False)

    bits = dedup.bloom_filter_build(hist).localCheckpoint(eager=True)
    hist_fps = dedup.history_fingerprints(hist).localCheckpoint(eager=True)
    stream = curation.bloom_admission_stream(
        curation.read_docs_stream(spark, out), bits, hist_fps
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("bloom_admit_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"]: (r["bloom_candidate"], r["duplicate_exact"], r["admitted"])
        for r in spark.table("bloom_admit_sink").collect()
    }

    batch_docs = spark.read.parquet(out)
    analog = {
        r.doc_id: (r.bloom_candidate, r.duplicate_exact, r.admitted)
        for r in curation.bloom_admission_batch(
            batch_docs, bits, hist_fps
        ).collect()
    }
    operator = {
        r.doc_id: (r.bloom_candidate, r.duplicate_exact, r.admitted)
        for r in dedup.bloom_fingerprint_admission(hist, batch_docs).collect()
    }
    assert len(got) == 16
    assert got == analog == operator
    assert all(dup for (_, dup, _) in [got[1000 + i] for i in range(8)])
    assert all(adm for (_, _, adm) in [got[2000 + i] for i in range(8)])


def test_null_text_history_doc_is_duplicate_on_every_surface(spark):
    """Regression (r14 self-review): history_fingerprints pins the
    NULL-text coalesce -- a NULL-text history doc must be in BOTH
    artifacts (filter AND fp table), so a NULL/empty-text batch doc is
    duplicate_exact everywhere, never bloom-candidate-but-admitted."""
    from nyc_taxi_dataset_analysis_apache_hive_spark.streaming import curation

    hist = _docs(spark, {1: None, 2: "real doc here"})
    batch = _docs(spark, {10: None, 11: "", 12: "novel words entirely"})
    op = {r.doc_id: (r.bloom_candidate, r.duplicate_exact, r.admitted)
          for r in dedup.bloom_fingerprint_admission(hist, batch).collect()}
    bits = dedup.bloom_filter_build(hist)
    fps = dedup.history_fingerprints(hist)
    an = {r.doc_id: (r.bloom_candidate, r.duplicate_exact, r.admitted)
          for r in curation.bloom_admission_batch(batch, bits, fps).collect()}
    assert op == an
    # NULL and '' normalize to the same fingerprint -> both duplicates
    assert op[10] == (True, True, False)
    assert op[11] == (True, True, False)
    assert op[12][1] is False and op[12][2] is True
