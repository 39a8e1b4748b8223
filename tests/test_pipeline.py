"""End-to-end curation gate: the composed pipeline's decisions must be
consistent with its constituent operators and internally coherent, and the
canonical election must prefer CLEAN duplicates (round-3 review finding:
electing before hygiene loses a cluster whose min-id copy is dirty)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from nyc_taxi_dataset_analysis_apache_hive_spark.operators import dedup, pipeline
from nyc_taxi_dataset_analysis_apache_hive_spark.sources.readers import load_table


def test_curate_corpus_coherent(spark, sf0001_dir):
    docs = load_table(spark, sf0001_dir, "documents").select("doc_id", "text")
    cur = pipeline.curate_corpus(docs)
    rows = cur.collect()
    # row universe: exactly one decision row per input document
    assert len(rows) == docs.count()
    by_cluster: dict = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
        # keep decomposes exactly
        assert r["keep"] == (r["hygiene_ok"] and r["is_canonical"])
        assert r["hygiene_ok"] == (
            not (
                r["drop_short"]
                or r["drop_repetitive"]
                or r["drop_low_quality"]
                or r["drop_pii_heavy"]
            )
        )
        # flags recompute from the carried features (decision is auditable)
        assert r["drop_short"] == (r["n_tokens_ws"] < 5)
        assert r["drop_repetitive"] == (r["dup_line_frac"] > 0.3)
        assert r["drop_pii_heavy"] == (r["n_pii_hits"] > 10)
        assert r["split_id"] in (0, 1, 2)
    for cluster_id, members in by_cluster.items():
        canon = [m for m in members if m["is_canonical"]]
        survivors = [m["doc_id"] for m in members if m["hygiene_ok"]]
        if survivors:
            # exactly one canonical: the min-id hygiene survivor
            assert len(canon) == 1
            assert canon[0]["doc_id"] == min(survivors)
        else:
            assert not canon
    # cluster structure agrees with the standalone dedup pipeline
    pairs = dedup.minhash_lsh_pairs(docs, jaccard_threshold=0.5)
    kl = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.dedup_keep_list(docs, pairs).collect()
    }
    got = {r["doc_id"]: r["cluster_id"] for r in rows}
    assert got == kl


def test_dirty_canonical_does_not_lose_cluster(spark):
    """A near-dup cluster whose MIN-id copy fails hygiene must still keep
    its clean duplicate (the data-loss trap the election-order fix closes)."""
    base = " ".join(f"tok{i}" for i in range(200))
    pii = " ".join(f"user{i}@mail.com" for i in range(12))  # 12 emails
    docs = spark.createDataFrame(
        [
            (1, base + " " + pii),  # near-dup of 2, PII-heavy -> fails hygiene
            (2, base),              # clean duplicate, higher id
            (3, "completely different text " * 30),
        ],
        "doc_id long, text string",
    )
    cur = {r["doc_id"]: r for r in pipeline.curate_corpus(docs).collect()}
    assert cur[1]["cluster_id"] == cur[2]["cluster_id"] == 1  # same cluster
    assert not cur[1]["hygiene_ok"] and cur[1]["drop_pii_heavy"]
    assert not cur[1]["keep"] and not cur[1]["is_canonical"]
    # the clean copy is elected and kept -- the content survives
    assert cur[2]["hygiene_ok"] and cur[2]["is_canonical"] and cur[2]["keep"]
    assert cur[3]["keep"]


def test_curation_report_funnel(spark, sf0001_dir):
    docs = load_table(spark, sf0001_dir, "documents").select("doc_id", "text")
    cur = pipeline.curate_corpus(docs)
    [rep] = pipeline.curation_report(cur).collect()
    assert rep["n_docs"] == docs.count()
    assert rep["n_kept"] == (
        rep["n_kept_train"] + rep["n_kept_val"] + rep["n_kept_test"]
    )
    assert 0 < rep["n_kept"] <= rep["n_docs"]
    # the corpus has planted near-dups -> some election losers exist
    assert rep["n_dedup_dropped"] > 0


def test_curate_rules_overridable_and_validated(spark, sf0001_dir):
    docs = load_table(spark, sf0001_dir, "documents").select("doc_id", "text")
    strict = pipeline.curate_corpus(docs, rules={"min_tokens": 10_000})
    assert strict.filter(F.col("keep")).count() == 0  # everything is short now
    with pytest.raises(ValueError, match="unknown curation rules"):
        pipeline.curate_corpus(docs, rules={"max_pii": 0})  # typo must raise


def test_curate_pairs_with_threshold_raises(spark, sf0001_dir):
    """pairs= DEFINES the dedup semantics, so pairing it with ANY
    explicit jaccard_threshold must raise instead of silently ignoring
    the threshold (r13 ADVICE closure; None sentinel catches an
    explicit 0.5 too)."""
    docs = load_table(spark, sf0001_dir, "documents").select("doc_id", "text")
    pairs = dedup.minhash_lsh_pairs(docs, jaccard_threshold=0.5)
    with pytest.raises(ValueError, match="pairs="):
        pipeline.curate_corpus(docs, pairs=pairs, jaccard_threshold=0.9)
    with pytest.raises(ValueError, match="pairs="):
        # even the numeric default: the sentinel catches explicit use
        pipeline.curate_corpus(docs, pairs=pairs, jaccard_threshold=0.5)
    # pairs= alone stays fine (the pl1 entry's shape)
    pipeline.curate_corpus(docs, pairs=pairs)


def test_curation_report_leakage_fold(spark, sf0001_dir):
    """pairs= folds the cross-split audit into the funnel row, its
    numbers must equal an independent recompute from the same pair
    table, and the pairs= compute-once hook must not change decisions."""
    from nyc_taxi_dataset_analysis_apache_hive_spark.operators import sampling

    docs = load_table(spark, sf0001_dir, "documents").select("doc_id", "text")
    pairs = dedup.minhash_lsh_pairs(docs, jaccard_threshold=0.5).localCheckpoint(
        eager=True
    )
    cur = pipeline.curate_corpus(docs, pairs=pairs)
    row = pipeline.curation_report(cur, pairs=pairs).collect()[0]
    # independent recompute from the raw tables
    split = {r["doc_id"]: r["split_id"] for r in cur.collect()}
    plist = [(r["doc_a"], r["doc_b"]) for r in pairs.collect()]
    assert row["n_dup_pairs"] == len(plist)
    assert row["n_split_leaks"] == sum(
        1 for a, b in plist if split[a] != split[b]
    )
    # hook equivalence: decisions identical with and without pairs=
    base = pipeline.curate_corpus(docs)
    assert sorted(map(tuple, cur.collect())) == sorted(
        map(tuple, base.collect())
    )
    # without pairs= the report keeps its original (audit-free) schema
    assert "n_dup_pairs" not in pipeline.curation_report(cur).columns
    # the folded numbers agree with the standalone audit's boundary rows
    rep = sampling.split_leakage_report(
        cur.select("doc_id", "split_id"), pairs
    ).collect()
    assert row["n_dup_pairs"] == sum(r["n_pairs"] for r in rep)
    assert row["n_split_leaks"] == sum(
        r["n_pairs"] for r in rep if r["split_lo"] != r["split_hi"]
    )
