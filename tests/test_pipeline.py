"""End-to-end curation gate: the composed pipeline's decisions must be
consistent with its constituent operators and internally coherent."""

from __future__ import annotations

from pyspark.sql import functions as F

from nyc_taxi_dataset_analysis_apache_hive_spark.operators import dedup, pipeline
from nyc_taxi_dataset_analysis_apache_hive_spark.sources.readers import load_table


def test_curate_corpus_coherent(spark, sf0001_dir):
    docs = load_table(spark, sf0001_dir, "documents").select("doc_id", "text")
    cur = pipeline.curate_corpus(docs)
    rows = cur.collect()
    # row universe: exactly one decision row per input document
    assert len(rows) == docs.count()
    by_id = {r["doc_id"]: r for r in rows}
    for r in rows:
        # keep implies every rule passed AND canonical
        if r["keep"]:
            assert not (
                r["drop_short"]
                or r["drop_repetitive"]
                or r["drop_low_quality"]
                or r["drop_pii_heavy"]
            )
            assert r["is_canonical"]
        # flags recompute from the carried features (decision is auditable)
        assert r["drop_short"] == (r["n_tokens_ws"] < 5)
        assert r["drop_repetitive"] == (r["dup_line_frac"] > 0.3)
        assert r["drop_pii_heavy"] == (r["n_pii_hits"] > 10)
        assert r["split_id"] in (0, 1, 2)
        # canonical doc of each cluster is its min doc_id
        if r["is_canonical"]:
            assert r["cluster_id"] == r["doc_id"]
        else:
            assert r["cluster_id"] < r["doc_id"]
    # near-dup decisions agree with the standalone keep-list
    pairs = dedup.minhash_lsh_pairs(docs, jaccard_threshold=0.5)
    kl = {r["doc_id"]: r["keep"] for r in dedup.dedup_keep_list(docs, pairs).collect()}
    assert all(by_id[d]["is_canonical"] == k for d, k in kl.items())


def test_curation_report_funnel(spark, sf0001_dir):
    docs = load_table(spark, sf0001_dir, "documents").select("doc_id", "text")
    cur = pipeline.curate_corpus(docs)
    [rep] = pipeline.curation_report(cur).collect()
    assert rep["n_docs"] == docs.count()
    assert rep["n_kept"] == (
        rep["n_kept_train"] + rep["n_kept_val"] + rep["n_kept_test"]
    )
    assert 0 < rep["n_kept"] <= rep["n_docs"]
    # the corpus has planted near-dups -> some non-canonical rows exist
    assert rep["n_near_dups"] > 0


def test_curate_rules_overridable(spark, sf0001_dir):
    docs = load_table(spark, sf0001_dir, "documents").select("doc_id", "text")
    strict = pipeline.curate_corpus(docs, rules={"min_tokens": 10_000})
    assert strict.filter(F.col("keep")).count() == 0  # everything is short now
