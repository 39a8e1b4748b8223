"""Okapi BM25 scoring (textops.bm25_scores): hand-computed tiny-corpus
golden, partitioning invariance (the BIGINT micro-unit sum must make the
doubles independent of partitioning -- the property the driver oracle's
value hash needs), and edge laws (NULL text, no-match docs, empty query).

The test replicates the operator's EXACT float arithmetic (same
association order, same micro-unit truncation) rather than a looser
approximate check, because bit-identity across engines is the contract
the tv1 ``bm25`` leg ships under (test_ngram_lm.py precedent)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row

from nyc_taxi_dataset_analysis_apache_hive_spark.operators import textops


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )


def _micro(x: float) -> int:
    return math.floor(x * 1_000_000.0 + 1e-9)


def _trunc4(x: float) -> float:
    return math.floor(x * 10_000.0 + 1e-7) / 10_000.0


def _expected_score(term_stats, dl, n_docs, avgdl, k1=1.2, b=0.75):
    """Python replica of the operator's per-doc score: term_stats is a
    list of (tf, df) pairs for the matching terms; the same expression
    order as the Column expressions in bm25_scores."""
    c1, c2, c3 = textops.bm25_constants(k1, b)
    total = 0
    for tf, df in term_stats:
        idf = math.log((float(n_docs) - df + 0.5) / (float(df) + 0.5) + 1.0)
        frac = (tf * c1) / (float(tf) + c2 + c3 * (dl / avgdl))
        total += _micro(idf * frac)
    return _trunc4(total / 1_000_000.0)


def test_hand_computed_tiny_corpus(spark):
    # corpus: dl = [3, 2, 2, 0, 2] -> N = 5, avgdl = 9.0 / 5
    # tf: d0:a=2, d1:x=1, d4:a=1, d4:x=1 -> df: a=2, x=2
    out = {
        r["doc_id"]: r
        for r in textops.bm25_scores(
            _docs(spark, ["a b a", "x y", "b c", None, "a x"]),
            query_terms=["a", "x"],
        ).collect()
    }
    # no-match and NULL-text docs are absent (score 0 by definition) ...
    assert sorted(out) == [0, 1, 4]
    avgdl = 9.0 / 5  # ... but they DO count toward N and avgdl
    assert (out[0]["n_match_terms"], out[0]["n_tokens"]) == (1, 3)
    assert out[0]["score"] == _expected_score([(2, 2)], 3, 5, avgdl)
    assert (out[1]["n_match_terms"], out[1]["n_tokens"]) == (1, 2)
    assert out[1]["score"] == _expected_score([(1, 2)], 2, 5, avgdl)
    # d4 matches both terms: the per-doc sum spans two micro-unit partials
    assert (out[4]["n_match_terms"], out[4]["n_tokens"]) == (2, 2)
    assert out[4]["score"] == _expected_score([(1, 2), (1, 2)], 2, 5, avgdl)


def test_rare_term_outscores_common_term(spark):
    """idf must rank a rare term above a ubiquitous one at equal tf/dl."""
    texts = ["rare common", "common zz", "common yy", "common ww"]
    out = {
        r["doc_id"]: r["score"]
        for r in textops.bm25_scores(
            _docs(spark, texts), query_terms=["rare", "common"]
        ).collect()
    }
    # d0 carries rare+common, d1-d3 only common; all dl identical
    assert out[0] > out[1] == out[2] == out[3] > 0


def test_duplicate_and_unknown_query_terms(spark):
    """Term list is deduplicated; terms absent from the corpus contribute
    nothing (no NULL poisoning via the df join)."""
    docs = _docs(spark, ["a b", "b c"])
    base = sorted(
        map(tuple, textops.bm25_scores(docs, query_terms=["a"]).collect())
    )
    noisy = sorted(
        map(
            tuple,
            textops.bm25_scores(
                docs, query_terms=["a", "a", "zzz_never_seen"]
            ).collect(),
        )
    )
    assert base == noisy


def test_empty_query_raises(spark):
    with pytest.raises(ValueError):
        textops.bm25_scores(_docs(spark, ["a"]), query_terms=[])


def test_partitioning_invariance(spark, sf0001_dir):
    """Exact integer per-doc sums -> identical doubles at any partitioning."""
    docs = spark.read.parquet(f"{sf0001_dir}/documents.parquet")
    terms = list(textops.BM25_QUERY_TERMS)
    base = sorted(
        map(tuple, textops.bm25_scores(docs, query_terms=terms).collect())
    )
    repart = sorted(
        map(
            tuple,
            textops.bm25_scores(
                docs.repartition(13), query_terms=terms
            ).collect(),
        )
    )
    assert base == repart
    assert len(base) > 0


def test_driver_terms_hit_the_corpus(spark, sf0001_dir):
    """The registry's fixed term set must keep exercising both idf ends:
    every term present, and 'dup' genuinely rare (df < 20% of docs)."""
    docs = spark.read.parquet(f"{sf0001_dir}/documents.parquet")
    rows = textops.bm25_scores(
        docs, query_terms=list(textops.BM25_QUERY_TERMS)
    ).collect()
    n_docs = docs.count()
    matched = {r["doc_id"] for r in rows}
    assert len(matched) > 0.5 * n_docs  # common terms reach most docs
    n_dup = (
        docs.selectExpr(
            "size(filter(split(lower(text), '[^a-z0-9]+'), "
            "x -> x = 'dup')) > 0 AS hit"
        )
        .filter("hit")
        .count()
    )
    assert 0 < n_dup < 0.2 * n_docs
