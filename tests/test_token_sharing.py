"""The r18 shared-token-pass overloads: every ``toks=``/``tf=``/
``per_doc=`` consumer must produce EXACTLY the rows of its direct
(docs) path -- including on the NULL/empty/short-text edges where the
token table's null-safe empty array and the direct path's NULL array
could diverge (size() = 0 vs -1 is exactly the class the r9
adversarial sweep existed for)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nyc_taxi_dataset_analysis_apache_hive_spark.operators import dedup, textops

#: NULL text, empty, whitespace-only, sub-n-gram short docs, repeats
#: (so the scrub heavy set and colloc min-count legs are non-empty),
#: and an odd/even doc_id mix for the two-sided d7 overloads.
_ROWS = [
    (0, "the quick brown fox jumps over the lazy dog again and again", "src0"),
    (1, "the quick brown fox jumps over the lazy dog again and again", "src1"),
    (2, "the quick brown fox jumps over the lazy dog once more", "src0"),
    (3, None, "src1"),
    (4, "", "src0"),
    (5, "   \t  ", None),
    (6, "one", "src2"),
    (7, "dup dup join query spark scan filter column sort merge window", "src0"),
    (8, "dup hash group scan filter column sort merge window dup", "src1"),
    (9, "a b a b a b a b a b a b", "src2"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(_ROWS, "doc_id long, text string, source string")


@pytest.fixture(scope="module")
def tt(docs):
    return dedup.token_table(docs, keep=("source",))


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_token_table_keep_carries_payload(docs, tt):
    assert tt.columns == ["doc_id", "source", "toks"]
    base = _rows(docs.select("doc_id", "source"))
    assert _rows(tt.select("doc_id", "source")) == base


@pytest.mark.parametrize(
    "direct, shared",
    [
        (
            lambda d, t: textops.term_frequencies(d),
            lambda d, t: textops.term_frequencies(toks=t),
        ),
        (
            lambda d, t: textops.vocabulary(d, min_count=2),
            lambda d, t: textops.vocabulary(
                min_count=2, per_doc=textops.term_frequencies(toks=t)
            ),
        ),
        (
            lambda d, t: textops.tfidf_top_terms(d, k=3),
            lambda d, t: textops.tfidf_top_terms(
                k=3, toks=t, tf=textops.term_frequencies(toks=t)
            ),
        ),
        (
            lambda d, t: textops.ngram_lm_scores(d),
            lambda d, t: textops.ngram_lm_scores(toks=t),
        ),
        (
            lambda d, t: textops.linear_probe_scores(d),
            lambda d, t: textops.linear_probe_scores(toks=t),
        ),
        (
            lambda d, t: textops.linear_probe_weights(d),
            lambda d, t: textops.linear_probe_weights(toks=t),
        ),
        (
            lambda d, t: textops.chunk_documents(d, chunk_tokens=4, stride=3),
            lambda d, t: textops.chunk_documents(
                chunk_tokens=4, stride=3, toks=t
            ),
        ),
        (
            lambda d, t: dedup.boilerplate_scrub(d, ngram_n=5, min_docs=2),
            lambda d, t: dedup.boilerplate_scrub(
                ngram_n=5, min_docs=2, toks=t
            ),
        ),
        (
            lambda d, t: textops.bm25_term_scores(d, ["dup", "join", "fox"]),
            lambda d, t: textops.bm25_term_scores(
                query_terms=["dup", "join", "fox"], toks=t
            ),
        ),
        (
            lambda d, t: textops.unigram_counts(d),
            lambda d, t: textops.unigram_counts(toks=t),
        ),
        (
            lambda d, t: textops.collocation_scores(d),
            lambda d, t: textops.collocation_scores(toks=t),
        ),
        (
            lambda d, t: textops.windowed_collocation_scores(d, window=3),
            lambda d, t: textops.windowed_collocation_scores(
                window=3, toks=t
            ),
        ),
    ],
    ids=[
        "term_frequencies",
        "vocabulary",
        "tfidf_top_terms",
        "ngram_lm_scores",
        "linear_probe_scores",
        "linear_probe_weights",
        "chunk_documents",
        "boilerplate_scrub",
        "bm25_term_scores",
        "unigram_counts",
        "collocation_scores",
        "windowed_collocation_scores",
    ],
)
def test_toks_overload_matches_direct(docs, tt, direct, shared):
    assert _rows(shared(docs, tt)) == _rows(direct(docs, tt))


@pytest.mark.parametrize(
    "direct, shared",
    [
        (
            lambda c, p, ct, pt: dedup.cross_corpus_minhash_pairs(
                corpus=c, probes=p, jaccard_threshold=0.2
            ),
            lambda c, p, ct, pt: dedup.cross_corpus_minhash_pairs(
                jaccard_threshold=0.2, corpus_toks=ct, probe_toks=pt
            ),
        ),
        (
            lambda c, p, ct, pt: dedup.ngram_overlap_contamination(
                c, p, ngram_n=5, threshold=0.2
            ),
            lambda c, p, ct, pt: dedup.ngram_overlap_contamination(
                ngram_n=5, threshold=0.2, corpus_toks=ct, probe_toks=pt
            ),
        ),
        (
            lambda c, p, ct, pt: dedup.cross_corpus_span_contamination(
                c, p, window=3, min_span=6
            ),
            lambda c, p, ct, pt: dedup.cross_corpus_span_contamination(
                window=3, min_span=6, corpus_toks=ct, probe_toks=pt
            ),
        ),
    ],
    ids=["minhash", "overlap", "spans"],
)
def test_two_sided_toks_matches_direct(docs, tt, direct, shared):
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    probes = docs.filter(F.col("doc_id") % 2 == 1)
    ct = tt.filter(F.col("doc_id") % 2 == 0)
    pt = tt.filter(F.col("doc_id") % 2 == 1)
    assert _rows(shared(corpus, probes, ct, pt)) == _rows(
        direct(corpus, probes, ct, pt)
    )


def test_overload_misuse_raises(docs, tt):
    with pytest.raises(ValueError, match="not both"):
        textops.ngram_lm_scores(docs, toks=tt)
    with pytest.raises(ValueError, match="not both"):
        dedup.boilerplate_scrub(docs, toks=tt)
    with pytest.raises(ValueError, match="not both"):
        textops.vocabulary(docs, per_doc=textops.term_frequencies(toks=tt))
    with pytest.raises(ValueError, match="come together"):
        dedup.cross_corpus_span_contamination(
            corpus_toks=tt, probe_toks=None
        )
    with pytest.raises(ValueError, match="required"):
        textops.tfidf_top_terms(tf=textops.term_frequencies(toks=tt))
