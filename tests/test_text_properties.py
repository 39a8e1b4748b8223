"""Property-based tests (hypothesis): the JVM text expressions agree with
independent pure-Python reference implementations on arbitrary inputs.

The text functions are the foundation of every dedup/text operator AND of
their DuckDB oracles, so a silent divergence (regex dialect, unicode
lowering, empty-token handling) would corrupt everything above them.
Alphabet spans ASCII + Latin supplements; each example ships a whole batch
of strings through one DataFrame to amortize the JVM roundtrip.
"""

from __future__ import annotations

import hashlib
import re

import pytest
from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from nyc_taxi_dataset_analysis_apache_hive_spark.functions.text import (
    BPE_TOKEN_REGEX,
    TOKEN_SPLIT_REGEX,
    fingerprint_md5,
    ngrams_from_tokens,
    token_count_bpe,
    tokens,
)

#: opt-in heavy suite (driver default-run budget): run via `pytest -m scale`
pytestmark = pytest.mark.scale

TEXTS = st.lists(
    st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=0x24F),
        max_size=60,
    ),
    min_size=1,
    max_size=25,
)

SETTINGS = settings(max_examples=12, deadline=None, derandomize=True)


def py_tokens(s: str) -> list[str]:
    return [t for t in re.split(TOKEN_SPLIT_REGEX, s.lower()) if t != ""]


def py_ngrams(toks: list[str], n: int) -> list[str]:
    if len(toks) < n:
        return []
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


@SETTINGS
@given(texts=TEXTS)
def test_tokens_match_python(spark, texts):
    got = [
        r["toks"]
        for r in _df(spark, texts)
        .select("doc_id", tokens("text").alias("toks"))
        .orderBy("doc_id")
        .collect()
    ]
    assert got == [py_tokens(t) for t in texts]


@SETTINGS
@given(texts=TEXTS, n=st.integers(min_value=1, max_value=4))
def test_ngrams_match_python(spark, texts, n):
    got = [
        r["grams"]
        for r in _df(spark, texts)
        .select("doc_id", tokens("text").alias("toks"))
        .select("doc_id", ngrams_from_tokens(F.col("toks"), n).alias("grams"))
        .orderBy("doc_id")
        .collect()
    ]
    assert got == [py_ngrams(py_tokens(t), n) for t in texts]


@SETTINGS
@given(texts=TEXTS)
def test_bpe_count_matches_python(spark, texts):
    got = [
        r["n"]
        for r in _df(spark, texts)
        .select("doc_id", token_count_bpe("text").alias("n"))
        .orderBy("doc_id")
        .collect()
    ]
    # Java regex \s is ASCII-only; Python's is unicode-aware -- rewrite the
    # reference with Java's class so the python recompute matches the
    # engine semantics (Spark and DuckDB/RE2 agree on ASCII \s)
    java_bpe = BPE_TOKEN_REGEX.replace("\\s", " \\t\\n\\x0b\\f\\r")
    assert got == [len(re.findall(java_bpe, t.lower())) for t in texts]


@SETTINGS
@given(texts=TEXTS)
def test_fingerprint_matches_python_md5(spark, texts):
    got = [
        r["fp"]
        for r in _df(spark, texts)
        .select("doc_id", fingerprint_md5("text").alias("fp"))
        .orderBy("doc_id")
        .collect()
    ]
    expected = [
        hashlib.md5(
            re.sub(r"[ \t\n\x0b\f\r]+", " ", t.lower())  # Java-\s semantics
            .strip(" ")  # Spark trim strips spaces only, not unicode \s
            .encode("utf-8")
        ).hexdigest()
        for t in texts
    ]
    assert got == expected


def test_minhash_portable_base_hash(spark):
    """The 60-bit md5-prefix base hash (d4 inverted-index join key) and its
    mod-p reduction (MinHash permutation field) both match a Python
    recompute -- the property that makes the DuckDB oracles exact."""
    from nyc_taxi_dataset_analysis_apache_hive_spark.operators.dedup import (
        MINHASH_P,
        minhash_reduced_hash,
        shingle_base_hash,
    )

    samples = ["alpha beta gamma", "x", "", "déjà vu", "0 1 2 3"]
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    rows = df.select(
        shingle_base_hash(F.col("s")).alias("h"),
        minhash_reduced_hash(F.col("s")).alias("hr"),
    ).collect()
    base = [int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16) for s in samples]
    assert [r["h"] for r in rows] == base
    assert [r["hr"] for r in rows] == [h % MINHASH_P for h in base]
    # the join-key hash keeps the full 60-bit width (collision resistance
    # for the inverted index); at least one sample must exceed 31 bits
    assert any(h >= 2**31 for h in base)


def _simhash_map(spark, docs):
    from nyc_taxi_dataset_analysis_apache_hive_spark.operators.dedup import simhash_64

    df = spark.createDataFrame(docs, "doc_id long, text string")
    return {r["doc_id"]: r["simhash"] for r in simhash_64(df).collect()}


def _hamming(a: int, b: int) -> int:
    return bin((a ^ b) & (2**64 - 1)).count("1")


def test_simhash_hamming_quality(spark):
    """The d5 quality gate: near-identical documents land at small Hamming
    distance, unrelated documents far apart, exact duplicates at 0."""
    base = (
        "the quick brown fox jumps over the lazy dog while seventy birds "
        "watch from the old oak tree near the river bank in autumn light"
    )
    near = base.replace("autumn", "winter")  # one token changed
    unrelated = (
        "quantum flux capacitors require routine calibration against "
        "spurious harmonic interference measured in decibel units daily"
    )
    sh = _simhash_map(
        spark,
        [(1, base), (2, base), (3, near), (4, unrelated)],
    )
    assert _hamming(sh[1], sh[2]) == 0  # exact dup
    near_d = _hamming(sh[1], sh[3])
    far_d = _hamming(sh[1], sh[4])
    assert near_d <= 8, near_d  # one-token edit moves few bits
    assert far_d >= 16, far_d  # unrelated text ~ random half of 64 bits
    assert near_d < far_d


def test_simhash_near_pairs_exact_recall_any_hamming(spark):
    """Dynamic pigeonhole blocking: for max_hamming beyond the default 3
    (more, narrower chunks), the operator returns EXACTLY the brute-force
    Hamming-filter pair set -- no candidate is silently missed."""
    from nyc_taxi_dataset_analysis_apache_hive_spark.operators.dedup import (
        simhash_64,
        simhash_near_pairs,
    )
    from nyc_taxi_dataset_analysis_apache_hive_spark.sources.readers import (
        load_table,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").filter(
        F.col("doc_id") < 120
    )
    sigs = {r["doc_id"]: r["simhash"] for r in simhash_64(docs).collect()}
    for h in (4, 6):
        expected = {
            (a, b, _hamming(sigs[a], sigs[b]))
            for a in sigs
            for b in sigs
            if a < b and _hamming(sigs[a], sigs[b]) <= h
        }
        got = {
            (r["doc_a"], r["doc_b"], r["hamming"])
            for r in simhash_near_pairs(docs, max_hamming=h).collect()
        }
        assert got == expected, h


def test_simhash_near_pairs_finds_dups_only(spark):
    """simhash_near_pairs surfaces the exact-dup pair (Hamming 0) and does
    not pair unrelated docs at max_hamming=3."""
    from nyc_taxi_dataset_analysis_apache_hive_spark.operators.dedup import (
        simhash_near_pairs,
    )

    base = (
        "the quick brown fox jumps over the lazy dog while seventy birds "
        "watch from the old oak tree near the river bank in autumn light"
    )
    unrelated = (
        "quantum flux capacitors require routine calibration against "
        "spurious harmonic interference measured in decibel units daily"
    )
    df = spark.createDataFrame(
        [(1, base), (2, base), (3, unrelated)], "doc_id long, text string"
    )
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_near_pairs(df, max_hamming=3).collect()
    }
    assert pairs == {(1, 2): 0}
