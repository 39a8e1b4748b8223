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
    """The 60-bit md5-prefix base hash (dedup signatures) matches a Python
    recompute -- the property that makes the DuckDB oracle exact."""
    from nyc_taxi_dataset_analysis_apache_hive_spark.operators.dedup import (
        MINHASH_P,
        shingle_base_hash,
    )

    samples = ["alpha beta gamma", "x", "", "déjà vu", "0 1 2 3"]
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    got = [r["h"] for r in df.select(shingle_base_hash(F.col("s")).alias("h")).collect()]
    expected = [
        int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16) % MINHASH_P
        for s in samples
    ]
    assert got == expected
