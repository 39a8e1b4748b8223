"""BPE training/encoding: merges match an independently-written reference
trainer, rank-priority encoding equals sequential merge application,
reconstruction round-trips, token counts shrink monotonically with more
merges, and training is partitioning-invariant."""

from __future__ import annotations

from collections import Counter

import pytest

from pyspark.sql import functions as F

from nyc_taxi_dataset_analysis_apache_hive_spark.functions.text import tokens
from nyc_taxi_dataset_analysis_apache_hive_spark.operators import bpe
from nyc_taxi_dataset_analysis_apache_hive_spark.sources.readers import load_table


# -- independent reference implementation (kept deliberately naive) --------


def _ref_train(words: dict[str, int], n_merges: int):
    corpus = {tuple(w) + (bpe.EOW,): n for w, n in words.items()}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for seq, n in corpus.items():
            for a, b in zip(seq, seq[1:]):
                pairs[(a, b)] += n
        if not pairs:
            break
        top = max(pairs.values())
        best = sorted(p for p, c in pairs.items() if c == top)[0]
        merges.append(best)
        nxt = {}
        for seq, n in corpus.items():
            out, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and (seq[i], seq[i + 1]) == best:
                    out.append(seq[i] + seq[i + 1])
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            key = tuple(out)
            nxt[key] = nxt.get(key, 0) + n
        corpus = nxt
    return merges


def _ref_encode_sequential(word: str, merges) -> list[str]:
    """Encode by applying every merge in training order (the equivalence
    partner of rank-priority encoding)."""
    seq = list(word) + [bpe.EOW]
    for a, b in merges:
        out, i = [], 0
        while i < len(seq):
            if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(seq[i])
                i += 1
        seq = out
    return seq


@pytest.fixture(scope="module")
def docs(spark, sf0001_dir):
    return load_table(spark, sf0001_dir, "documents").localCheckpoint()


@pytest.fixture(scope="module")
def wc(docs):
    return bpe.word_counts(docs).localCheckpoint()


@pytest.fixture(scope="module")
def merges(wc):
    return bpe.bpe_train(wc, n_merges=60)


def test_word_counts_match_python(docs, wc):
    want = Counter()
    for r in docs.select("text").collect():
        import re

        for w in re.split("[^a-z0-9]+", (r["text"] or "").lower()):
            if w:
                want[w] += 1
    got = {r["word"]: r["n"] for r in wc.collect()}
    assert got == dict(want)


def test_merges_match_reference_trainer(wc, merges):
    words = {r["word"]: r["n"] for r in wc.collect()}
    assert merges == _ref_train(words, 60)


def test_rank_priority_encode_equals_sequential(wc, merges):
    ranks = {p: i for i, p in enumerate(merges)}
    for r in wc.limit(200).collect():
        w = r["word"]
        assert bpe._encode_word(w, ranks) == _ref_encode_sequential(
            w, merges
        ), w


def test_encode_reconstructs_and_shrinks(docs, merges):
    """Concatenated BPE tokens reproduce the lowercased token stream, and
    more merges never produce more tokens."""
    enc = bpe.encode_tokens(docs, merges).select(
        "doc_id",
        F.concat_ws("", "bpe_tokens").alias("joined"),
        F.size("bpe_tokens").alias("n_full"),
        F.concat_ws(
            "",
            F.transform(
                tokens("text"), lambda t: F.concat(t, F.lit(bpe.EOW))
            ),
        ).alias("want_joined"),
    )
    few = bpe.encode_tokens(docs, merges[:5]).select(
        "doc_id", F.size("bpe_tokens").alias("n_few")
    )
    rows = enc.join(few, "doc_id").collect()
    assert rows
    for r in rows:
        assert r["joined"] == r["want_joined"], r["doc_id"]
        assert r["n_full"] <= r["n_few"]


def test_training_is_partitioning_invariant(docs, merges):
    wc7 = bpe.word_counts(docs.repartition(7))
    assert bpe.bpe_train(wc7, n_merges=60) == merges


def test_min_count_floors_rare_words(docs):
    all_words = bpe.word_counts(docs).count()
    floored = bpe.word_counts(docs, min_count=5)
    assert floored.count() <= all_words
    assert floored.filter(F.col("n") < 5).count() == 0


def test_bpe_train_guards_oversized_collect(wc):
    """The one driver-side collect is size-checked BEFORE it happens: a
    word table above max_words raises with the bounded fix paths instead
    of OOMing the driver."""
    with pytest.raises(ValueError, match="max_words"):
        bpe.bpe_train(wc, n_merges=5, max_words=10)


def test_roundtrip_audit_all_green_on_corpus(docs):
    """The driver-facing audit row (pl1's op='bpe' leg): every document
    passes roundtrip + token-count sanity, so all three counts equal the
    corpus size -- exactly what the DuckDB oracle asserts."""
    [r] = bpe.bpe_roundtrip_audit(docs).collect()
    n = docs.count()
    assert (r["n_bpe_docs"], r["n_bpe_roundtrip"], r["n_bpe_token_sane"]) \
        == (n, n, n)


def test_roundtrip_audit_adversarial_corpus(spark):
    """Audit stays green on text the tokenizer must normalize away:
    punctuation runs, digits, unicode, empty and NULL bodies (zero-token
    docs roundtrip as the empty string and satisfy 0 <= 0 <= 0)."""
    rows = [
        (1, "Hello, WORLD!!  hello world"),
        (2, "123 abc123abc 99bottles"),
        (3, "café naïve 中文 emoji \U0001f600"),
        (4, ""),
        (5, None),
        (6, "a" * 500),
        (7, "one-token"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    [r] = bpe.bpe_roundtrip_audit(docs, n_merges=10).collect()
    assert (r["n_bpe_docs"], r["n_bpe_roundtrip"], r["n_bpe_token_sane"]) \
        == (7, 7, 7)


def test_top_words_caps_deterministically(docs, wc):
    """top_words keeps exactly the N highest-count words (ties broken
    lexicographically) so a capped training table is reproducible."""
    capped = bpe.top_words(wc, 50)
    got = [(r["word"], r["n"]) for r in capped.collect()]
    want = sorted(
        [(r["word"], r["n"]) for r in wc.collect()],
        key=lambda t: (-t[1], t[0]),
    )[:50]
    assert sorted(got, key=lambda t: (-t[1], t[0])) == want
    # a capped table trains without tripping the guard
    assert bpe.bpe_train(capped, n_merges=5, max_words=50)
