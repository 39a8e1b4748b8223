"""Hypothesis property tests for the pure-python cores of the sampling
and tokenizer operators (the Spark-side plumbing is oracle/golden-gated
elsewhere; these pin the algebraic invariants the distributed plans rely
on, over arbitrary inputs instead of the fixture corpus)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from nyc_taxi_dataset_analysis_apache_hive_spark.operators import bpe
from nyc_taxi_dataset_analysis_apache_hive_spark.operators.sampling import (
    cumulative_split_bounds,
)

WORDS = st.text(
    alphabet=st.characters(min_codepoint=97, max_codepoint=122),
    min_size=1,
    max_size=12,
)


@settings(max_examples=200, deadline=None)
@given(
    weights=st.lists(
        st.floats(min_value=0.01, max_value=100.0, allow_nan=False),
        min_size=2,
        max_size=6,
    )
)
def test_split_bounds_are_strictly_increasing_in_unit_interval(weights):
    """hash_split's boundaries must be strictly increasing and inside
    (0, 1): a non-monotone or out-of-range boundary would make some
    split empty or unreachable for ANY input id."""
    bounds = cumulative_split_bounds(tuple(weights))
    assert len(bounds) == len(weights) - 1
    prev = 0.0
    for b in bounds:
        assert prev < b < 1.0 + 1e-12
        prev = b


@settings(max_examples=200, deadline=None)
@given(
    seq=st.lists(WORDS, min_size=1, max_size=10),
    a=WORDS,
    b=WORDS,
)
def test_merge_seq_preserves_concatenation(seq, a, b):
    """One BPE merge step never loses or invents characters -- the
    invariant that makes encode/decode lossless."""
    merged = bpe._merge_seq(tuple(seq), (a, b))
    assert "".join(merged) == "".join(seq)


@settings(max_examples=100, deadline=None)
@given(
    corpus=st.lists(WORDS, min_size=1, max_size=20),
    probe=WORDS,
    n_merges=st.integers(min_value=0, max_value=30),
)
def test_encode_word_roundtrips_for_any_word_and_training(corpus, probe, n_merges):
    """Rank-priority encoding reconstructs ANY word under ANY learned
    merge table (including words never seen in training): concatenated
    tokens equal word + the end-of-word sentinel."""
    counts = {}
    for w in corpus:
        counts[w] = counts.get(w, 0) + 1
    seqs = {tuple(w) + (bpe.EOW,): n for w, n in counts.items()}
    merges = []
    for _ in range(n_merges):
        pc = bpe._pair_counts(seqs)
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        nxt = {}
        for s, n in seqs.items():
            m = bpe._merge_seq(s, best)
            nxt[m] = nxt.get(m, 0) + n
        seqs = nxt
    ranks = {p: i for i, p in enumerate(merges)}
    out = bpe._encode_word(probe, ranks)
    assert "".join(out) == probe + bpe.EOW
