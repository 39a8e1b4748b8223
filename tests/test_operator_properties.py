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


@settings(max_examples=200, deadline=None)
@given(
    ns=st.lists(st.integers(min_value=1, max_value=100000), min_size=2, max_size=8),
    alpha=st.floats(min_value=0.0, max_value=2.0, allow_nan=False),
    target=st.integers(min_value=1, max_value=1000000),
)
def test_temperature_weights_conserve_expected_output_size(ns, alpha, target):
    """temperature_mix's weight formula (python replica of the exact
    expression both engines run): quantized weights sum to 1 from below
    within K 1e-6 buckets, so the EXPECTED output size
    sum_d n_d * ratio_d = target * sum_d wq_d can undershoot ``target``
    by at most K*1e-6*target and never overshoots materially -- the
    conservation law that makes the temp leg's target_rows parameter
    honest at any domain-size skew."""
    import math

    pows = [float(n) ** alpha for n in ns]
    psum = sum(pows)
    wqs = [math.floor(p / psum * 1_000_000.0 + 1e-9) / 1_000_000.0 for p in pows]
    assert all(0.0 <= w <= 1.0 + 1e-9 for w in wqs)
    total_w = sum(wqs)
    k = len(ns)
    assert 1.0 - k * 1e-6 - 1e-9 <= total_w <= 1.0 + k * 1e-9
    expected = target * total_w
    assert expected <= target * (1.0 + 1e-7)
    assert expected >= target * (1.0 - k * 1e-6 - 1e-7)


@settings(max_examples=200, deadline=None)
@given(
    ns=st.lists(st.integers(min_value=1, max_value=100000), min_size=2, max_size=8),
)
def test_temperature_alpha_extremes(ns):
    """alpha=0 gives every domain the SAME quantized weight (uniform);
    alpha=1 gives weights proportional to size (natural shares)."""
    import math

    def wq(pows):
        psum = sum(pows)
        return [
            math.floor(p / psum * 1_000_000.0 + 1e-9) / 1_000_000.0
            for p in pows
        ]

    uniform = wq([float(n) ** 0.0 for n in ns])
    assert len(set(uniform)) == 1
    natural = wq([float(n) ** 1.0 for n in ns])
    total = float(sum(ns))
    for n, w in zip(ns, natural):
        assert abs(w - n / total) <= 1e-6 + 1e-9
