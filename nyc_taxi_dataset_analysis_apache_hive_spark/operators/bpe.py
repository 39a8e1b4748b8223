"""BPE tokenizer training over a corpus (byte-pair encoding, Sennrich et
al. 2016) -- the scale-correct split of work:

* **Distributed**: ONE tokenize+count pass over the corpus
  (:func:`word_counts` -- explode + hash agg, the same shuffle shape as
  ``tv1_text_stats``).  At 100 TB this is the only full scan; its output
  is the compressed training representation (unique words × counts --
  bounded by vocabulary, not corpus size; a few hundred MB at web scale
  after the ``min_count`` floor).
* **Driver-local**: the merge loop (:func:`bpe_train`) runs on that count
  table, exactly how production tokenizer trainers work (corpus-parallel
  counting, local training on the frequency dictionary).  Training cost
  depends on unique-word count only, never on corpus rows.
* **Distributed again**: applying the learned merges
  (:func:`encode_tokens`) is an Arrow-batched pandas UDF over documents
  with the (tiny) merge list broadcast in the closure -- embarrassingly
  parallel, no shuffle.

Determinism: merge selection is (max pair count, lexicographically
smallest pair) so training is reproducible across runs and partitionings.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.text import tokens

#: End-of-word sentinel (the classic </w>): keeps merges from crossing
#: word boundaries and makes decoding unambiguous.
EOW = "</w>"


def word_counts(
    docs: DataFrame, text_col: str = "text", min_count: int = 1
) -> DataFrame:
    """(word, n) distinct-word frequencies -- the one distributed pass.
    ``min_count`` floors away hapax noise, which is also what bounds the
    driver-side table at web scale."""
    wc = (
        docs.select(F.explode(tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    if min_count > 1:
        wc = wc.filter(F.col("n") >= min_count)
    return wc


def top_words(wc: DataFrame, max_words: int) -> DataFrame:
    """Deterministic top-N of a :func:`word_counts` table by (count desc,
    word asc) -- the max-vocab cap that bounds the driver-side training
    table when ``min_count`` alone cannot (web-scale text's distinct-"word"
    long tail of typos/URLs/unicode junk).  TakeOrdered plan: no full
    sort, the N survivors stream to one task."""
    return wc.orderBy(F.col("n").desc(), F.col("word").asc()).limit(max_words)


def _pair_counts(seqs: dict[tuple[str, ...], int]) -> Counter:
    pc: Counter = Counter()
    for seq, n in seqs.items():
        for i in range(len(seq) - 1):
            pc[(seq[i], seq[i + 1])] += n
    return pc


def _merge_seq(
    seq: tuple[str, ...], pair: tuple[str, str]
) -> tuple[str, ...]:
    out: list[str] = []
    i = 0
    while i < len(seq):
        if i + 1 < len(seq) and (seq[i], seq[i + 1]) == pair:
            out.append(seq[i] + seq[i + 1])
            i += 2
        else:
            out.append(seq[i])
            i += 1
    return tuple(out)


def bpe_train(
    wc: DataFrame, n_merges: int = 200, max_words: int = 1_000_000
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from a :func:`word_counts` table.

    Driver-local by design (see module docstring); the input here is the
    compressed frequency table, not the corpus.  Returns merges in
    application order.

    ``max_words`` guards the one driver-side collect: the distinct-word
    table of web-scale text can reach 10^8 rows (typos, URLs, unicode
    junk) and OOM the driver, so the size is checked BEFORE collecting
    and training raises with the two bounded fix paths -- floor with
    ``word_counts(min_count=...)`` or cap with :func:`top_words`."""
    n_words = wc.count()
    if n_words > max_words:
        raise ValueError(
            f"bpe_train: word-count table has {n_words} rows > "
            f"max_words={max_words}; bound it before training with "
            "word_counts(min_count=...) or top_words(wc, max_words) "
            "(or raise max_words if the driver really has the memory)"
        )
    seqs: dict[tuple[str, ...], int] = {
        tuple(r["word"]) + (EOW,): r["n"] for r in wc.collect()
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pc = _pair_counts(seqs)
        if not pc:
            break
        # deterministic: highest count, ties to the lexicographically
        # smallest pair
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        new_seqs: dict[tuple[str, ...], int] = {}
        for seq, n in seqs.items():
            m = _merge_seq(seq, best)
            new_seqs[m] = new_seqs.get(m, 0) + n
        seqs = new_seqs
    return merges


def _encode_word(
    word: str, ranks: dict[tuple[str, str], int]
) -> list[str]:
    seq = list(word) + [EOW]
    while len(seq) > 1:
        pairs = [
            (ranks[(a, b)], i)
            for i, (a, b) in enumerate(zip(seq, seq[1:]))
            if (a, b) in ranks
        ]
        if not pairs:
            break
        rank, i = min(pairs)
        seq[i : i + 2] = [seq[i] + seq[i + 1]]
    return seq


def encode_tokens(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Documents + an ``array<string>`` column of learned-BPE tokens.

    Arrow-batched ``pandas_udf``; the merge table rides the closure as a
    rank dict (tiny -- ``n_merges`` entries), so encoding is map-only and
    shuffles nothing.  Python is justified here: the greedy rank-priority
    merge loop is data-dependent iteration that neither built-in
    higher-order functions nor SQL express."""
    ranks = {pair: i for i, pair in enumerate(merges)}
    tokenize = tokens(text_col)

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _enc(words: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}

        def enc_doc(ws):
            out: list[str] = []
            for w in ws if ws is not None else []:
                if w not in cache:
                    cache[w] = _encode_word(w, ranks)
                out.extend(cache[w])
            return out

        return words.map(enc_doc)

    return docs.withColumn(out_col, _enc(tokenize))


def bpe_roundtrip_audit(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 32,
    max_words: int = 100_000,
) -> DataFrame:
    """One-row self-validation of the whole train->encode path, shaped
    for a driver oracle: ``(n_bpe_docs, n_bpe_roundtrip,
    n_bpe_token_sane)`` where a correct tokenizer yields three equal
    counts (every doc passes both checks), so the oracle side is just
    ``count(*)`` over the corpus -- the in-plane gate pattern of
    a10_distinct_counts, applied to an operator SQL cannot express.

    * **roundtrip**: BPE merges only ever concatenate adjacent units of
      one word, so concatenating a doc's encoded tokens must reproduce
      its tokenized words verbatim (each word ``</w>``-terminated).  Any
      mangling in the merge table, the rank-priority encode loop, or the
      Arrow batch plumbing breaks the equality.
    * **token_sane**: per doc, ``n_words <= n_bpe_tokens <=
      sum(len(word) + 1)`` -- encoding never drops a word and never
      splits beyond characters + the end-of-word sentinel.

    Both checks are JVM-side expressions over the encoded array; the only
    Python in the plan is the encode UDF under audit."""
    wc = word_counts(docs, text_col)
    merges = bpe_train(
        top_words(wc, max_words), n_merges=n_merges, max_words=max_words
    )
    enc = encode_tokens(docs, merges, text_col)
    # NULL text must audit like an empty doc (0 <= 0 <= 0), not poison
    # the bounds comparison into NULL
    toks = F.coalesce(
        tokens(text_col), F.array().cast("array<string>")
    )
    expected = F.concat_ws(
        "", F.transform(toks, lambda w: F.concat(w, F.lit(EOW)))
    )
    joined = F.concat_ws("", F.col("bpe_tokens"))
    n_words = F.size(toks)
    n_bpe = F.size(F.col("bpe_tokens"))
    max_units = F.aggregate(
        toks, F.lit(0), lambda acc, w: acc + F.length(w) + F.lit(1)
    )
    return enc.agg(
        F.count(F.lit(1)).alias("n_bpe_docs"),
        F.sum((joined == expected).cast("long")).alias("n_bpe_roundtrip"),
        F.sum(
            ((n_bpe >= n_words) & (n_bpe <= max_units)).cast("long")
        ).alias("n_bpe_token_sane"),
    )
