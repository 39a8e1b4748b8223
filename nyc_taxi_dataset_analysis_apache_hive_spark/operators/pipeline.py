"""End-to-end corpus curation: the composition a 100-TB training-data run
actually executes, built from this package's stages.

    profile (1 scan)  ->  hygiene filters (C4/Gopher rules + PII counts)
    ->  near-dup keep-list (MinHash LSH -> connected components)
    ->  deterministic train/val/test split (md5 hash)

``curate_corpus`` returns ONE row per input document with every feature,
the per-rule drop flags, the dedup keeper decision, and the split -- the
audit table a data curator filters on (``WHERE keep``) and reports from.
Materializing decisions instead of dropping rows is deliberate: at scale
the audit table is the artifact reviews and ablations need, and the final
filter is one cheap predicate over it.

Plan shape: the feature stages are narrow single-scan projections; the
only shuffles are the dedup pipeline's (banded LSH equi-joins -- never
all-pairs) and the final doc_id joins, all AQE-managed.  Nothing touches
the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import dedup, sampling, textops


#: default hygiene thresholds -- the public C4/Gopher-style screens, all
#: overridable per call.  A document is kept when EVERY bound holds.
DEFAULT_RULES: dict[str, float] = {
    "min_tokens": 5,
    "max_dup_line_frac": 0.3,
    "min_quality_score": 0.2,
    "max_pii_hits": 10,
}


def curate_corpus(
    docs: DataFrame,
    rules: dict[str, float] | None = None,
    jaccard_threshold: float = 0.5,
    split_weights: tuple[float, ...] = (0.98, 0.01, 0.01),
) -> DataFrame:
    """Per-document curation decisions over the whole corpus.

    Returns (doc_id, n_tokens_ws, quality_score, lang_pred, dup_line_frac,
    n_pii_hits, cluster_id, is_canonical, drop_short, drop_repetitive,
    drop_low_quality, drop_pii_heavy, keep, split_id): every signal that
    produced the decision plus the decision itself.

    ``keep`` = passes every hygiene rule AND is its near-dup cluster's
    canonical document (min doc_id; singletons keep themselves).  Rules
    come from :data:`DEFAULT_RULES` overridden by ``rules``.
    """
    r = {**DEFAULT_RULES, **(rules or {})}

    # text_profile carries lang_true for evaluation corpora; raw corpora
    # often have no lang column, so synthesize a NULL one for that stage
    with_lang = (
        docs
        if "lang" in docs.columns
        else docs.withColumn("lang", F.lit(None).cast("string"))
    )
    profile = textops.text_profile(with_lang).select(
        "doc_id", "n_tokens_ws", "quality_score", "lang_pred"
    )
    rep = textops.repetition_features(docs).select("doc_id", "dup_line_frac")
    pii = textops.redact_pii(docs).select(
        "doc_id",
        (F.col("n_email") + F.col("n_ip") + F.col("n_phone")).alias("n_pii_hits"),
    )
    pairs = dedup.minhash_lsh_pairs(docs, jaccard_threshold=jaccard_threshold)
    keepers = dedup.dedup_keep_list(docs, pairs).select(
        "doc_id", "cluster_id", F.col("keep").alias("is_canonical")
    )
    split = sampling.hash_split(
        docs.select("doc_id"), "doc_id", weights=split_weights
    )

    out = (
        profile.join(rep, "doc_id")
        .join(pii, "doc_id")
        .join(keepers, "doc_id")
        .join(split, "doc_id")
    )
    drop_short = F.col("n_tokens_ws") < r["min_tokens"]
    drop_rep = F.col("dup_line_frac") > r["max_dup_line_frac"]
    drop_quality = F.col("quality_score") < r["min_quality_score"]
    drop_pii = F.col("n_pii_hits") > r["max_pii_hits"]
    return out.select(
        "*",
        drop_short.alias("drop_short"),
        drop_rep.alias("drop_repetitive"),
        drop_quality.alias("drop_low_quality"),
        drop_pii.alias("drop_pii_heavy"),
        (
            ~drop_short
            & ~drop_rep
            & ~drop_quality
            & ~drop_pii
            & F.col("is_canonical")
        ).alias("keep"),
    )


def curation_report(curated: DataFrame) -> DataFrame:
    """One-row funnel over a :func:`curate_corpus` result: how many
    documents each rule removed and what survives per split.  The numbers a
    curation run is judged by."""
    return curated.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("drop_short").cast("long")).alias("n_short"),
        F.sum(F.col("drop_repetitive").cast("long")).alias("n_repetitive"),
        F.sum(F.col("drop_low_quality").cast("long")).alias("n_low_quality"),
        F.sum(F.col("drop_pii_heavy").cast("long")).alias("n_pii_heavy"),
        F.sum((~F.col("is_canonical")).cast("long")).alias("n_near_dups"),
        F.sum(F.col("keep").cast("long")).alias("n_kept"),
        F.sum((F.col("keep") & (F.col("split_id") == 0)).cast("long")).alias(
            "n_kept_train"
        ),
        F.sum((F.col("keep") & (F.col("split_id") == 1)).cast("long")).alias(
            "n_kept_val"
        ),
        F.sum((F.col("keep") & (F.col("split_id") == 2)).cast("long")).alias(
            "n_kept_test"
        ),
    )
