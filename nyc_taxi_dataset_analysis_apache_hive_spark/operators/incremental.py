"""Incremental ingest: fold a new batch into persisted derived state
without rescanning history.

At 100 TB the corpus is append-only and every full recompute is a
multi-hour scan, so each derived table must be maintainable from (old
state, new batch) alone:

* **Sketch rollups** (operators/sketches.py): HLL / theta / KLL states are
  mergeable by construction, so ``merge_*_rollup(existing, delta)`` is a
  tiny groupBy over two kilobyte-per-period tables -- the new batch is the
  only raw data ever scanned.  Merged state answers within the sketch's
  own error bounds of a from-scratch rebuild (equal outright while the
  sketches are still in exact/sparse mode; a one-shot sketch that has
  crossed into estimation mode may differ from a merge of exact halves by
  its normal error -- the tests gate both paths against exact truth, not
  against each other).
* **Dedup admission** (:func:`admit_batch`): the membership question "is
  this fingerprint already in the corpus" is a left-anti join of the SMALL
  batch against the fingerprint history.  The scale posture is the layout,
  not the operator: persist the history bucketed (``write_clean_table``'s
  ``bucketBy`` on the fingerprint) or fingerprint-sorted
  (operators/layout.py) so the join co-locates without shuffling history
  and parquet footer min/max prune the untouched files.  Spark's runtime
  bloom-filter join (``spark.sql.optimizer.runtime.bloomFilter.enabled``,
  default-on in Spark 4 -- session.py does not set it; the plan test
  asserts the default, tests/test_plans.py) additionally
  semi-join-reduces the probe side at runtime when the batch side is
  selective.

The pieces compose into :func:`ingest_batch`: one pass over the new batch
feeds admission AND every sketch rollup; history is touched only through
its (tiny) derived tables and the fingerprint anti-join.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def merge_hll_rollup(existing: DataFrame, delta: DataFrame) -> DataFrame:
    """Fold a new (period, n_rows, sketch) HLL rollup into the persisted
    one.  Periods present on both sides union their sketches losslessly
    (set union is associative); n_rows adds.  Cost: a groupBy over
    2×periods rows of kilobytes."""
    return (
        existing.unionByName(delta)
        .groupBy("period")
        .agg(
            F.sum("n_rows").alias("n_rows"),
            F.hll_union_agg(F.col("sketch"), F.lit(False)).alias("sketch"),
        )
    )


def merge_theta_rollup(
    existing: DataFrame, delta: DataFrame, lg_k: int = 12
) -> DataFrame:
    """Same maintenance for (part, n_rows, sketch) theta rollups: parts in
    both sides merge via ``theta_union_agg`` at the rollup's own lg_k."""
    return (
        existing.unionByName(delta)
        .groupBy("part")
        .agg(
            F.sum("n_rows").alias("n_rows"),
            F.theta_union_agg(F.col("sketch"), F.lit(lg_k)).alias("sketch"),
        )
    )


def merge_kll_rollup(existing: DataFrame, delta: DataFrame) -> DataFrame:
    """Same maintenance for (period, n_rows, sketch) KLL quantile rollups
    via ``kll_merge_agg_double``."""
    return (
        existing.unionByName(delta)
        .groupBy("period")
        .agg(
            F.sum("n_rows").alias("n_rows"),
            F.kll_merge_agg_double("sketch").alias("sketch"),
        )
    )


def admit_batch(
    history_fps: DataFrame,
    batch: DataFrame,
    fp_col: str = "fingerprint",
    order_col: str = "doc_id",
) -> DataFrame:
    """Rows of ``batch`` that are genuinely new: not already in
    ``history_fps`` (one ``fp_col`` column) and not duplicated within the
    batch itself (first-by-``order_col`` wins, deterministic --
    parameterized alongside ``fp_col`` so batches without a ``doc_id``
    column can name their own stable tiebreak).

    Plan shape: the within-batch dedup is a window over the SMALL batch;
    the history check is ONE left-anti join probing the batch against the
    fingerprint history.  History is never widened (one 32-byte hash
    column) and never shuffled when it is persisted bucketed/sorted on
    the fingerprint."""
    if order_col not in batch.columns:
        raise ValueError(
            f"admit_batch: order_col {order_col!r} not in batch columns "
            f"{batch.columns}; pass the batch's stable tiebreak column"
        )
    w_rank = F.row_number().over(
        Window.partitionBy(fp_col).orderBy(order_col)
    )
    batch_unique = (
        batch.withColumn("_rn", w_rank).filter(F.col("_rn") == 1).drop("_rn")
    )
    return batch_unique.join(
        history_fps.select(fp_col), on=fp_col, how="left_anti"
    )


def write_fingerprint_history(
    fps: DataFrame,
    path: str,
    fp_col: str = "fingerprint",
    n_files: int = 32,
    expected_ndv: int = 10_000_000,
    mode: str = "overwrite",
) -> None:
    """Persist the fingerprint history in the layout the admission
    anti-join wants: range-partitioned + sorted on the fingerprint, with
    a parquet BLOOM FILTER on the fingerprint column.

    Why both: fingerprints are uniform random hex, so an UNSORTED layout
    gives every row group min/max spanning the whole key range -- footer
    stats prune nothing.  Range-sorting makes each FILE cover a narrow
    hex slice (file-level pruning for a probe key); the bloom filter
    answers "fingerprint absent" at ROW-GROUP level without decoding
    pages for the probes that do land in a file's range.  At 100 TB the
    anti-join probe side is a small batch, so nearly every history file
    is skipped by range, and nearly every surviving row group by bloom.

    ``expected_ndv`` sizes the bloom bitset (parquet-mr's
    ``parquet.bloom.filter.expected.ndv``) -- set it to the rough
    history cardinality per file batch; too low inflates the false-
    positive rate, too high wastes footer bytes.
    """
    (
        fps.select(fp_col)
        .repartitionByRange(n_files, F.col(fp_col))
        .sortWithinPartitions(fp_col)
        .write.mode(mode)
        .option(f"parquet.bloom.filter.enabled#{fp_col}", "true")
        .option(
            f"parquet.bloom.filter.expected.ndv#{fp_col}", str(expected_ndv)
        )
        .parquet(path)
    )


class IngestResult(NamedTuple):
    accepted: DataFrame  # new, non-duplicate batch rows
    fingerprints: DataFrame  # updated fingerprint history
    hll_rollup: DataFrame | None  # updated per-period distinct state
    kll_rollup: DataFrame | None  # updated per-period quantile state


def ingest_batch(
    history_fps: DataFrame,
    batch: DataFrame,
    fp_col: str = "fingerprint",
    order_col: str = "doc_id",
    hll_state: DataFrame | None = None,
    kll_state: DataFrame | None = None,
    time_col: str = "ts",
    hll_key_col: str | None = None,
    kll_value_col: str | None = None,
    grain: str = "day",
) -> IngestResult:
    """One ingest step: admit the batch's new rows, extend the fingerprint
    history, and fold the accepted rows into any provided sketch states.
    Only the batch is scanned at raw granularity; history participates as
    (a) the one-column fingerprint table and (b) kilobyte sketch rows."""
    from . import sketches

    accepted = admit_batch(history_fps, batch, fp_col, order_col)
    new_fps = history_fps.unionByName(accepted.select(fp_col))

    hll_out = None
    if hll_state is not None and hll_key_col is not None:
        delta = sketches.sketch_rollup(accepted, time_col, hll_key_col, grain)
        hll_out = merge_hll_rollup(hll_state, delta)

    kll_out = None
    if kll_state is not None and kll_value_col is not None:
        delta = sketches.quantile_rollup(
            accepted, time_col, kll_value_col, grain
        )
        kll_out = merge_kll_rollup(kll_state, delta)

    return IngestResult(accepted, new_fps, hll_out, kll_out)


def admit_batch_neardup(
    history: DataFrame | None,
    batch: DataFrame,
    n_hashes: int = 16,
    n_bands: int = 4,
    shingle_n: int = 3,
    agreement_threshold: float = 0.5,
    text_col: str = "text",
    history_sigs: DataFrame | None = None,
    batch_sigs: DataFrame | None = None,
) -> DataFrame:
    """NEAR-duplicate admission: extend :func:`admit_batch`'s exact
    membership question to "is a near-copy of this document already in
    the corpus?", with history state that is SKETCH-sized.

    The history never stores text or shingle sets -- only each document's
    MinHash signature (n_hashes longs, ~128 B/doc at the defaults; in
    production persisted once per ingest and re-read per batch, the same
    posture as the fingerprint history).  Admission per batch:

    1. band-bucket the batch signatures and equi-join them against the
       history's band buckets (cross-corpus LSH: candidates only where a
       full band collides -- never all-pairs, never a scan of history
       text);
    2. for each candidate pair, the signature AGREEMENT fraction
       (matching components / n_hashes) -- the standard unbiased MinHash
       estimator of Jaccard similarity, an exact rational so both
       engines agree bit-for-bit;
    3. keep each batch document's best match (highest agreement, ties to
       the lowest history id) and admit documents whose best agreement
       is below ``agreement_threshold`` (or that had no collision).

    Returns one row per batch document:
    (doc_id, match_id, sig_agreement, admitted) -- match_id/agreement
    NULL when no band collided.  Verification here is sketch-only by
    design: a deployment wanting exact-Jaccard confirmation feeds the
    flagged (doc, match) pairs to dedup.ngram_jaccard verification,
    touching raw history text for ONLY those pairs.

    Pass ``history_sigs`` (a persisted minhash_signatures table) to skip
    re-deriving history signatures -- the production path: signatures
    are computed once at each document's OWN ingest and appended to the
    store, so steady-state admission reads history text never
    (equivalence of the two paths is pytest-gated).
    """
    from . import dedup

    if history_sigs is not None:
        h_sigs = history_sigs
    else:
        if history is None:
            raise ValueError(
                "admit_batch_neardup: pass history docs or history_sigs"
            )
        h_sigs = dedup.minhash_signatures(history, n_hashes, shingle_n)
    # batch_sigs: sharing hook (same contract as history_sigs) -- the
    # batch docs frame is still required for the report universe, which
    # must include zero-shingle documents absent from any signature table
    b_sigs = (
        batch_sigs
        if batch_sigs is not None
        else dedup.minhash_signatures(batch, n_hashes, shingle_n)
    )
    h_buckets = dedup.minhash_band_buckets(h_sigs, n_hashes, n_bands)
    b_buckets = dedup.minhash_band_buckets(b_sigs, n_hashes, n_bands)
    cands = (
        b_buckets.alias("b")
        .join(
            h_buckets.alias("h"),
            (F.col("b.band") == F.col("h.band"))
            & (F.col("b.bucket") == F.col("h.bucket")),
        )
        .select(
            F.col("b.doc_id").alias("doc_id"),
            F.col("h.doc_id").alias("match_id"),
        )
        .distinct()
    )
    agree_terms = None
    for i in range(n_hashes):
        t = F.when(
            F.col(f"bs.sig_{i}") == F.col(f"hs.sig_{i}"), 1
        ).otherwise(0)
        agree_terms = t if agree_terms is None else agree_terms + t
    scored = (
        cands.join(
            b_sigs.alias("bs"), cands.doc_id == F.col("bs.doc_id")
        )
        .join(h_sigs.alias("hs"), cands.match_id == F.col("hs.doc_id"))
        .select(
            cands.doc_id,
            cands.match_id,
            F.round(
                agree_terms.cast("double") / F.lit(float(n_hashes)), 6
            ).alias("sig_agreement"),
        )
    )
    # best match = highest agreement, ties to the LOWEST history id --
    # expressed as a min_by over (negated agreement, match_id) so the
    # tie-break never negates the id column itself: unary minus on a
    # string/UUID id would cast to double and yield NULL, silently
    # making the documented tie-break arbitrary
    best = scored.groupBy("doc_id").agg(
        F.min_by(
            F.struct(
                F.col("match_id"), F.col("sig_agreement")
            ),
            F.struct(
                (-F.col("sig_agreement")).alias("na"), F.col("match_id")
            ),
        ).alias("bm")
    )
    return (
        batch.select("doc_id")
        .join(best, on="doc_id", how="left")
        .select(
            "doc_id",
            F.col("bm.match_id").alias("match_id"),
            F.col("bm.sig_agreement").alias("sig_agreement"),
            F.coalesce(
                F.col("bm.sig_agreement") < F.lit(agreement_threshold),
                F.lit(True),
            ).alias("admitted"),
        )
    )
