"""Sequence packing: assign documents to fixed-token-budget training bins.

The last batch stage of an LLM data pipeline: concatenate documents into
training sequences without splitting a document across bins.  Greedy
first-fit-by-order packing is inherently a stateful scan (the running
budget resets when a bin closes), which plain window cumsums cannot
express -- so this is one of the few sanctioned Python-path operators:
``applyInPandas`` over hash shards (SURVEY §7.0's rule: built-ins first,
Arrow-batched Pandas only where semantics demand it).

Scale design: documents shard by a portable md5 hash of the id
(deterministic across reruns/engines/partitionings, same construction as
sampling.hash_split), each shard packs independently in one Arrow batch,
and the output keys bins by (shard, bin_in_shard) so no global coordination
or driver-side state exists.  Cross-shard packing efficiency loss is the
usual trade: with budget B and mean doc length L, expected waste per bin is
O(L/B) regardless of shard count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from ..functions.text import token_count_ws


def _shard_col(id_col: str, n_shards: int):
    """Portable deterministic shard: md5-uniform of the id, mod n_shards
    (same hash family as sampling.hash_split -- NOT partitioning-dependent
    engine RNG)."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("pack-v1:"), F.col(id_col).cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % n_shards
    ).cast("int")


def pack_sequences(
    docs: DataFrame,
    budget: int,
    n_shards: int = 64,
    id_col: str = "doc_id",
    token_col: str | None = None,
) -> DataFrame:
    """Greedy first-fit packing of documents into token-budget bins.

    Returns (id_col, n_tokens, shard, bin_id, offset):

    * ``shard``   -- md5-hash shard the document packs within;
    * ``bin_id``  -- bin index within the shard (greedy, ascending id_col
      order: a bin closes when the next document would overflow
      ``budget``);
    * ``offset``  -- token offset of this document inside its bin.

    Documents longer than ``budget`` get a bin of their own (they are the
    caller's truncation problem; the operator never splits or drops).
    ``token_col`` supplies a precomputed token count; default counts
    whitespace tokens JVM-side before the Python stage, so the Arrow batch
    carries (id, n_tokens) only -- never the text.
    """
    if budget < 1:
        # fail fast: a zero/negative budget would silently pack every
        # nonzero-token document into its own bin (the used>0 guard always
        # fires) -- same validation posture as asof.range_join(bin_seconds)
        raise ValueError(f"budget must be >= 1, got {budget}")
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    if token_col is None:
        raw_n = token_count_ws("text")
    else:
        raw_n = F.col(token_col).cast("long")
    # A caller-supplied token_col can carry NULLs or negatives -- both
    # pack as 0-token docs (still atomic rows) so they cannot corrupt
    # later offsets in the shard.  (token_count_ws itself needs no
    # guard: since r9 it coalesces NULL text to 0 internally.)
    sized = docs.select(
        F.col(id_col),
        F.greatest(F.coalesce(raw_n, F.lit(0)), F.lit(0)).alias("n_tokens"),
    ).withColumn("shard", _shard_col(id_col, n_shards))

    # output id column keeps the input's type (ids are not always longs)
    id_field = StructField(id_col, docs.schema[id_col].dataType)
    out_schema = StructType(
        [
            id_field,
            StructField("n_tokens", LongType()),
            StructField("shard", IntegerType()),
            StructField("bin_id", LongType()),
            StructField("offset", LongType()),
        ]
    )

    def pack(pdf):
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        bins, offsets = [], []
        bin_id, used = 0, 0
        for n in pdf["n_tokens"]:
            n = int(n)
            if used > 0 and used + n > budget:
                bin_id += 1
                used = 0
            bins.append(bin_id)
            offsets.append(used)
            used += n
        pdf["bin_id"] = bins
        pdf["offset"] = offsets
        return pdf[[id_col, "n_tokens", "shard", "bin_id", "offset"]]

    return sized.groupBy("shard").applyInPandas(pack, schema=out_schema)


def packing_stats(packed: DataFrame, budget: int) -> DataFrame:
    """Utilization report over a :func:`pack_sequences` result: one global
    row (n_bins, n_docs, total_tokens, fill_rate, p50_fill, p90_fill,
    oversize_bins).

    The number a pipeline owner actually tunes ``budget`` with: fill_rate =
    packed tokens / (bins x budget); ``oversize_bins`` counts
    single-document bins exceeding the budget (the caller's truncation
    debt).  Two hash-aggregates -- per-(shard, bin) then global -- both
    map-side combinable; the quantiles run on the per-bin frame
    (O(bins), not O(docs)).
    """
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    per_bin = packed.groupBy("shard", "bin_id").agg(
        F.sum("n_tokens").alias("bin_tokens"),
        F.count(F.lit(1)).alias("bin_docs"),
    )
    fill = F.col("bin_tokens") / F.lit(float(budget))
    return per_bin.agg(
        F.count(F.lit(1)).alias("n_bins"),
        F.sum("bin_docs").alias("n_docs"),
        F.sum("bin_tokens").alias("total_tokens"),
        F.round(
            F.sum("bin_tokens") / (F.count(F.lit(1)) * budget), 4
        ).alias("fill_rate"),
        F.round(F.expr(f"percentile_approx(bin_tokens / {budget}.0D, 0.5)"), 4).alias(
            "p50_fill"
        ),
        F.round(F.expr(f"percentile_approx(bin_tokens / {budget}.0D, 0.9)"), 4).alias(
            "p90_fill"
        ),
        F.sum((fill > 1.0).cast("long")).alias("oversize_bins"),
    )


def packing_audit(
    docs: DataFrame,
    budget: int,
    n_shards: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """One-row self-validation of :func:`pack_sequences`, shaped for a
    driver oracle (the bpe_roundtrip_audit pattern): a correct packer
    yields ``n_pack_docs == count(*)`` and every violation counter 0, so
    the oracle side needs no greedy replay -- only the corpus count and
    literal zeros.  The greedy fold itself is the one Python stage; every
    invariant below is checked with JVM-side windows/aggregates over its
    output:

    * ``n_pack_token_drift`` -- |sum of packed n_tokens - sum of the same
      JVM token count over the input|: 0 unless the Arrow boundary
      dropped/duplicated/resized a document.
    * ``n_pack_capacity_viol`` -- multi-document bins over ``budget``
      (single-doc bins MAY exceed it: the documented oversize rule).
    * ``n_pack_offset_viol`` -- docs whose ``offset`` differs from the
      running sum of preceding docs in their bin (ascending ``id_col``).
    * ``n_pack_greedy_viol`` -- bins whose first document would have fit
      in the previous bin (greedy first-fit never opens a bin early;
      0-token docs always fit, so every non-first bin must violate
      ``prev_bin_tokens + first_tokens <= budget``).
    * ``n_pack_bin_gap_viol`` -- shards whose bin ids are not contiguous
      from 0.

    Plan shape: ONE pass through the packed output (the windows and
    aggregates stack on a single lineage, so ``applyInPandas`` executes
    once), aggregated doc -> bin -> shard -> global, cross-joined with
    the 1-row input-side token total (J1 scalar shape)."""
    packed = pack_sequences(docs, budget, n_shards, id_col)
    in_total = docs.select(
        F.sum(token_count_ws("text")).alias("in_tokens")
    )
    w_prefix = (
        Window.partitionBy("shard", "bin_id")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    per_doc = packed.withColumn(
        "_off_viol",
        (
            F.col("offset")
            != F.coalesce(F.sum("n_tokens").over(w_prefix), F.lit(0))
        ).cast("long"),
    )
    per_bin = per_doc.groupBy("shard", "bin_id").agg(
        F.sum("n_tokens").alias("bin_tokens"),
        F.count(F.lit(1)).alias("bin_docs"),
        F.min_by("n_tokens", F.col(id_col)).alias("first_tokens"),
        F.sum("_off_viol").alias("off_viols"),
    )
    w_shard = Window.partitionBy("shard").orderBy("bin_id")
    per_bin = per_bin.withColumn(
        "prev_tokens", F.lag("bin_tokens").over(w_shard)
    )
    per_shard = per_bin.groupBy("shard").agg(
        F.sum("bin_docs").alias("docs"),
        F.sum("bin_tokens").alias("tokens"),
        F.sum("off_viols").alias("off_viols"),
        F.sum(
            (
                (F.col("bin_docs") > 1) & (F.col("bin_tokens") > budget)
            ).cast("long")
        ).alias("cap_viols"),
        F.sum(
            (
                F.col("prev_tokens").isNotNull()
                & (F.col("prev_tokens") + F.col("first_tokens") <= budget)
            ).cast("long")
        ).alias("greedy_viols"),
        F.count(F.lit(1)).alias("n_bins"),
        F.min("bin_id").alias("min_bin"),
        F.max("bin_id").alias("max_bin"),
    )
    audit = per_shard.agg(
        F.sum("docs").alias("n_pack_docs"),
        F.sum("tokens").alias("out_tokens"),
        F.sum("off_viols").alias("n_pack_offset_viol"),
        F.sum("cap_viols").alias("n_pack_capacity_viol"),
        F.sum("greedy_viols").alias("n_pack_greedy_viol"),
        F.sum(
            (
                (F.col("min_bin") != 0)
                | (F.col("max_bin") != F.col("n_bins") - 1)
            ).cast("long")
        ).alias("n_pack_bin_gap_viol"),
    )
    return audit.crossJoin(in_total).select(
        F.coalesce("n_pack_docs", F.lit(0)).alias("n_pack_docs"),
        F.abs(
            F.coalesce("out_tokens", F.lit(0))
            - F.coalesce("in_tokens", F.lit(0))
        ).alias("n_pack_token_drift"),
        F.coalesce("n_pack_capacity_viol", F.lit(0)).alias(
            "n_pack_capacity_viol"
        ),
        F.coalesce("n_pack_offset_viol", F.lit(0)).alias(
            "n_pack_offset_viol"
        ),
        F.coalesce("n_pack_greedy_viol", F.lit(0)).alias(
            "n_pack_greedy_viol"
        ),
        F.coalesce("n_pack_bin_gap_viol", F.lit(0)).alias(
            "n_pack_bin_gap_viol"
        ),
    )
