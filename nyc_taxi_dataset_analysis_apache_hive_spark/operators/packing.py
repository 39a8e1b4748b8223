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

from pyspark.sql import DataFrame
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
    # NULL text / NULL counts pack as 0-token docs (still atomic rows);
    # greatest() also guards legacy sizeOfNull=-1 semantics, which would
    # otherwise corrupt every later offset in the shard.
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
