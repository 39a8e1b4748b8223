"""Skew-mitigation operators: salted aggregation and salted joins.

Hot keys are the classic 100-TB failure mode: one reducer gets a whole
key's rows while the rest idle.  Spark has a RUNTIME mitigation -- AQE
skew-join splitting (``spark.sql.adaptive.skewJoin.enabled``, on by
default) -- and these operators are the DECLARATIVE one.  When to use
which:

* **AQE covers**: sort-merge / shuffled-hash JOIN skew.  At runtime AQE
  reads the shuffle's map statistics, detects reduce partitions larger
  than ``skewedPartitionFactor x median`` (and above
  ``skewedPartitionThresholdInBytes``), splits them, and duplicates the
  matching partition on the other side -- the final plan shows
  ``SortMergeJoin(skew=true)``.  Zero code, exact results: prefer it for
  plain joins (``tests/test_asof_skew.py`` proves result-equivalence
  with :func:`salted_join` on a 90%-hot-key fixture).
* **AQE cannot cover** (use these operators):
  - first-stage AGGREGATION fan-in: a hot groupBy key is one reduce
    group -- unsplittable at runtime because correctness needs all rows
    of a key in one task.  :func:`salted_group_count_sum` plans the
    two-phase shape instead (partial per (key, salt), then tiny final).
  - WINDOW functions over a hot partition key: same single-task
    constraint; ``asof.asof_join(n_salts=...)`` sub-partitions the
    carry-forward window declaratively.
  - deterministic/planned fan-out: AQE's split depends on runtime byte
    statistics (can vary run to run, and stays off below its size
    thresholds); a planned ``n_salts`` is stable across runs -- what you
    want for regression-benchmarked pipelines and exactly-once sinks.
  - joins whose skewed side doesn't sit DIRECTLY on its shuffle:
    OptimizeSkewedJoin pattern-matches ``SMJ(Sort(Shuffle),
    Sort(Shuffle)))`` -- an operator between them (e.g. the
    HashAggregate of a ``distinct()`` dim, measured in the test) makes
    AQE silently skip the split while the UI still shows a plain SMJ.

Results are bit-identical to the unsalted forms -- the salt only changes
the shuffle distribution -- so every salted operator shares its oracle with
the plain SQL equivalent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(deterministic_from: Column, n_salts: int) -> Column:
    """Deterministic per-row salt in [0, n_salts): a hash of a non-key
    column.  Deterministic (vs rand()) so retried/speculated tasks produce
    identical partitions -- required for exactly-once sinks."""
    return F.pmod(F.xxhash64(deterministic_from), F.lit(n_salts)).cast("int")


def salted_group_count_sum(
    df: DataFrame,
    key: str | list[str],
    value: str,
    salt_from: str,
    n_salts: int = 8,
) -> DataFrame:
    """Two-phase skew-proof aggregation: count(*) and sum(value) per key.

    Phase 1 shuffles on (key, salt) -- a hot key fans out over ``n_salts``
    reducers; phase 2 re-aggregates the ``n_salts`` partials per key (tiny).
    Identical results to a direct groupBy(key); the only difference is the
    shuffle histogram.
    """
    keys = [key] if isinstance(key, str) else list(key)
    phase1 = (
        df.withColumn("_salt", _salt(F.col(salt_from), n_salts))
        .groupBy(*keys, "_salt")
        .agg(
            F.count(F.lit(1)).alias("_cnt"),
            F.sum(value).alias("_sum"),
        )
    )
    return phase1.groupBy(*keys).agg(
        F.sum("_cnt").alias("n_rows"),
        F.round(F.sum("_sum"), 2).alias("sum_value"),
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt_from: str,
    n_salts: int = 8,
) -> DataFrame:
    """Inner equi-join where the left side's hot keys are salted and the
    right side is replicated ``n_salts`` times.

    Left rows get ``salt = hash(salt_from) % n``; right rows explode to all
    n salt values; the join key becomes (on, salt).  Hot left keys spread
    over n reducers at the cost of an n-fold right-side replication --
    appropriate when right is small-ish but above the broadcast threshold.
    """
    salts = F.array(*[F.lit(i) for i in range(n_salts)])
    lsalted = left.withColumn("_salt", _salt(F.col(salt_from), n_salts))
    rsalted = right.withColumn("_salt", F.explode(salts))
    return lsalted.join(rsalted, [on, "_salt"]).drop("_salt")
