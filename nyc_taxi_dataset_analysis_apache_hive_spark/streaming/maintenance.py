"""Continuous derived-state maintenance: fold every micro-batch into the
persisted HLL rollup (operators/sketches.py) as it streams in.

The batch pattern (operators/incremental.py) made each ingest
O(batch + kilobytes of state); here the same fold runs inside
``foreachBatch``, so the OLAP sketch table trails the stream by one
trigger and answering "distinct users this week" never scans raw events.

Exactly-once state from an at-least-once hook: ``foreachBatch`` can
re-run a batch after a failure, so each fold writes its output to a
version directory keyed by the micro-batch id (``v=<batch_id>``) and
reads its INPUT state from the newest version strictly below its own id.
A replay of batch N therefore rebuilds v=N from exactly the same (state,
input) pair and overwrites it byte-for-byte -- idempotent, no
double-counting -- which is the same ledger trick a lakehouse commit log
uses, in plain parquet directories.

The ledger walk and the version prune go through the Hadoop FileSystem
API (``sources.fs``), so ``state_path`` may be any URI the session's
Hadoop configuration resolves -- ``hdfs://``, ``s3a://``, ``file://``,
or a bare local path -- matching where a long-running cluster stream
actually keeps its state.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from ..operators import sketches
from ..operators.incremental import merge_hll_rollup
from ..sources import fs as hfs

_V_RE = re.compile(r"^v=(\d+)$")


def _vdir(state_path: str, v: int) -> str:
    return f"{state_path.rstrip('/')}/v={v}"


def _versions(spark: SparkSession, state_path: str) -> list[int]:
    """Committed ledger versions, via the Hadoop FileSystem API -- so the
    ledger can live on ``hdfs://``/``s3a://``/any configured scheme, not
    just a driver-local POSIX path.  One LIST call."""
    out = []
    for name in hfs.child_dir_names(spark, state_path):
        m = _V_RE.match(name)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def read_sketch_state(
    spark: SparkSession, state_path: str, before: int | None = None
) -> DataFrame | None:
    """The newest persisted rollup (optionally only versions < ``before``,
    which is what a replaying fold must see).  None before the first
    commit."""
    vs = [
        v
        for v in _versions(spark, state_path)
        if before is None or v < before
    ]
    if not vs:
        return None
    return spark.read.parquet(_vdir(state_path, vs[-1]))


def fold_batch_into_hll(
    batch_df: DataFrame,
    batch_id: int,
    state_path: str,
    time_col: str = "ts",
    key_col: str = "user_id",
    grain: str = "day",
    keep_versions: int = 3,
) -> None:
    """One maintenance step: delta-rollup the micro-batch, merge it with
    the pre-batch state, commit to ``v=<batch_id>``.  Safe to re-run for
    the same batch id (reads only versions below itself, overwrite write).
    Old versions beyond ``keep_versions`` are pruned -- they exist only to
    serve replays of recent batches.

    Safety invariants (the exactly-once property depends on both):

    * ``keep_versions >= 2`` -- v=batch_id-1 is the input a replay of this
      very batch must re-read, so it may never be pruned; enforced, not
      advisory.
    * A non-initial batch whose predecessor state is MISSING while the
      ledger still holds versions raises instead of silently committing
      the batch delta alone -- that case means a replay reached past the
      pruned window and "merging with empty state" would wipe the whole
      accumulated rollup."""
    if keep_versions < 2:
        raise ValueError(
            f"keep_versions={keep_versions} < 2: v=<batch_id-1> must "
            "survive pruning or a replay of the newest batch rebuilds "
            "its state from nothing"
        )
    spark = batch_df.sparkSession
    delta = sketches.sketch_rollup(batch_df, time_col, key_col, grain)
    prev = read_sketch_state(spark, state_path, before=batch_id)
    ledger = _versions(spark, state_path)
    # "no predecessor in the ledger" has two very different causes:
    #   * batch_id == min(ledger): this batch IS the ledger's floor -- its
    #     own earlier commit is the only thing retained.  A replay rebuilds
    #     v=batch_id from the delta alone, exactly as the original run did
    #     (maintenance attached mid-stream, or checkpoint numbering that
    #     does not start at 0).  Legitimate; proceed.
    #   * min(ledger) > batch_id: the ledger only holds NEWER versions --
    #     this batch's predecessor (and its own prior commit, if any) were
    #     pruned, so rebuilding from the delta alone would silently re-base
    #     the accumulated rollup.  Refuse.
    # (prev is None already implies min(ledger) >= batch_id, so the two
    # cases are exhaustive.)
    if prev is None and batch_id > 0 and ledger and min(ledger) != batch_id:
        raise RuntimeError(
            f"sketch-state ledger at {state_path} has versions "
            f"{ledger} but none below replaying "
            f"batch_id={batch_id}: the predecessor state was pruned; "
            "raise keep_versions (>= max replay depth) instead of "
            "silently re-basing the rollup on one batch"
        )
    merged = delta if prev is None else merge_hll_rollup(prev, delta)
    merged.write.mode("overwrite").parquet(_vdir(state_path, batch_id))
    for v in _versions(spark, state_path)[:-keep_versions]:
        # belt-and-braces: whatever the list slicing says, the direct
        # predecessor (and anything newer) is never pruned
        if v < batch_id - 1:
            hfs.delete_recursive(spark, _vdir(state_path, v))


def hll_maintenance_stream(
    events: DataFrame,
    state_path: str,
    checkpoint: str,
    time_col: str = "ts",
    key_col: str = "user_id",
    grain: str = "day",
):
    """writeStream wiring for :func:`fold_batch_into_hll`: the returned
    ``DataStreamWriter`` just needs ``.trigger(...).start()``."""
    return (
        events.writeStream.foreachBatch(
            lambda df, bid: fold_batch_into_hll(
                df, bid, state_path, time_col, key_col, grain
            )
        )
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
