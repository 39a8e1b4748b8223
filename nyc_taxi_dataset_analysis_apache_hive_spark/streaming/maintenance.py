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


def _floor_path(state_path: str) -> str:
    return f"{state_path.rstrip('/')}/_ledger_floor"


def _ledger_floor(spark: SparkSession, state_path: str) -> int | None:
    """The FIRST version ever committed into this state dir (persisted
    marker; survives pruning).  None for markerless dirs."""
    txt = hfs.read_text(spark, _floor_path(state_path))
    return int(txt.strip()) if txt is not None and txt.strip() else None


def _write_ledger_floor(
    spark: SparkSession, state_path: str, v: int
) -> None:
    hfs.write_text(spark, _floor_path(state_path), str(v))


def backfill_ledger_floor(
    spark: SparkSession, state_path: str, floor: int
) -> None:
    """Migration path for LEGACY state dirs written before the floor
    marker existed: record ``floor`` as the first version this dir ever
    committed, re-enabling its legitimate floor replays (which the
    conservative markerless reading otherwise refuses forever).

    Only the operator can attest the true floor -- the retained window
    cannot (that ambiguity is why the marker exists) -- so this is an
    explicit, guarded act, not an automatic inference:

    * refuses when a marker is already present (never silently re-base a
      dir whose provenance is recorded);
    * refuses when ``floor > min(ledger)`` -- a retained version below
      the attested floor proves the attestation wrong.
    """
    existing = _ledger_floor(spark, state_path)
    if existing is not None:
        raise RuntimeError(
            f"sketch-state ledger at {state_path} already has a floor "
            f"marker ({existing}); refusing to overwrite -- delete the "
            "marker manually only if you can prove it is wrong"
        )
    ledger = _versions(spark, state_path)
    if ledger and floor > ledger[0]:
        raise ValueError(
            f"attested floor {floor} is above the oldest retained "
            f"version {ledger[0]} at {state_path}: a version below the "
            "floor cannot exist, so the attestation is wrong"
        )
    _write_ledger_floor(spark, state_path, floor)


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
    * A batch whose predecessor state is MISSING may rebuild from its
      delta alone ONLY when it is the ledger's persisted FLOOR (the
      first version this state dir ever committed, recorded in a marker
      file at first commit).  Any other no-predecessor replay raises:
      the predecessor was pruned, and "merging with empty state" would
      silently re-base the whole accumulated rollup -- including the
      subtle case where the replayed batch happens to be the OLDEST
      RETAINED version, which the retained window alone cannot tell
      apart from a genuine floor."""
    delta = sketches.sketch_rollup(batch_df, time_col, key_col, grain)
    _fold_versioned_state(
        delta, batch_id, state_path, merge_hll_rollup, keep_versions
    )


def _fold_versioned_state(
    delta: DataFrame,
    batch_id: int,
    state_path: str,
    merge_fn,
    keep_versions: int,
) -> None:
    """THE versioned-ledger fold (r15: extracted from the HLL fold so
    the CMS maintenance stream cannot re-implement -- and drift from --
    the exactly-once discipline): read the newest state strictly below
    ``batch_id``, ``merge_fn(prev, delta)``, commit to ``v=<batch_id>``,
    prune.  All the floor-marker/replay safety documented on
    :func:`fold_batch_into_hll` lives here.  ``merge_fn`` must be the
    sketch family's associative merge over two state DataFrames."""
    if keep_versions < 2:
        raise ValueError(
            f"keep_versions={keep_versions} < 2: v=<batch_id-1> must "
            "survive pruning or a replay of the newest batch rebuilds "
            "its state from nothing"
        )
    spark = delta.sparkSession
    prev = read_sketch_state(spark, state_path, before=batch_id)
    ledger = _versions(spark, state_path)
    # "No predecessor state" is only ever legitimate for the ledger's
    # FLOOR -- the first version this state dir ever committed (stream
    # started there, or maintenance attached mid-stream).  The floor is
    # PERSISTED in a marker file at first commit, because the retained
    # window cannot distinguish the cases by itself: with versions
    # [5, 6, 7] a replay of batch 5 looks identical whether 5 was the
    # first commit ever (delta-only rebuild is exactly what the original
    # run did -- proceed) or v=4 was pruned (v=5 was ORIGINALLY built as
    # merge(v4, delta5); rebuilding it delta-only would silently drop
    # batches 0..4 and re-base everything after -- refuse).  min(ledger)
    # heuristics re-open exactly that corruption; only the marker closes
    # it.  Markerless state dirs (written before the marker existed) get
    # the conservative reading: any no-predecessor replay with a
    # non-empty ledger raises.
    floor = _ledger_floor(spark, state_path)
    if prev is None and batch_id > 0 and not (
        (floor is None and not ledger) or (floor == batch_id)
    ):
        raise RuntimeError(
            f"sketch-state ledger at {state_path} (versions {ledger}, "
            f"floor marker {floor!r}) has no state below replaying "
            f"batch_id={batch_id}, which is not the ledger floor: the "
            "predecessor state was pruned, and rebuilding from the "
            "delta alone would silently re-base the rollup; raise "
            "keep_versions (>= max replay depth), or -- for a legacy "
            "markerless dir whose true floor you can attest -- run "
            "backfill_ledger_floor first"
        )
    if floor is None and not ledger:
        # first commit ever into this state dir: record the floor BEFORE
        # the data write, so a crash between the two never yields data
        # whose floor is unknown
        _write_ledger_floor(spark, state_path, batch_id)
    merged = delta if prev is None else merge_fn(prev, delta)
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


# ---------------------------------------------------------------------------
# Count-Min maintenance (r15): the same versioned ledger folding the
# portable CMS counters (operators/sketches.py cms_build/cms_merge).
# Because counter merge is EXACT (linearity, not estimate algebra), the
# maintained state equals a from-scratch batch build cell for cell --
# the stream-vs-batch gate is full equality, not an in-band check.
# ---------------------------------------------------------------------------


def fold_batch_into_cms(
    batch_df: DataFrame,
    batch_id: int,
    state_path: str,
    key_col: str = "event_type",
    depth: int | None = None,
    width: int | None = None,
    keep_versions: int = 3,
) -> None:
    """One CMS maintenance step through :func:`_fold_versioned_state`.

    On-disk state is the counter table WITH its geometry columns
    ``(r, b, cnt, depth, width)`` -- the bloom-artifact lesson applied
    to persisted state: attaching a fold at a different (depth, width)
    than the ledger was built with would silently sum counters from two
    different hash families, so the merge validates the columns and
    raises instead."""
    d = sketches.CMS_DEPTH if depth is None else depth
    w = sketches.CMS_WIDTH if width is None else width
    from pyspark.sql import functions as F

    delta = (
        sketches.cms_build(batch_df, key_col, d, w)
        .counters.withColumn("depth", F.lit(int(d)))
        .withColumn("width", F.lit(int(w)))
    )

    def merge(prev: DataFrame, cur: DataFrame) -> DataFrame:
        g = prev.select("depth", "width").distinct().collect()
        geos = {(r["depth"], r["width"]) for r in g}
        if geos and geos != {(int(d), int(w))}:
            raise RuntimeError(
                f"cms state at {state_path} was built at "
                f"{sorted(geos)} but this fold hashes at "
                f"({d}, {w}) -- summing counters across hash families "
                "is silent corruption; rebuild the ledger or match the "
                "geometry"
            )
        # delegate the counter-addition law to the ONE tested spelling
        # (sketches.cms_merge) -- re-implementing union+sum here would
        # be exactly the definition drift the _fold_versioned_state
        # extraction exists to prevent (r15 review)
        summed = sketches.cms_merge(
            sketches.CMSketch(int(d), int(w), prev.select("r", "b", "cnt")),
            sketches.CMSketch(int(d), int(w), cur.select("r", "b", "cnt")),
        ).counters
        return summed.select(
            "r",
            "b",
            "cnt",
            F.lit(int(d)).alias("depth"),
            F.lit(int(w)).alias("width"),
        )

    _fold_versioned_state(delta, batch_id, state_path, merge, keep_versions)


def read_cms_state(spark: SparkSession, state_path: str):
    """The maintained counters as a :class:`..operators.sketches.CMSketch`
    (geometry read back from the state columns), or None for an empty
    ledger -- ready for :func:`..operators.sketches.cms_estimate`."""
    df = read_sketch_state(spark, state_path)
    if df is None:
        return None
    geo = df.select("depth", "width").distinct().collect()
    if not geo:
        # a committed-but-empty ledger (every batch so far carried only
        # NULL keys, which have no draw) has no geometry to read -- that
        # is "no usable state", not corruption
        return None
    if len(geo) > 1:
        raise RuntimeError(
            f"cms state at {state_path} carries {len(geo)} distinct "
            "geometries -- a corrupt ledger; rebuild it"
        )
    return sketches.CMSketch(
        int(geo[0]["depth"]),
        int(geo[0]["width"]),
        df.select("r", "b", "cnt"),
    )


def cms_maintenance_stream(
    stream: DataFrame,
    state_path: str,
    checkpoint: str,
    key_col: str = "event_type",
    depth: int | None = None,
    width: int | None = None,
):
    """writeStream wiring for :func:`fold_batch_into_cms` (the
    hll_maintenance_stream shape): the returned ``DataStreamWriter``
    just needs ``.trigger(...).start()``.  After draining, frequency
    questions ("how often did this event type / token / fingerprint
    occur, ever") answer from kilobytes of counters that trail the
    stream by one trigger -- without rescanning a byte of history."""
    return (
        stream.writeStream.foreachBatch(
            lambda df, bid: fold_batch_into_cms(
                df, bid, state_path, key_col, depth, width
            )
        )
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )


def fold_batch_into_daily_counts(
    batch_df: DataFrame,
    batch_id: int,
    state_path: str,
    key_col: str = "event_type",
    ts_col: str = "ts",
    keep_versions: int = 3,
) -> None:
    """One anomaly-monitor maintenance step through
    :func:`_fold_versioned_state` (r16): the maintained state is the
    per-(key, day) count SERIES that :mod:`..operators.anomaly` scores.

    delta = the batch's own daily counts; merge = union + per-(key, day)
    sum -- counts are additive across batches, so the maintained series
    equals a batch :func:`..operators.anomaly.daily_counts` over
    everything ever streamed (equality-gated in
    tests/test_streaming_anomaly.py), and the z-score monitor
    (``rolling_zscores``/``global_zscores`` over ``read_sketch_state``)
    answers from a keys x days table that trails the stream by one
    trigger, never rescanning raw history.  State is kilobytes at any
    corpus scale: the series grows with (keys x days), not rows.
    """
    from pyspark.sql import functions as F

    from ..operators import anomaly

    delta = anomaly.daily_counts(batch_df, key_col, ts_col)

    def merge(prev: DataFrame, cur: DataFrame) -> DataFrame:
        return (
            prev.unionByName(cur)
            .groupBy("key", "day")
            .agg(F.sum("n").cast("long").alias("n"))
        )

    _fold_versioned_state(delta, batch_id, state_path, merge, keep_versions)


def anomaly_maintenance_stream(
    stream: DataFrame,
    state_path: str,
    checkpoint: str,
    key_col: str = "event_type",
    ts_col: str = "ts",
):
    """writeStream wiring for :func:`fold_batch_into_daily_counts` (the
    hll/cms maintenance shape): the returned ``DataStreamWriter`` just
    needs ``.trigger(...).start()``.  After draining, the continuous
    ingest monitor is two tiny window passes over the maintained series:

        daily = read_sketch_state(spark, state_path)
        flags = anomaly.rolling_zscores(daily)   # |z| > 2 trailing-7d
    """
    return (
        stream.writeStream.foreachBatch(
            lambda df, bid: fold_batch_into_daily_counts(
                df, bid, state_path, key_col, ts_col
            )
        )
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )


def fold_batch_into_name_dictionary(
    batch_df: DataFrame,
    batch_id: int,
    state_path: str,
    name_col: str,
    id_col: str,
    keep_versions: int = 3,
) -> None:
    """One entity-dictionary maintenance step through
    :func:`_fold_versioned_state` (r16): the maintained state is the
    ``(name, n_records, min_id)`` dictionary that
    :mod:`..operators.linkage` resolves over.

    delta = the batch's own dictionary; merge = union + per-name
    (sum counts, min witness id) -- both associative and commutative,
    so the maintained dictionary equals a batch
    :func:`..operators.linkage.name_dictionary` over everything ever
    streamed (equality-gated in tests/test_streaming_linkage.py).  The
    deployment read path is the batch operators over the maintained
    state::

        d = read_sketch_state(spark, state_path)
        canon = linkage.canonical_map(linkage.blocked_pairs(d), d)

    so every new batch of records can be canonicalized against the
    full corpus's name mass without rescanning a record of history.
    State is vocabulary-sized at any corpus scale (the linkage
    module's whole premise).
    """
    from pyspark.sql import functions as F

    from ..operators import linkage

    delta = linkage.name_dictionary(batch_df, name_col, id_col)

    def merge(prev: DataFrame, cur: DataFrame) -> DataFrame:
        return (
            prev.unionByName(cur)
            .groupBy("name")
            .agg(
                F.sum("n_records").cast("long").alias("n_records"),
                F.min("min_id").alias("min_id"),
            )
        )

    _fold_versioned_state(delta, batch_id, state_path, merge, keep_versions)


def fold_batch_into_moments(
    batch_df: DataFrame,
    batch_id: int,
    state_path: str,
    vec_col: str = "embedding",
    keep_versions: int = 3,
) -> None:
    """One embedding-moments maintenance step through
    :func:`_fold_versioned_state` (r17): the maintained state is the
    single ``(n, s, ss)`` moment row that
    :func:`..operators.pca.model_from_moments` fits from.

    Moments are EXACTLY additive across batches (count, sum vector,
    second-moment matrix), so a continuous-ingest pipeline keeps its
    PCA/whitening model fresh by folding each micro-batch's partials
    and re-deriving the model from kilobytes of state -- never
    rescanning a vector of history.  delta = the batch's own partials
    reduced to one row; merge = driver-side numpy add of the two
    one-row states (the bloom-geometry one-row-collect posture -- a
    cluster-side merge of two singleton frames was measured 15x slower
    than the whole fold's real work, all of it crossJoin task
    scheduling).  Float addition is associative only up to rounding,
    so the maintained ≡ batch gate is allclose at double precision
    (tests/test_streaming_pca.py), not the integer families' exact
    equality -- stated, not hidden.

    The deployment read path::

        n, s, ss = read_moments_state(spark, state_path)
        model = pca.model_from_moments(n, s, ss, k)
    """
    from ..operators import pca

    parts = pca.embedding_moments(batch_df, vec_col)

    def merge(prev: DataFrame, cur: DataFrame) -> DataFrame:
        return _merge_moment_rows(prev, cur)

    delta = _reduce_moment_partials(parts)
    if delta is None:
        # an all-NULL (or empty) micro-batch adds nothing; fold a zero
        # delta is impossible without knowing d, so skip the version --
        # a replay of this batch skips identically (idempotent)
        return
    _fold_versioned_state(delta, batch_id, state_path, merge, keep_versions)


def _moment_row_frame(spark: SparkSession, n: int, s, ss) -> DataFrame:
    """ONE (n, s, ss) row as a pure-JVM literal frame.

    ``spark.createDataFrame([row])`` would be the obvious spelling, but
    a parallelized local list is a PYTHON-backed RDD: every action on
    it spins up the full python worker pool just to unpickle one row --
    measured ~6 s per fold step on local[32].  ``range(1).select``
    with literal expressions stays JVM-side end to end (``repr`` on
    doubles round-trips exactly, the repo's float-literal rule)."""
    from pyspark.sql import functions as F

    def arr(vals):
        return "array(" + ", ".join(f"{float(v)!r}D" for v in vals) + ")"

    return spark.range(1).select(
        F.lit(int(n)).cast("long").alias("n"),
        F.expr(arr(s)).alias("s"),
        F.expr(arr(ss)).alias("ss"),
    )


def _reduce_moment_partials(parts: DataFrame) -> DataFrame | None:
    """Partition-count partials -> ONE (n, s, ss) row (None if no
    vectors).  The collect is O(num_partitions) -- the bloom-geometry
    posture -- and the reduce is numpy on kilobytes."""
    import numpy as np

    rows = parts.collect()
    if not rows:
        return None
    n = int(sum(r["n"] for r in rows))
    s = np.sum([np.asarray(r["s"]) for r in rows], axis=0)
    ss = np.sum([np.asarray(r["ss"]) for r in rows], axis=0)
    return _moment_row_frame(parts.sparkSession, n, s, ss)


def _merge_moment_rows(prev: DataFrame, cur: DataFrame) -> DataFrame:
    """Elementwise add of two ONE-ROW moment frames, driver-side.

    Each side is kilobytes, so two one-row collects + a numpy add is
    the right plan; the obvious cluster-side spelling (crossJoin of
    the two singletons + zip_with) was measured at ~6 s of pure task
    scheduling -- the 32-slice local relations fan the nested-loop
    join into 1024 empty tasks."""
    import numpy as np

    p = prev.collect()[0]
    c = cur.collect()[0]
    s = np.asarray(p["s"]) + np.asarray(c["s"])
    ss = np.asarray(p["ss"]) + np.asarray(c["ss"])
    return _moment_row_frame(
        prev.sparkSession, int(p["n"]) + int(c["n"]), s, ss
    )


def read_moments_state(spark: SparkSession, state_path: str):
    """The maintained ``(n, s, ss)`` row (None if nothing committed):
    feed it to :func:`..operators.pca.model_from_moments`."""
    state = read_sketch_state(spark, state_path)
    if state is None:
        return None
    r = state.collect()[0]
    return int(r["n"]), list(r["s"]), list(r["ss"])


def pca_maintenance_stream(
    stream: DataFrame,
    state_path: str,
    checkpoint: str,
    vec_col: str = "embedding",
):
    """writeStream wiring for :func:`fold_batch_into_moments` (the
    ledger maintenance shape): the returned ``DataStreamWriter`` just
    needs ``.trigger(...).start()``.  Per-batch work is one Arrow pass
    over the batch + a kilobyte-sized merge."""
    return (
        stream.writeStream.foreachBatch(
            lambda df, bid: fold_batch_into_moments(
                df, bid, state_path, vec_col
            )
        )
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )


def fold_batch_into_edge_set(
    batch_df: DataFrame,
    batch_id: int,
    state_path: str,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    keep_versions: int = 3,
) -> None:
    """One dup-pair-graph maintenance step through
    :func:`_fold_versioned_state` (r17): the maintained state is the
    SYMMETRIC DISTINCT edge set ``(a, b)`` that
    :mod:`..operators.graph` scores (PageRank canonical-member ranking,
    triangle clique-vs-chain density).

    delta = the batch's own symmetric edges
    (:func:`..operators.graph.symmetric_edges` -- both directions,
    self-loops dropped, distinct); merge = union + DISTINCT.  Set union
    is associative, commutative, and idempotent PER EDGE, so the
    maintained graph equals a batch ``symmetric_edges`` over every pair
    ever streamed (equality-gated in tests/test_streaming_graph.py) --
    and re-delivered pairs (the admission paths re-emit a near-dup pair
    whenever its doc re-appears) collapse for free.  The deployment
    read path is the batch operators over the maintained state::

        e = read_sketch_state(spark, state_path)
        rank = graph.pagerank(e)          # canonical-member election
        dens = graph.triangle_counts(e)   # clique-vs-chain density

    so the graph analytics never rescan pair history.  State is
    edge-set-sized at any corpus scale: near-dup pair graphs grow with
    the duplicate mass, not the corpus (the d6 premise).
    """
    from ..operators import graph

    delta = graph.symmetric_edges(batch_df, a_col, b_col)

    def merge(prev: DataFrame, cur: DataFrame) -> DataFrame:
        return prev.unionByName(cur).distinct()

    _fold_versioned_state(delta, batch_id, state_path, merge, keep_versions)


def graph_maintenance_stream(
    stream: DataFrame,
    state_path: str,
    checkpoint: str,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
):
    """writeStream wiring for :func:`fold_batch_into_edge_set` (the
    hll/cms/anomaly/linkage maintenance shape): the returned
    ``DataStreamWriter`` just needs ``.trigger(...).start()``.  The
    per-batch work is one edge-set-sized distinct -- trigger-overhead-
    bound like every ledger fold."""
    return (
        stream.writeStream.foreachBatch(
            lambda df, bid: fold_batch_into_edge_set(
                df, bid, state_path, a_col, b_col
            )
        )
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )


def linkage_maintenance_stream(
    stream: DataFrame,
    state_path: str,
    checkpoint: str,
    name_col: str,
    id_col: str,
):
    """writeStream wiring for :func:`fold_batch_into_name_dictionary`
    (the hll/cms/anomaly maintenance shape): the returned
    ``DataStreamWriter`` just needs ``.trigger(...).start()``.
    Trigger-overhead-bound like every ledger fold -- the per-batch work
    is one vocabulary-sized aggregate."""
    return (
        stream.writeStream.foreachBatch(
            lambda df, bid: fold_batch_into_name_dictionary(
                df, bid, state_path, name_col, id_col
            )
        )
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
