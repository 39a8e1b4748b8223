"""Cache-lifecycle management for operators that ``persist()`` intermediates.

Several operators cache an intermediate frame that their plan references
twice (MinHash shingle sets, SimHash signatures, the TF relation in
TF-IDF).  ``DataFrame.persist`` is lazy and session-global: nothing can be
unpersisted *inside* the operator (the returned DataFrame has not run yet),
so without lifecycle help a long-lived session running many corpora
accumulates cache entries until ``spark.catalog.clearCache()``.

:class:`CacheScope` closes that gap: operators register every frame they
persist with the caller's scope, and the scope unpersists them all when it
exits -- after the caller's terminal action, which is the earliest moment
unpersisting is safe::

    with CacheScope() as cs:
        pairs = minhash_lsh_pairs(docs, persist_shingles=True, cache=cs)
        pairs.write.parquet(out)          # terminal action runs cached
    # <- every intermediate unpersisted here (blocking)

Passing no scope keeps the round-2 behaviour (persist and leave to the
session), which is fine for short-lived jobs and the bench/driver sweeps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class CacheScope:
    """Collects persisted DataFrames and unpersists them on scope exit.

    Reusable as a plain registry too: call :meth:`unpersist_all` directly
    when the ``with`` form doesn't fit (e.g. async pipelines).
    """

    def __init__(self) -> None:
        self._frames: list[DataFrame] = []

    @property
    def tracked(self) -> tuple[DataFrame, ...]:
        """Frames currently tracked (not yet unpersisted) -- inspectable so
        callers/tests can verify cache state without global counters."""
        return tuple(self._frames)

    def persist(self, df: DataFrame, storage_level=None) -> DataFrame:
        """Persist ``df`` (default storage level unless given) and track it."""
        df = df.persist(storage_level) if storage_level is not None else df.persist()
        self._frames.append(df)
        return df

    def unpersist_all(self, blocking: bool = False) -> None:
        """Unpersist every tracked frame (newest first); idempotent."""
        while self._frames:
            try:
                self._frames.pop().unpersist(blocking)
            except Exception:
                pass  # a stopped session can't leak cache; nothing to do

    def __enter__(self) -> "CacheScope":
        return self

    def __exit__(self, *exc) -> bool:
        # blocking so the executor memory is actually free when the scope
        # closes -- the deterministic contract tests rely on
        self.unpersist_all(blocking=True)
        return False


def maybe_persist(
    df: DataFrame, flag: bool, cache: CacheScope | None
) -> DataFrame:
    """The one persist decision shared by the flagged operators: no-op when
    ``flag`` is off, scope-tracked when a :class:`CacheScope` is given,
    plain session-lifetime ``persist()`` otherwise."""
    if not flag:
        return df
    if cache is not None:
        return cache.persist(df)
    return df.persist()


def run_overlapped(*thunks):
    """Run independent eager Spark actions from a small thread pool so
    their jobs overlap (optimization guide §2.6: the scheduler happily
    runs several jobs at once; actions are only sequential because
    driver code calls them sequentially).  Each ``thunk`` is a nullary
    callable performing its own action (a ``localCheckpoint(eager=True)``,
    an iterative training loop, ...); returns their results in call
    order.  Results are identical to running the thunks sequentially --
    only wall-clock changes -- so this is ONLY for thunks with no data
    dependency on each other.  The first thunk exception propagates.

    Used by the multi-leg entries whose shared-artifact builds used to
    pay one scheduling round-trip per eager checkpoint in sequence
    (tv1/k3/d6): a multi-leg build's independent artifacts now
    materialize concurrently, which also back-fills the straggler tail
    of each job with the next job's tasks at ANY core count.

    CONSTRAINT (r18, ADVICE): overlapped thunks must not mutate
    SparkContext-GLOBAL state -- ``setCheckpointDir`` (so no
    ``connected_components(checkpoint_dir=...)`` / ``_checkpoint_subdir``
    users), ``conf.set``, catalog names they don't own.  Every current
    call site uses ``localCheckpoint`` or distinct catalog names; the
    set-and-restore pattern those helpers use is only safe run
    SEQUENTIALLY.  Job groups/descriptions are fine (thread-local).
    """
    import os

    if len(thunks) == 1 or os.environ.get("SPARK_GRAFT_NO_OVERLAP") == "1":
        # kill switch (also the knob for saturated clusters where
        # back-filling buys nothing): sequential, same results
        return [t() for t in thunks]
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=len(thunks)) as pool:
        futures = [pool.submit(t) for t in thunks]
        return [f.result() for f in futures]


def checkpoint_overlapped(*dfs: DataFrame) -> list[DataFrame]:
    """``localCheckpoint(eager=True)`` several INDEPENDENT DataFrames
    with their materialization jobs overlapped (see
    :func:`run_overlapped`); returns the checkpointed frames in call
    order."""
    return run_overlapped(
        *[lambda d=d: d.localCheckpoint(eager=True) for d in dfs]
    )
