"""Driver-local Lloyd (r17) parity gates.

kmeans_train now collects bounded training inputs and runs the Lloyd
loop on the driver (similarity._lloyd_local) instead of scheduling
n_iter sequential broadcast-join + checkpoint Spark jobs.  The whole
optimization is only admissible if the local replay is BIT-FOR-BIT the
distributed loop -- the same argument the DuckDB oracle's unrolled-Lloyd
replay already rests on (round(sim, 9) elections + the quantize barrier
make the iteration engine-exact).  These tests force the distributed
path (threshold monkeypatched to 0) and compare against the local path
exactly: every gate shape, the degenerate shapes the unit suite pins,
and a randomized corpus.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from nyc_taxi_dataset_analysis_apache_hive_spark.operators import similarity
from nyc_taxi_dataset_analysis_apache_hive_spark.sources.readers import load_table


def _train_both(monkeypatch, emb, **kw):
    """(local, distributed) centroid maps for the same inputs."""
    local = {
        r["cent_id"]: (None if r["cent_emb"] is None else list(r["cent_emb"]))
        for r in similarity.kmeans_train(emb, **kw).collect()
    }
    monkeypatch.setattr(similarity, "KMEANS_DRIVER_MAX_ROWS", 0)
    try:
        dist = {
            r["cent_id"]: (
                None if r["cent_emb"] is None else list(r["cent_emb"])
            )
            for r in similarity.kmeans_train(emb, **kw).collect()
        }
    finally:
        monkeypatch.undo()
    return local, dist


def test_gate_constants_parity(monkeypatch, spark, sf001_dir):
    """The k2/k3 gate shape: sample-bounded corpus, 16 centroids, 5
    iterations, quantize=6 -- the exact call the driver-gated entries
    make."""
    emb = load_table(spark, sf001_dir, "embeddings").filter(
        F.col("vec_id") < 500
    )
    local, dist = _train_both(
        monkeypatch, emb, n_centroids=16, n_iter=5, quantize=6
    )
    assert local == dist and len(local) == 16


def test_unquantized_parity(monkeypatch, spark, sf001_dir):
    """No quantize barrier: best-effort parity (r18, ADVICE).  The
    distributed F.avg's partial-sum order is partition-layout
    dependent, so quantize=None agreement is only guaranteed to the
    last ulp -- every DECLARED query trains quantized (K3_KMEANS_Q),
    where the barrier absorbs exactly this.  Elections and shapes must
    still match exactly; mean elements compare at 1e-12 relative."""
    import math

    emb = load_table(spark, sf001_dir, "embeddings")
    local, dist = _train_both(monkeypatch, emb, n_centroids=8, n_iter=3)
    assert sorted(local) == sorted(dist) and len(local) == 8
    for cid, lv in local.items():
        dv = dist[cid]
        assert (lv is None) == (dv is None) and len(lv) == len(dv)
        for a, b in zip(lv, dv):
            assert (a is None) == (b is None)
            if a is not None:
                assert math.isclose(a, b, rel_tol=1e-12, abs_tol=1e-12)


def test_null_id_parity(monkeypatch, spark):
    """A NULL training id sorts FIRST (Spark ASC NULLS FIRST) in the
    init pool, the mean order and the reseed tie-break -- both paths
    (r18, ADVICE: the old local key sorted NULLs last)."""
    emb = spark.createDataFrame(
        [
            (None, [0.9, 0.1]),
            (0, [1.0, 0.0]),
            (1, [0.0, 1.0]),
            (2, [0.6, 0.4]),
        ],
        "vec_id long, embedding array<double>",
    )
    local, dist = _train_both(
        monkeypatch, emb, n_centroids=2, n_iter=3, quantize=6
    )
    assert local == dist and len(local) == 2
    # and with reseed on, the NULL id participates in the far-point
    # tie-break identically
    def run(rows):
        df, rep = similarity.kmeans_train(
            spark.createDataFrame(rows, "vec_id long, embedding array<double>"),
            n_centroids=3, n_iter=2, quantize=6,
            reseed_dead=True, return_report=True,
        )
        return {r["cent_id"]: list(r["cent_emb"]) for r in df.collect()}, rep

    rows = [(None, [1.0, 0.0]), (0, [1.0, 0.0]), (1, [1.0, 0.0])]
    local2, repl = run(rows)
    monkeypatch.setattr(similarity, "KMEANS_DRIVER_MAX_ROWS", 0)
    dist2, repd = run(rows)
    assert local2 == dist2 and repl == repd


def test_jround_large_magnitude():
    """|x| >= ~1e22 must round like BigDecimal.setScale, not raise
    (r18, ADVICE: Decimal.quantize under the default 28-digit context
    raised InvalidOperation there)."""
    assert similarity._jround(1e22, 6) == 1e22
    assert similarity._jround(-1.23e25, 9) == -1.23e25
    assert similarity._jround(1e300, 9) == 1e300
    assert similarity._jround(1.5, 6) == 1.5
    assert similarity._jround(2.5e-6, 6) == 3e-6  # HALF_UP, not banker's


def test_reseed_and_report_parity(monkeypatch, spark):
    """reseed_dead + return_report: dead counts, reseed counts and the
    re-seeded centroids all match the distributed loop."""
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [1.0, 0.0]),
            (2, [1.0, 0.0]),
            (3, [0.9, 0.1]),
            (5, [0.0, 1.0]),
        ],
        "vec_id long, embedding array<double>",
    )

    def run():
        df, rep = similarity.kmeans_train(
            emb, n_centroids=2, n_iter=3, reseed_dead=True, return_report=True
        )
        return {r["cent_id"]: list(r["cent_emb"]) for r in df.collect()}, rep

    local, rep_local = run()
    monkeypatch.setattr(similarity, "KMEANS_DRIVER_MAX_ROWS", 0)
    dist, rep_dist = run()
    assert local == dist
    assert rep_local == rep_dist == {
        "dead_cells": [1, 0, 0],
        "reseeds": [1, 0, 0],
    }


def test_null_and_float32_parity(monkeypatch, spark):
    """NULL embeddings skipped from init, float32 arrays cast to double
    -- the unit-suite shape, both paths."""
    from pyspark.sql.types import (
        ArrayType,
        FloatType,
        LongType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("vec_id", LongType(), False),
            StructField("embedding", ArrayType(FloatType()), True),
        ]
    )
    rows = [
        (i, None if i == 1 else [float(i), 1.0, float(i % 3)])
        for i in range(10)
    ]
    emb = spark.createDataFrame(rows, schema)
    local, dist = _train_both(monkeypatch, emb, n_centroids=4, n_iter=2)
    assert local == dist and len(local) == 4


def test_duplicate_id_parity(monkeypatch, spark):
    """A duplicated training id with two payloads elects ONE
    deterministic row in both paths (the max_by v-in-the-key
    discipline)."""
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (0, [0.0, 1.0]),  # duplicate id, different payload
            (1, [0.5, 0.5]),
            (2, [0.9, 0.1]),
        ],
        "vec_id long, embedding array<double>",
    )
    local, dist = _train_both(
        monkeypatch, emb, n_centroids=2, n_iter=3, quantize=6
    )
    assert local == dist


def test_local_plan_is_jvm_literal(spark, sf001_dir):
    """The driver path's centroid table must be a pure-JVM literal plan
    (the localrel discipline): no python-backed RDD scan, so downstream
    probes/joins never pay a python worker round-trip."""
    emb = load_table(spark, sf001_dir, "embeddings").filter(
        F.col("vec_id") < 500
    )
    cents = similarity.kmeans_train(emb, n_centroids=16, n_iter=5, quantize=6)
    plan = cents._jdf.queryExecution().executedPlan().toString()
    assert "Scan ExistingRDD" not in plan
    assert cents.count() == 16


def test_oversized_input_falls_back_distributed(monkeypatch, spark):
    """An input above the driver threshold trains through the
    distributed loop (the collect is limit-bounded, never data-sized)."""
    monkeypatch.setattr(similarity, "KMEANS_DRIVER_MAX_ROWS", 3)
    emb = spark.createDataFrame(
        [(i, [1.0, float(i)]) for i in range(8)],
        "vec_id long, embedding array<double>",
    )
    cents = similarity.kmeans_train(emb, n_centroids=2, n_iter=1)
    # distributed path's signature: checkpointed RDD scan, not a literal
    plan = cents._jdf.queryExecution().executedPlan().toString()
    assert "Scan ExistingRDD" in plan
    assert cents.count() == 2


def test_empty_trainable_corpus_returns_empty(spark):
    """All-NULL vectors: no trainable row, empty centroid table with the
    contract schema (the distributed loop's init-limit-of-empty shape)."""
    emb = spark.createDataFrame(
        [(0, None), (1, None)], "vec_id long, embedding array<double>"
    )
    cents = similarity.kmeans_train(emb, n_centroids=4, n_iter=2)
    assert cents.columns == ["cent_id", "cent_emb"]
    assert cents.count() == 0


@pytest.mark.scale
@settings(max_examples=8, deadline=None, derandomize=True)
@given(
    vecs=st.lists(
        st.lists(
            st.floats(
                min_value=-4.0,
                max_value=4.0,
                allow_nan=False,
                allow_infinity=False,
            ),
            min_size=3,
            max_size=3,
        ),
        min_size=2,
        max_size=12,
    )
)
def test_randomized_parity(spark, vecs):
    """Randomized corpora (zero vectors, duplicates, tiny magnitudes
    included): local == distributed, quantized and not.  MonkeyPatch is
    instantiated in-body: a function-scoped fixture would trip
    hypothesis' health check under repeated example execution."""
    from _pytest.monkeypatch import MonkeyPatch

    emb = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    for q in (None, 6):
        local = {
            r["cent_id"]: list(r["cent_emb"])
            for r in similarity.kmeans_train(
                emb, n_centroids=3, n_iter=2, quantize=q
            ).collect()
        }
        mp = MonkeyPatch()
        mp.setattr(similarity, "KMEANS_DRIVER_MAX_ROWS", 0)
        try:
            dist = {
                r["cent_id"]: list(r["cent_emb"])
                for r in similarity.kmeans_train(
                    emb, n_centroids=3, n_iter=2, quantize=q
                ).collect()
            }
        finally:
            mp.undo()
        assert local == dist
