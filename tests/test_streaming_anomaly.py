"""Streaming anomaly-monitor maintenance (r16): the per-(key, day)
count series maintained through the versioned ledger equals a batch
rebuild over everything streamed, the z-score monitor over the
maintained state equals the batch monitor, and a micro-batch replay is
idempotent (the at-least-once foreachBatch contract).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from nyc_taxi_dataset_analysis_apache_hive_spark.operators import anomaly
from nyc_taxi_dataset_analysis_apache_hive_spark.sources.readers import load_table
from nyc_taxi_dataset_analysis_apache_hive_spark.streaming import events as sev
from nyc_taxi_dataset_analysis_apache_hive_spark.streaming import maintenance as mnt


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """Events sf0.001 as 4 time-ordered parquet files (4 micro-batches;
    no sentinel needed -- the fold is foreachBatch, not a watermark)."""
    pdf = load_table(spark, "/root/testdata/sf0.001", "events").toPandas()
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    pdf = pdf.sort_values("ts").reset_index(drop=True)
    out = str(tmp_path_factory.mktemp("anomaly_stream") / "events")
    os.makedirs(out)
    n = len(pdf)
    for i in range(4):
        pdf.iloc[n * i // 4 : n * (i + 1) // 4].to_parquet(
            os.path.join(out, f"{i:02d}.parquet"), index=False
        )
    return out


def _series_map(df):
    return {(r["key"], r["day"]): r["n"] for r in df.collect()}


def test_maintained_series_equals_batch_rebuild(spark, events_dir, tmp_path):
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    stream = sev.read_events_stream(spark, events_dir, max_files_per_trigger=1)
    q = (
        mnt.anomaly_maintenance_stream(stream, state, ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = mnt.read_sketch_state(spark, state)
    assert got is not None
    want = anomaly.daily_counts(spark.read.parquet(events_dir))
    assert _series_map(got) == _series_map(want)

    # the monitor over maintained state == the batch monitor
    got_z = anomaly.rolling_zscores(got)
    want_z = anomaly.rolling_zscores(want)
    assert sorted(map(tuple, got_z.collect())) == sorted(
        map(tuple, want_z.collect())
    )


def test_fold_replay_is_idempotent(spark, events_dir, tmp_path):
    state = str(tmp_path / "state")
    ev = spark.read.parquet(events_dir)
    half_a = ev.filter(F.col("event_id") % 2 == 0)
    half_b = ev.filter(F.col("event_id") % 2 == 1)
    mnt.fold_batch_into_daily_counts(half_a, 0, state)
    mnt.fold_batch_into_daily_counts(half_b, 1, state)
    once = _series_map(mnt.read_sketch_state(spark, state))
    # foreachBatch is at-least-once: replaying the newest batch must
    # rebuild v=1 from the same (state, delta) pair, not double-count
    mnt.fold_batch_into_daily_counts(half_b, 1, state)
    assert _series_map(mnt.read_sketch_state(spark, state)) == once
    # and the two-fold ledger equals the one-shot batch series
    assert once == _series_map(anomaly.daily_counts(ev))


def test_fold_is_additive_across_any_batch_split(spark, events_dir, tmp_path):
    state = str(tmp_path / "state")
    ev = spark.read.parquet(events_dir)
    thirds = [ev.filter(F.col("event_id") % 3 == i) for i in range(3)]
    for i, part in enumerate(thirds):
        mnt.fold_batch_into_daily_counts(part, i, state)
    assert _series_map(mnt.read_sketch_state(spark, state)) == _series_map(
        anomaly.daily_counts(ev)
    )
