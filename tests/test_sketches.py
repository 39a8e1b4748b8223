"""Mergeable sketch rollups (HLL / theta / KLL): per-period accuracy vs
exact, range-merge accuracy, union associativity (merge-of-halves ==
direct), set-algebra overlap vs exact python sets, rank/quantile accuracy,
and parquet round-trips of every persisted sketch table."""

from __future__ import annotations

from datetime import datetime

import pytest

from pyspark.sql import functions as F

from nyc_taxi_dataset_analysis_apache_hive_spark.functions.text import (
    ngrams_from_tokens,
    tokens,
)
from nyc_taxi_dataset_analysis_apache_hive_spark.operators import sketches as sk
from nyc_taxi_dataset_analysis_apache_hive_spark.sources.readers import load_table


@pytest.fixture(scope="module")
def events(spark, sf0001_dir):
    return load_table(spark, sf0001_dir, "events")


@pytest.fixture(scope="module")
def daily(events):
    return sk.sketch_rollup(events, "ts", "user_id", grain="day").localCheckpoint()


def _tol(exact: int) -> float:
    return max(0.05 * exact, 2.0)


def test_per_day_estimates_close_to_exact(spark, events, daily):
    exact = {
        r["period"]: r["n"]
        for r in events.groupBy(
            F.date_trunc("day", "ts").alias("period")
        )
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    got = {r["period"]: r["n_distinct_est"] for r in sk.distinct_by_period(daily).collect()}
    assert set(got) == set(exact)
    for p, n in exact.items():
        assert abs(got[p] - n) <= _tol(n), p


def test_range_merge_close_to_exact(spark, events, daily):
    start, end = datetime(2024, 1, 10), datetime(2024, 1, 20)
    exact = (
        events.filter((F.col("ts") >= start) & (F.col("ts") < end))
        .agg(F.countDistinct("user_id").alias("n"))
        .first()["n"]
    )
    est = sk.distinct_over_range(daily, start, end).first()["n_distinct_est"]
    assert exact > 0 and abs(est - exact) <= _tol(exact)


def test_union_of_halves_equals_direct_sketch(spark, events):
    """Associativity: merging the two halves' sketches estimates exactly
    what one sketch over everything estimates (same lg_k, same keys)."""
    whole = events.agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg(F.col("user_id"), F.lit(12))
        ).alias("est")
    ).first()["est"]
    halves = (
        events.groupBy((F.col("event_id") % 2).alias("half"))
        .agg(F.hll_sketch_agg(F.col("user_id"), F.lit(12)).alias("sketch"))
    )
    merged = halves.agg(
        F.hll_sketch_estimate(
            F.hll_union_agg(F.col("sketch"), F.lit(False))
        ).alias("est")
    ).first()["est"]
    assert merged == whole


def test_sketch_table_parquet_roundtrip(spark, daily, tmp_path):
    """The persisted pattern: sketch column is plain BINARY, survives a
    parquet round-trip, and answers queries without the raw table."""
    out = str(tmp_path / "daily_sketches")
    daily.write.mode("overwrite").parquet(out)
    back = spark.read.parquet(out)
    a = {r["period"]: r["n_distinct_est"] for r in sk.distinct_by_period(daily).collect()}
    b = {r["period"]: r["n_distinct_est"] for r in sk.distinct_by_period(back).collect()}
    assert a == b


# ---------------------------------------------------------------------------
# Theta set algebra
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def source_shingles(spark, sf0001_dir):
    """(source, shingle) distinct word-3-gram rows per document source --
    the key universe whose per-source overlap the theta sketches estimate."""
    docs = load_table(spark, sf0001_dir, "documents")
    return (
        docs.select("source", tokens("text").alias("toks"))
        .select("source", F.explode(ngrams_from_tokens(F.col("toks"), 3)).alias("sh"))
        .distinct()
        .localCheckpoint()
    )


@pytest.fixture(scope="module")
def theta_by_source(source_shingles):
    return sk.theta_rollup(source_shingles, "source", "sh").localCheckpoint()


@pytest.fixture(scope="module")
def exact_sets(source_shingles):
    out: dict[str, set[str]] = {}
    for r in source_shingles.collect():
        out.setdefault(r["source"], set()).add(r["sh"])
    return out


def test_theta_overlap_exact_below_nominal(theta_by_source, exact_sets):
    """Every per-source shingle set is far below 2^12 nominal entries, so
    the theta sketches are in exact mode: estimates EQUAL python-set truth
    for every set-algebra output."""
    a, b = sorted(exact_sets)[:2]
    row = sk.set_overlap(theta_by_source, a, b).first()
    sa, sb = exact_sets[a], exact_sets[b]
    assert row["n_a"] == len(sa)
    assert row["n_b"] == len(sb)
    assert row["n_intersection"] == len(sa & sb)
    assert row["n_union"] == len(sa | sb)
    assert row["n_a_only"] == len(sa - sb)
    assert row["n_b_only"] == len(sb - sa)
    expect_j = len(sa & sb) / len(sa | sb)
    assert abs(row["jaccard_est"] - expect_j) < 1e-9


def test_theta_overlap_matrix_all_pairs(theta_by_source, exact_sets):
    m = len(exact_sets)
    rows = sk.overlap_matrix(theta_by_source).collect()
    assert len(rows) == m * (m - 1) // 2
    for r in rows:
        sa, sb = exact_sets[r["part_a"]], exact_sets[r["part_b"]]
        assert r["part_a"] < r["part_b"]
        assert r["n_intersection"] == len(sa & sb)
        assert r["n_union"] == len(sa | sb)


def test_theta_sketch_parquet_roundtrip(spark, theta_by_source, exact_sets, tmp_path):
    out = str(tmp_path / "theta_sketches")
    theta_by_source.write.mode("overwrite").parquet(out)
    back = spark.read.parquet(out)
    a, b = sorted(exact_sets)[:2]
    before = sk.set_overlap(theta_by_source, a, b).first()
    after = sk.set_overlap(back, a, b).first()
    assert before.asDict() == after.asDict()


# ---------------------------------------------------------------------------
# KLL quantiles / ranks
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def kll_daily(events):
    return sk.quantile_rollup(events, "ts", "value", grain="day").localCheckpoint()


def test_kll_n_is_exact(events, kll_daily):
    """KLL tracks the true item count: merged n == non-null value rows."""
    exact_n = events.filter(F.col("value").isNotNull()).count()
    got = sk.rank_over_range(kll_daily, 10.0).first()
    assert got["n"] == exact_n


def test_kll_rank_close_to_exact(events, kll_daily):
    """Estimated count of value<=T within the k=200 normalized rank error
    (~1.65%; gate at 2%) of the exact filter count."""
    nn = events.filter(F.col("value").isNotNull())
    n = nn.count()
    for t in (5.0, 35.0, 120.0):
        exact = nn.filter(F.col("value") <= t).count()
        got = sk.rank_over_range(kll_daily, t).first()
        assert abs(got["n_le_est"] - exact) <= max(0.02 * n, 2), t


def test_kll_quantiles_close_to_exact(events, kll_daily):
    """Each estimated quantile's exact rank is within 2% of the requested
    prob (rank-space accuracy -- the guarantee KLL actually makes)."""
    nn = events.filter(F.col("value").isNotNull())
    n = nn.count()
    rows = sk.quantiles_over_range(kll_daily, probs=(0.1, 0.5, 0.9)).collect()
    assert [r["prob"] for r in rows] == [0.1, 0.5, 0.9]
    for r in rows:
        rank_of_est = nn.filter(F.col("value") <= r["value_est"]).count() / n
        assert abs(rank_of_est - r["prob"]) <= 0.02, r


def test_kll_range_merge_matches_subrange(events, kll_daily):
    """Merging only [start, end)'s sketches answers for exactly that slice:
    n equals the slice's row count and the rank estimate tracks the
    slice-exact filter count."""
    start, end = datetime(2024, 1, 10), datetime(2024, 1, 20)
    sliced = events.filter(
        (F.col("ts") >= start) & (F.col("ts") < end) & F.col("value").isNotNull()
    )
    n = sliced.count()
    exact = sliced.filter(F.col("value") <= 35.0).count()
    got = sk.rank_over_range(kll_daily, 35.0, start, end).first()
    assert got["n"] == n
    assert abs(got["n_le_est"] - exact) <= max(0.02 * n, 2)


def test_kll_sketch_parquet_roundtrip(spark, kll_daily, tmp_path):
    # The property under test is parquet BYTE fidelity of the persisted
    # sketch column, so compare serialized bytes per period -- NOT merged
    # estimates: kll_daily is lazy and both the aggregation and the
    # rank_over_range merge use randomized level compaction, so two
    # evaluations can legitimately produce slightly different (both
    # valid) sketches.  localCheckpoint pins one materialization; the
    # md5-per-period comparison then proves the write/read is lossless.
    pinned = kll_daily.localCheckpoint()
    out = str(tmp_path / "kll_sketches")
    pinned.write.mode("overwrite").parquet(out)
    back = spark.read.parquet(out)

    def snap(df):
        return sorted(
            (str(r["period"]), r["n_rows"], r["h"])
            for r in df.select(
                "period", "n_rows", F.md5("sketch").alias("h")
            ).collect()
        )

    assert snap(back) == snap(pinned)
    # and the roundtripped state still answers the rank query coherently
    got = sk.rank_over_range(back, 35.0).first()
    want = sk.rank_over_range(pinned, 35.0).first()
    assert got["n"] == want["n"]
    assert abs(got["n_le_est"] - want["n_le_est"]) <= max(0.02 * got["n"], 2)
