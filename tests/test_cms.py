"""Count-Min sketch gates (r15): overestimate law, exact merge law,
geometry discipline, forced collisions at tiny width."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from nyc_taxi_dataset_analysis_apache_hive_spark.operators import sketches
from nyc_taxi_dataset_analysis_apache_hive_spark.sources.readers import load_table

SF = "/root/testdata/sf0.001"


def _exact(df, col):
    return {
        r[col]: r["c"]
        for r in df.filter(F.col(col).isNotNull())
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }


def test_estimate_never_underestimates(spark):
    ev = load_table(spark, SF, "events")
    sk = sketches.cms_build(ev, "event_type")
    exact = _exact(ev, "event_type")
    est = {
        r["event_type"]: r["est"]
        for r in sketches.cms_estimate(
            sk, ev.select("event_type").distinct(), "event_type"
        ).collect()
    }
    assert set(est) == set(exact)
    for k, c in exact.items():
        assert est[k] >= c


def test_counters_match_python_recompute(spark):
    """The counter table is a pure function of (data, salt family) --
    replayed in plain Python with hashlib, cell for cell (the engine
    portability claim the a10 oracle rides on)."""
    ev = load_table(spark, SF, "events")
    sk = sketches.cms_build(ev, "event_type", depth=3, width=16)
    got = {(r["r"], r["b"]): r["cnt"] for r in sk.counters.collect()}
    want: dict[tuple, int] = {}
    for k, c in _exact(ev, "event_type").items():
        for r in range(3):
            b = (
                int(hashlib.md5(f"cms{r}:{k}".encode()).hexdigest()[:15], 16)
                % 16
            )
            want[(r, b)] = want.get((r, b), 0) + c
    assert got == want


def test_merge_equals_rebuild_exactly(spark):
    """Counters are linear, so merge(build(X), build(Y)) == build(X+Y)
    cell for cell -- the never-rescan maintenance law, EXACT here
    (contrast the HLL incremental leg's in-band gate)."""
    ev = load_table(spark, SF, "events")
    h1 = ev.filter(F.col("event_id") % 2 == 0)
    h2 = ev.filter(F.col("event_id") % 2 == 1)
    merged = sketches.cms_merge(
        sketches.cms_build(h1, "event_type"),
        sketches.cms_build(h2, "event_type"),
    )
    full = sketches.cms_build(ev, "event_type")
    assert sorted(map(tuple, merged.counters.collect())) == sorted(
        map(tuple, full.counters.collect())
    )


def test_merge_geometry_mismatch_raises(spark):
    ev = load_table(spark, SF, "events")
    a = sketches.cms_build(ev, "event_type", depth=4, width=256)
    b = sketches.cms_build(ev, "event_type", depth=4, width=128)
    with pytest.raises(ValueError, match="geometry mismatch"):
        sketches.cms_merge(a, b)
    with pytest.raises(ValueError, match="geometry"):
        sketches.cms_build(ev, "event_type", depth=0)


def test_forced_collisions_still_overestimate(spark):
    """width=2 on the token stream forces every bucket to collide: the
    estimate must inflate (some est > exact) yet never drop below exact
    -- the one-sided error that makes CMS usable as a screen."""
    docs = load_table(spark, SF, "documents")
    toks = docs.select(F.explode(F.split(F.lower("text"), "[^a-z0-9]+")).alias("t")).filter(
        F.col("t") != ""
    )
    sk = sketches.cms_build(toks, "t", depth=2, width=2)
    exact = _exact(toks, "t")
    est = {
        r["t"]: r["est"]
        for r in sketches.cms_estimate(
            sk, toks.select("t").distinct(), "t"
        ).collect()
    }
    assert all(est[k] >= c for k, c in exact.items())
    assert any(est[k] > c for k, c in exact.items()), (
        "width=2 over a multi-key stream must collide somewhere"
    )


def test_null_keys_have_no_draw(spark):
    df = spark.createDataFrame(
        [("a",), ("a",), (None,), ("b",)], "k string"
    )
    sk = sketches.cms_build(df, "k")
    total = sk.counters.agg(F.sum("cnt")).first()[0]
    assert total == 3 * sketches.CMS_DEPTH  # NULL contributed nothing
    est = sketches.cms_estimate(sk, df.select("k").distinct(), "k")
    got = {r["k"]: r["est"] for r in est.collect()}
    assert None not in got
    assert got["a"] == 2 and got["b"] == 1


def test_unseen_key_estimates_collision_mass_only(spark):
    df = spark.createDataFrame([("a",), ("b",)], "k string")
    sk = sketches.cms_build(df, "k")
    probe = spark.createDataFrame([("zzz-unseen",)], "k string")
    est = sketches.cms_estimate(sk, probe, "k").first()["est"]
    assert 0 <= est <= 2  # bounded by the stream size; 0 unless collided


def test_geometry_formula():
    """width = ceil(e/eps), depth = ceil(ln(1/delta)) -- the
    Cormode-Muthukrishnan Theorem 1 sizing, clamped >= 1."""
    import math

    d, w = sketches.cms_geometry(0.001, 0.01)
    assert w == math.ceil(math.e / 0.001) == 2719
    assert d == math.ceil(math.log(100)) == 5
    # clamps and argument validation
    assert sketches.cms_geometry(0.9999, 0.9999) == (1, 3)
    with pytest.raises(ValueError, match="target_eps"):
        sketches.cms_geometry(0.0)
    with pytest.raises(ValueError, match="target_delta"):
        sketches.cms_geometry(0.01, 1.0)


def test_deployment_width_bound_and_merge_law(spark):
    """A cms_geometry-sized sketch (deployment width, >= 2^16 counters
    per row) on a planted heavy-hitter corpus: every key's estimate
    honors the additive bound est <= exact + eps*N -- at this width the
    slack is < 1 count, so the estimates are EXACT -- and the linear
    merge law holds cell for cell at the deployment geometry too (the
    gate-width default would smear the hot key's mass over 256 buckets
    instead)."""
    eps, delta = 1.0 / 40000, 0.01
    depth, width = sketches.cms_geometry(eps, delta)
    assert width >= (1 << 16)
    # planted corpus: one hot key (2000 draws) over a 500-key tail
    rows = [("hot",)] * 2000 + [(f"tail-{i}",) for i in range(500)]
    df = spark.createDataFrame(rows, "k string")
    sk = sketches.cms_build(df, "k", depth=depth, width=width)
    exact = _exact(df, "k")
    n_total = sum(exact.values())
    est = {
        r["k"]: r["est"]
        for r in sketches.cms_estimate(
            sk, df.select("k").distinct(), "k"
        ).collect()
    }
    assert set(est) == set(exact)
    for k, c in exact.items():
        assert c <= est[k] <= c + eps * n_total
    assert eps * n_total < 1  # => every estimate above was exact
    # merge law at the deployment geometry
    h1 = df.filter(F.length("k") % 2 == 0)
    h2 = df.filter(F.length("k") % 2 == 1)
    merged = sketches.cms_merge(
        sketches.cms_build(h1, "k", depth=depth, width=width),
        sketches.cms_build(h2, "k", depth=depth, width=width),
    )
    assert sorted(map(tuple, merged.counters.collect())) == sorted(
        map(tuple, sk.counters.collect())
    )
