"""Two-sample KS drift (sketches.exact_ks_pairs / ks_drift): hand
goldens, a planted distribution shift that MUST be detected, the
null case, a python recompute over real data, and the sketch gate."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from nyc_taxi_dataset_analysis_apache_hive_spark.operators import sketches


def _df(spark, groups):
    rows = [
        Row(g=g, v=float(v)) for g, vals in groups.items() for v in vals
    ]
    return spark.createDataFrame(rows)


def test_hand_golden(spark):
    out = sketches.exact_ks_pairs(
        _df(spark, {"a": [1, 2, 3], "b": [2, 3, 4]}), "g", "v"
    ).collect()
    assert len(out) == 1
    r = out[0]
    # grid {1,2,3,4}: F_a = 1/3, 2/3, 1, 1; F_b = 0, 1/3, 2/3, 1
    assert (r["g1"], r["g2"], r["n_grid"]) == ("a", "b", 4)
    assert r["ks"] == pytest.approx(1.0 / 3.0, abs=1e-12)


def test_identical_distributions_have_zero_ks(spark):
    vals = list(range(1, 30))
    r = sketches.exact_ks_pairs(
        _df(spark, {"a": vals, "b": vals}), "g", "v"
    ).collect()[0]
    assert r["ks"] == 0.0


def test_planted_shift_is_detected(spark):
    """Disjoint-by-half supports: uniform 1..100 vs 51..150 has exact
    KS 0.5 -- the drift case the monitor exists to catch."""
    r = sketches.ks_drift(
        _df(spark, {"a": range(1, 101), "b": range(51, 151)}),
        "g",
        "v",
        grid=[float(v) for v in range(1, 151, 2)],
    ).collect()[0]
    assert r["ks"] == pytest.approx(0.5, abs=1e-12)
    assert r["ks_sketch"] == pytest.approx(0.5, abs=0.05)
    assert r["approx_ok"]


def test_exact_matches_python_recompute_on_lineitem(spark, sf0001_dir):
    li = spark.read.parquet(f"{sf0001_dir}/lineitem.parquet")
    got = {
        (r["g1"], r["g2"]): r["ks"]
        for r in sketches.exact_ks_pairs(
            li, "l_returnflag", "l_quantity"
        ).collect()
    }
    rows = li.select("l_returnflag", "l_quantity").collect()
    by_g: dict = {}
    for r in rows:
        by_g.setdefault(r["l_returnflag"], []).append(r["l_quantity"])
    grid = sorted({r["l_quantity"] for r in rows})
    for (g1, g2), ks in got.items():
        a, b = sorted(by_g[g1]), sorted(by_g[g2])
        expected = max(
            abs(
                sum(1 for x in a if x <= v) / len(a)
                - sum(1 for x in b if x <= v) / len(b)
            )
            for v in grid
        )
        assert ks == pytest.approx(expected, abs=1e-12), (g1, g2)
    assert set(got) == {("A", "N"), ("A", "R"), ("N", "R")}


def test_sketch_gate_holds_on_real_data(spark, sf0001_dir):
    li = spark.read.parquet(f"{sf0001_dir}/lineitem.parquet")
    out = sketches.ks_drift(
        li, "l_returnflag", "l_quantity", grid=[float(v) for v in range(1, 51)]
    ).collect()
    assert len(out) == 3 and all(r["approx_ok"] for r in out)


def test_null_groups_and_values_are_excluded(spark):
    """NULL keys would sort NULLS FIRST in Spark's cumulative window but
    NULLS LAST in DuckDB's -- so they are excluded explicitly on every
    surface (heavy-hitters convention), and CDFs still reach exactly 1.0
    over the filtered universe."""
    rows = (
        [Row(g="a", v=float(v)) for v in (1, 2, 3)]
        + [Row(g="b", v=float(v)) for v in (1, 2, 4)]
        + [Row(g=None, v=1.0), Row(g="a", v=None), Row(g="b", v=None)]
    )
    out = sketches.exact_ks_pairs(spark.createDataFrame(rows), "g", "v").collect()
    assert len(out) == 1
    r = out[0]
    assert (r["g1"], r["g2"]) == ("a", "b")
    # same statistic as the NULL-free input: grid {1,2,3,4},
    # F_a = 1/3, 2/3, 1, 1; F_b = 1/3, 2/3, 2/3, 1 -> ks = 1/3
    assert r["ks"] == pytest.approx(1.0 / 3.0, abs=1e-12)
