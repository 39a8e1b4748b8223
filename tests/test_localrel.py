"""functions/localrel.inline_rows: the pure-JVM tiny-relation builder
(literal escaping, type rendering, shape errors, and the no-python
plan guarantee)."""

from __future__ import annotations

import pytest

from nyc_taxi_dataset_analysis_apache_hive_spark.functions.localrel import (
    inline_rows,
)


def test_types_and_values_round_trip(spark):
    df = inline_rows(
        spark,
        ("s", "i", "f", "b", "z"),
        [("a", 1, 1.5, True, None), ("b", -2, -0.25, False, None)],
    )
    rows = sorted(map(tuple, df.collect()))
    assert rows == [("a", 1, 1.5, True, None), ("b", -2, -0.25, False, None)]
    assert dict(df.dtypes) == {
        "s": "string", "i": "bigint", "f": "double", "b": "boolean",
        "z": "void",
    }


def test_string_escaping(spark):
    tricky = ["it's", "back\\slash", "two''quotes", "per%cent_under"]
    df = inline_rows(spark, ("v",), [(t,) for t in tricky])
    assert sorted(r["v"] for r in df.collect()) == sorted(tricky)


def test_float_literals_round_trip_exactly(spark):
    vals = [0.1, 1e-300, 123456789.123456789, float(2**53 - 1)]
    got = [r["f"] for r in inline_rows(
        spark, ("f",), [(v,) for v in vals]).collect()]
    assert got == vals


def test_shape_and_type_errors(spark):
    with pytest.raises(ValueError, match="non-empty"):
        inline_rows(spark, ("a",), [])
    with pytest.raises(ValueError, match="match cols"):
        inline_rows(spark, ("a", "b"), [(1,)])
    # lists are supported since r17 (driver-trained centroid tables) but
    # only with float/None elements; anything else still raises
    with pytest.raises(TypeError, match="float/None"):
        inline_rows(spark, ("a",), [([1, 2],)])
    with pytest.raises(TypeError, match="no element type"):
        inline_rows(spark, ("a",), [([],)])
    with pytest.raises(TypeError, match="unsupported"):
        inline_rows(spark, ("a",), [({"k": 1},)])


def test_array_literals_round_trip(spark):
    """float/None list literals land as array<double> rows, JVM-only
    (the r17 centroid-table spelling); NaN/±inf spell as typed CASTs
    (their repr would be invalid SQL)."""
    import math

    df = inline_rows(
        spark,
        ("cent_id", "cent_emb"),
        [
            (1, [0.5, None]),
            (2, [1.25, -2.0]),
            (3, [float("nan"), float("inf"), float("-inf")]),
        ],
    )
    rows = {r["cent_id"]: r["cent_emb"] for r in df.collect()}
    assert rows[1] == [0.5, None] and rows[2] == [1.25, -2.0]
    assert math.isnan(rows[3][0])
    assert rows[3][1] == float("inf") and rows[3][2] == float("-inf")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Scan ExistingRDD" not in plan


def test_plan_is_jvm_only(spark):
    df = inline_rows(spark, ("q", "t"), [("q1", "x"), ("q2", "y")])
    plan = df._jdf.queryExecution().executedPlan().toString()
    for op in ("BatchEvalPython", "ArrowEvalPython", "Scan ExistingRDD"):
        assert op not in plan
