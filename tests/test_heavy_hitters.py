"""Misra-Gries heavy hitters (hh1): the candidate-superset guarantee under
adversarial skew with a counter budget genuinely smaller than the key
cardinality, weighted-update unit semantics, exactness of the recount
output, and the plan shape (broadcast candidate semi-join, no cartesian)."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from nyc_taxi_dataset_analysis_apache_hive_spark.operators.sketches import (
    _mg_update,
    heavy_hitters,
)
from nyc_taxi_dataset_analysis_apache_hive_spark.plans.explain import explain_str


def _py_heavy(keys: list[str], phi: float):
    c = Counter(keys)
    n = len(keys)
    return {
        k: (cnt, n, round(cnt / n, 6))
        for k, cnt in c.items()
        if cnt > phi * n
    }


def _zipf_keys() -> list[str]:
    """Deterministic long-tail stream: key_i repeated ~4000/i times
    (n ~= 20,700) -- exactly 3 true heavy hitters at phi=0.05 (4000,
    2000, 1333 > 1035) over 100 distinct keys."""
    keys: list[str] = []
    for i in range(1, 101):
        keys.extend([f"k{i:03d}"] * (4000 // i))
    # adversarial ordering: tail first, so the MG counters are full of
    # tail keys before any heavy key arrives
    return sorted(keys, key=lambda s: (s != "k100", s))


def test_mg_update_weighted_semantics():
    """Counter lower-bound invariant: after absorbing a weighted stream
    into k counters, every surviving estimate is within total_decrements
    of truth and any key with freq > n/k survives."""
    counters: dict = {}
    stream = [("a", 50), ("b", 3), ("c", 3), ("d", 3), ("a", 10), ("e", 4)]
    for key, w in stream:
        _mg_update(counters, key, w, k=3)
    truth = Counter()
    for key, w in stream:
        truth[key] += w
    n = sum(truth.values())
    assert "a" in counters  # 60 > 73/3
    for key, est in counters.items():
        assert 0 < est <= truth[key]
        assert truth[key] - est <= n // 3


def test_heavy_hitters_exact_under_skew(spark):
    """Zipf stream, phi=0.05 -> counter budget k=21 vs 100 distinct keys:
    the output still equals the exact python recompute (MG prunes, the
    recount restores exactness)."""
    keys = _zipf_keys()
    df = spark.createDataFrame([(k,) for k in keys], "key string").repartition(7)
    got = {
        r["key"]: (r["cnt"], r["n_total"], r["share"])
        for r in heavy_hitters(df, "key", phi=0.05).collect()
    }
    assert got == _py_heavy(keys, 0.05)
    assert len(got) == 3


def test_candidate_pass_genuinely_prunes(spark):
    """The MG summaries surface far fewer candidates than distinct keys
    (the bounded-memory claim is real, not vacuous): <= k per partition."""
    keys = _zipf_keys()
    df = spark.createDataFrame([(k,) for k in keys], "key string").repartition(4)
    src = df.select(F.col("key").cast("string").alias("key"))

    def _candidates(batches):
        import pandas as pd

        counters: dict = {}
        for pdf in batches:
            for key, w in pdf["key"].value_counts().items():
                _mg_update(counters, key, int(w), 11)
        yield pd.DataFrame({"key": list(counters.keys())})

    n_cand = src.mapInPandas(_candidates, "key string").distinct().count()
    assert n_cand <= 11 * 4 < 100  # k per partition, far below cardinality


def test_heavy_hitters_plan_shape(spark):
    df = spark.range(1000).select(
        F.concat(F.lit("k"), (F.col("id") % 5).cast("string")).alias("key")
    )
    plan = explain_str(heavy_hitters(df, "key", phi=0.1))
    # the recount is ONE broadcast left join (candidates tag the rows,
    # non-candidates collapse into a NULL bucket) and the grand total is
    # an unpartitioned window over the tiny grouped relation -- no
    # second scan of the source, no cartesian
    assert "BroadcastHashJoin" in plan
    assert "Window" in plan
    assert "CartesianProduct" not in plan
    # exactly ONE scan feeds the recount side of the plan (the candidate
    # mapInPandas pass is its own job); a separate count(*) scan for the
    # total would show as a second aggregate over the source
    assert plan.count("BroadcastNestedLoopJoin") == 0


# ---- hypothesis: the MG guarantee over arbitrary weighted streams ----

from hypothesis import given, settings, strategies as st  # noqa: E402


@settings(max_examples=300, deadline=None)
@given(
    stream=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),  # key universe 31
            st.integers(min_value=1, max_value=50),  # weight
        ),
        min_size=1,
        max_size=60,
    ),
    k=st.integers(min_value=2, max_value=12),
)
def test_mg_guarantee_on_arbitrary_streams(stream, k):
    """The two invariants the candidate pass relies on, over arbitrary
    weighted streams: (1) any key with true weight > n/k SURVIVES in the
    k-counter summary -- the superset guarantee that makes the recount
    exact; (2) every surviving estimate is a lower bound within n/k of
    truth (Misra-Gries error bound)."""
    counters: dict = {}
    truth = Counter()
    for key, w in stream:
        _mg_update(counters, key, w, k)
        truth[key] += w
    n = sum(truth.values())
    assert len(counters) <= k
    for key, freq in truth.items():
        if freq > n / k:
            assert key in counters, (key, freq, n, k, dict(counters))
    for key, est in counters.items():
        assert 0 < est <= truth[key]
        assert truth[key] - est <= n / k + 1e-9


def test_null_keys_excluded_consistently(spark):
    """pandas value_counts drops NaN in the candidate pass, so NULL keys
    are excluded EXPLICITLY (operator filter + oracle IS NOT NULL): a
    null-heavy column must not surface a null heavy hitter, and the
    non-null keys' counts/shares must be computed over the non-null
    total only."""
    rows = [("a",)] * 60 + [(None,)] * 30 + [("b",)] * 10
    df = spark.createDataFrame(rows, "key string").repartition(3)
    got = {
        r["key"]: (r["cnt"], r["n_total"])
        for r in heavy_hitters(df, "key", phi=0.1).collect()
    }
    assert None not in got
    assert got["a"] == (60, 70)  # total excludes the 30 nulls
    assert got["b"] == (10, 70)  # 10/70 > 0.1 only because nulls excluded
