"""Time-series anomaly operator (operators/anomaly.py) semantics.

Cross-engine value parity for e1's anomaly legs rides the
auto-parametrized oracle gates; these pin the operator contract on a
hand-built series: the leave-self-out baseline, the full-window warmup
cut, the exact zero-variance guard, outage-day densification, and the
hand-computed z values (plus a hypothesis python-replay sweep).
"""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from nyc_taxi_dataset_analysis_apache_hive_spark.operators import anomaly


def _day(i: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1 + i)


@pytest.fixture(scope="module")
def daily(spark):
    # key "a": 7 flat days at 10, then a spike of 100, then 10
    # key "b": constant 5 -> zero variance everywhere
    rows = [("a", _day(i), 10) for i in range(7)]
    rows += [("a", _day(7), 100), ("a", _day(8), 10)]
    rows += [("b", _day(i), 5) for i in range(9)]
    return spark.createDataFrame(rows, "key string, day timestamp, n long")


def test_rolling_warmup_days_absent(daily):
    out = anomaly.rolling_zscores(daily).filter(F.col("key") == "a")
    days = sorted(r["day"].day for r in out.collect())
    # 7-day trailing window -> first scored day is day 8 (index 7)
    assert days == [8, 9]


def test_rolling_zero_variance_is_null_not_inf(daily):
    out = anomaly.rolling_zscores(daily)
    spike = out.filter((F.col("key") == "a") & (F.col("n") == 100)).first()
    # baseline is 7 flat days -> zero variance -> NULL score, NULL flag
    assert spike["score"] is None and spike["flag"] is None
    b = out.filter(F.col("key") == "b").collect()
    assert all(r["score"] is None for r in b)


def test_rolling_leaves_self_out(daily):
    # day 9 (n=10) scores against [10]*6 + [100]: the spike is IN the
    # baseline (so variance > 0), the day itself is NOT
    out = anomaly.rolling_zscores(daily)
    r = out.filter((F.col("key") == "a") & (F.col("n") == 10)).first()
    base = [10] * 6 + [100]
    m = sum(base) / 7
    s = math.sqrt(sum((x - m) ** 2 for x in base) / 6)
    assert r["score"] == pytest.approx(round((10 - m) / s, 6), abs=1e-6)
    assert r["flag"] == 0


def test_global_scores_every_day_and_flags_spike(daily):
    out = anomaly.global_zscores(daily).filter(F.col("key") == "a")
    rows = {r["n"]: r for r in out.collect()}
    assert out.count() == 9
    series = [10] * 7 + [100, 10]
    m = sum(series) / 9
    s = math.sqrt(sum((x - m) ** 2 for x in series) / 8)
    assert rows[100]["score"] == pytest.approx(round((100 - m) / s, 6))
    assert rows[100]["flag"] == 1
    assert rows[10]["flag"] == 0


def test_global_single_day_key_is_null(spark):
    one = spark.createDataFrame(
        [("x", _day(0), 3)], "key string, day timestamp, n long"
    )
    r = anomaly.global_zscores(one).first()
    assert r["score"] is None and r["flag"] is None


def test_daily_counts_shape(spark, sf0001_dir):
    from nyc_taxi_dataset_analysis_apache_hive_spark.sources.readers import load_table

    ev = load_table(spark, sf0001_dir, "events")
    d = anomaly.daily_counts(ev)
    assert d.columns == ["key", "day", "n"]
    total = d.agg(F.sum("n")).first()[0]
    assert total == ev.count()


def test_outage_days_are_scored_and_flagged(spark):
    # 7 jittered days (variance > 0), then a 3-day OUTAGE (no rows at
    # all -- the count aggregate emits nothing), then resume.  The
    # densified monitor must materialize the missing days as n=0 and
    # flag them; without densification they would be invisible and the
    # trailing window would silently span the gap (the r16 review
    # finding this test pins).
    counts = [50, 52, 48, 51, 49, 50, 53]
    rows = [("a", _day(i), c) for i, c in enumerate(counts)]
    rows.append(("a", _day(10), 50))
    daily = spark.createDataFrame(rows, "key string, day timestamp, n long")
    out = anomaly.rolling_zscores(daily)
    by_day = {r["day"].day: r for r in out.collect()}
    # the gap days 8..10 (index 7..9) exist as rows with n=0
    for d in (8, 9, 10):
        assert d in by_day, f"outage day {d} missing from monitor output"
        assert by_day[d]["n"] == 0
    # the first outage day scores against the jittered baseline:
    # hugely negative z, flagged
    assert by_day[8]["score"] < -2
    assert by_day[8]["flag"] == 1


def test_flat_baseline_outage_yields_null_not_flag(spark):
    # a perfectly flat baseline has zero variance: the exact guard
    # yields NULL (no z is computable), never a division blow-up
    rows = [("a", _day(i), 50) for i in range(7)]
    rows.append(("a", _day(9), 50))
    daily = spark.createDataFrame(rows, "key string, day timestamp, n long")
    out = anomaly.rolling_zscores(daily)
    gap = {r["day"].day: r for r in out.filter(F.col("n") == 0).collect()}
    assert set(gap) == {8, 9}  # both outage days zero-filled
    # day 8 scores against the flat-50 window: zero variance -> NULL
    assert gap[8]["score"] is None and gap[8]["flag"] is None
    # day 9's window now CONTAINS the day-8 zero (variance > 0), so the
    # continued outage is scored and flagged
    assert gap[9]["score"] < -2 and gap[9]["flag"] == 1


def test_densify_is_noop_on_contiguous_series(daily):
    dense = anomaly.densify_daily(daily)
    assert sorted(map(tuple, dense.collect())) == sorted(
        map(tuple, daily.collect())
    )


# ---------------------------------------------------------------------------
# Hypothesis-randomized parity: random sparse series (gaps included)
# against a plain-Python densify + trailing-window replay.
# ---------------------------------------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


def _python_rolling(obs, window=7):
    """obs: {day_index: count}.  Replays densify + leave-self-out
    trailing window + the exact-variance guard + 6-dp round + flag."""
    lo, hi = min(obs), max(obs)
    series = [(i, obs.get(i, 0)) for i in range(lo, hi + 1)]
    out = {}
    for pos in range(window, len(series)):
        idx, n = series[pos]
        base = [c for _, c in series[pos - window : pos]]
        m = sum(base) / window
        var = sum((x - m) ** 2 for x in base) / (window - 1)
        if var == 0:
            out[idx] = (n, None, None)
        else:
            z = round((n - m) / math.sqrt(var), 6)
            out[idx] = (n, z, 1 if abs(z) > 2 else 0)
    return out


@settings(max_examples=6, deadline=None, derandomize=True)
@given(
    obs=st.dictionaries(
        st.integers(min_value=0, max_value=20),
        st.integers(min_value=1, max_value=100),
        min_size=1,
        max_size=15,
    )
)
def test_hypothesis_rolling_matches_python(spark, obs):
    rows = [("k", _day(i), c) for i, c in obs.items()]
    daily = spark.createDataFrame(rows, "key string, day timestamp, n long")
    got = {
        r["day"].day - 1: (r["n"], r["score"], r["flag"])
        for r in anomaly.rolling_zscores(daily).collect()
    }
    want = _python_rolling(obs)
    assert set(got) == set(want)
    for k, (n, z, flag) in want.items():
        gn, gz, gf = got[k]
        assert gn == n and gf == flag
        if z is None:
            assert gz is None
        else:
            assert gz == pytest.approx(z, abs=2e-6)


def test_weekday_view_absorbs_seasonality_global_flags_it(spark):
    # 28 days: busy weekdays (~100, jittered) and quiet "Sundays"
    # (every 7th day, ~20, jittered).  The retrospective global view
    # flags the quiet days as outliers; the weekday view scores each
    # day against its OWN weekday's history and stays calm -- the
    # seasonality-aware monitor that does not page anyone because
    # Sunday is always quiet.
    rows = []
    for i in range(28):
        if i % 7 == 3:
            n = 20 + (i % 3)       # quiet day, small jitter
        else:
            n = 100 + (i * 7) % 5  # busy day, small jitter
        rows.append(("a", _day(i), n))
    daily = spark.createDataFrame(rows, "key string, day timestamp, n long")
    glob = {r["day"].day: r for r in anomaly.global_zscores(daily).collect()}
    week = {r["day"].day: r for r in anomaly.weekday_zscores(daily).collect()}
    quiet_days = [1 + i for i in range(28) if i % 7 == 3]
    assert all(glob[d]["flag"] == 1 for d in quiet_days)
    assert all(week[d]["flag"] == 0 for d in quiet_days)
    # and the busy days are unflagged in both views
    busy = [1 + i for i in range(28) if i % 7 != 3]
    assert all(glob[d]["flag"] == 0 for d in busy)
    assert all(week[d]["flag"] == 0 for d in busy)


def test_weekday_single_sample_is_null(spark):
    # fewer than two samples of a weekday -> exact guard -> NULL
    rows = [("a", _day(i), 10 + i) for i in range(5)]  # < one full week
    daily = spark.createDataFrame(rows, "key string, day timestamp, n long")
    out = anomaly.weekday_zscores(daily).collect()
    assert all(r["score"] is None for r in out)


# ---------------------------------------------------------------------------
# r17: robust (median/MAD) scorer -- the spike-then-outage blind spot
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def spike_then_outage(spark):
    # 17 jittered baseline days (~100), a 100000x spike on day 17, an
    # OUTAGE on day 18 (no row; densify materializes n=0), resume on
    # day 19.  The spike sits inside both z baselines for day 18: it
    # inflates the trailing-7 sigma AND the full-history sigma, so the
    # outage lands far under both 2-sigma lines.
    cycle = [95, 97, 99, 101, 103, 105]
    rows = [("a", _day(i), cycle[i % 6]) for i in range(17)]
    rows += [("a", _day(17), 100000), ("a", _day(19), 100)]
    return spark.createDataFrame(rows, "key string, day timestamp, n long")


def test_classic_z_legs_miss_the_post_spike_outage(spike_then_outage):
    # the documented blind spot: both variance-based views score the
    # outage day and MISS it (spike-inflated sigma), which is exactly
    # why the robust leg exists
    roll = {
        r["day"].day: r
        for r in anomaly.rolling_zscores(spike_then_outage).collect()
    }
    assert roll[19]["n"] == 0  # day index 18 -> Jan 19
    assert roll[19]["flag"] == 0, roll[19]
    glob = {
        r["day"].day: r
        for r in anomaly.global_zscores(spike_then_outage).collect()
    }
    assert glob[19]["n"] == 0
    assert glob[19]["flag"] == 0, glob[19]


def test_robust_flags_both_spike_and_outage(spike_then_outage):
    out = {
        r["day"].day: r
        for r in anomaly.robust_zscores(spike_then_outage).collect()
    }
    # hand-derived exact medians over the 20 densified counts:
    # sorted ranks 10/11 are 99 and 100 -> m2 = 199 (median 99.5);
    # sorted |2n - m2| ranks 10/11 are 5 and 7 -> md4 = 12 (MAD 3)
    assert out[19]["n"] == 0
    assert out[19]["score"] == pytest.approx(
        round(0.6745 * (4 * 0 - 2 * 199) / 12, 6), abs=2e-6
    )
    assert out[19]["flag"] == 1
    assert out[18]["n"] == 100000
    assert out[18]["flag"] == 1
    # an ordinary baseline day stays unflagged (M(105) ~ 1.24)
    assert out[6]["flag"] == 0


def test_robust_zero_mad_is_null(spark):
    # >= half the days at the median -> MAD exactly 0 -> NULL via the
    # integer guard (a spike never forces a division blow-up)
    rows = [("a", _day(i), 50) for i in range(6)] + [("a", _day(6), 9999)]
    out = anomaly.robust_zscores(
        spark.createDataFrame(rows, "key string, day timestamp, n long")
    )
    assert all(
        r["score"] is None and r["flag"] is None for r in out.collect()
    )


def test_robust_single_day_key_is_null(spark):
    one = spark.createDataFrame(
        [("x", _day(0), 3)], "key string, day timestamp, n long"
    )
    r = anomaly.robust_zscores(one).first()
    assert r["score"] is None and r["flag"] is None


def _robust_python(series):
    """Rank-based median/MAD replay of robust_zscores on one dense key."""
    c = len(series)
    svals = sorted(series)
    m2 = svals[(c + 1) // 2 - 1] + svals[(c + 2) // 2 - 1]
    dev2 = sorted(abs(2 * n - m2) for n in series)
    md4 = dev2[(c + 1) // 2 - 1] + dev2[(c + 2) // 2 - 1]
    return [
        None if md4 == 0 else 0.6745 * (4 * n - 2 * m2) / md4
        for n in series
    ]


from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=8, deadline=None, derandomize=True)
@given(
    obs=st.lists(st.integers(min_value=0, max_value=1000), min_size=1,
                 max_size=15)
)
def test_hypothesis_robust_matches_python(spark, obs):
    daily = spark.createDataFrame(
        [("k", _day(i), n) for i, n in enumerate(obs)],
        "key string, day timestamp, n long",
    )
    got = {
        r["day"].day: r["score"]
        for r in anomaly.robust_zscores(daily).collect()
    }
    want = _robust_python(obs)
    for i, w in enumerate(want):
        g = got[1 + i]
        if w is None:
            assert g is None
        else:
            assert g == pytest.approx(w, abs=2e-6)
