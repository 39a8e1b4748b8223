"""Empirical scale-curve gate: the dedup/ANN/text scale paths must grow
~linearly in data size, measured across the testdata decades.

Plan-shape tests (test_plans.py) pin the ASYMPTOTICS -- no cartesian
products, banded/bucketed candidate generation, broadcast small sides.
This module measures the CONSTANTS: each scale-path entry is timed at
sf0.001, sf0.01 and sf0.1 on ONE session, and the wall-clock growth across
decades is gated against a super-linearity bound.

Tolerances (generous on purpose -- timing on shared CI hardware):

* sf0.001 -> sf0.1 is 100x the data: linear cost grows <= ~100x, quadratic
  (an accidental all-pairs) grows ~10,000x.  Gate: <= 150x.
* sf0.01 -> sf0.1 is 10x the data: linear <= ~10x (fixed overhead deflates
  the small-sf time, inflating the ratio), quadratic ~100x.  Gate: <= 30x.

A genuinely quadratic regression blows BOTH bounds by more than an order
of magnitude; honest noise does not get near them.
"""

from __future__ import annotations

import time

import pytest

from nyc_taxi_dataset_analysis_apache_hive_spark import registry

#: opt-in heavy suite (driver default-run budget): run via `pytest -m scale`
pytestmark = pytest.mark.scale

#: the entries whose 100-TB story depends on bucketed candidate generation
#: (LSH bands / shingle inverted index / simhash pigeonhole chunks / label
#: propagation / IVF lists / fused single-scan featurizer)
SCALE_PATHS = [
    "d3_minhash_lsh_pairs",
    "d4_ngram_jaccard_pairs",
    "d5_simhash_pairs",
    "d6_dup_clusters",
    "d7_cross_corpus_decontam",
    "k2_ann_lsh_ivf",
    "t1_text_profile",
    "tv1_text_stats",
    "pl1_curation_funnel",
    # r6: the sketch surface carries a shingle-explode exact-verification
    # path (theta legs) that must stay growth-gated like d3-d6
    "a10_distinct_counts",
    # r6: the embedding-dedup surface (sign-bucket near-pairs + the
    # semdedup fold's cell-bounded pair search + CC) is a scale path too
    "k3_embedding_near_pairs",
    # r14: the bloom admission leg (filter build + probe + candidate
    # verify) must stay linear in history + batch
    "d1_dedup_groups",
    # (r7: the boilerplate-span scrub rides tv1 and the frequent-items
    # legs ride a10 -- both already gated above)
]

SF_DIRS = {
    "0.001": "/root/testdata/sf0.001",
    "0.01": "/root/testdata/sf0.01",
    "0.1": "/root/testdata/sf0.1",
}


@pytest.fixture(scope="module")
def curve(spark):
    """{name: {sf: seconds}} -- every scale-path entry timed at each sf,
    smallest decade first (so the big sf runs on a fully warm JVM)."""
    # warm codegen/readers once per decade so the first measured query of
    # a decade doesn't pay its directory's listing/footer costs
    timings: dict[str, dict[str, float]] = {n: {} for n in SCALE_PATHS}
    for dec, ddir in SF_DIRS.items():
        registry.QUERIES["a1_group_count"](spark, ddir).collect()
        for name in SCALE_PATHS:
            t0 = time.perf_counter()
            registry.QUERIES[name](spark, ddir).collect()
            timings[name][dec] = time.perf_counter() - t0
    return timings


@pytest.mark.parametrize("name", SCALE_PATHS)
def test_growth_is_subquadratic_across_two_decades(curve, name):
    """100x the data must cost <= 150x the time (quadratic would be ~10^4x)."""
    t_small, t_big = curve[name]["0.001"], curve[name]["0.1"]
    ratio = t_big / max(t_small, 1e-9)
    assert ratio <= 150.0, (
        f"{name}: sf0.001 -> sf0.1 (100x data) grew {ratio:.1f}x "
        f"({t_small:.3f}s -> {t_big:.3f}s) -- super-linear scale path"
    )


@pytest.mark.parametrize("name", SCALE_PATHS)
def test_growth_is_subquadratic_across_one_decade(curve, name):
    """10x the data must cost <= 30x the time (quadratic would be ~100x)."""
    t_small, t_big = curve[name]["0.01"], curve[name]["0.1"]
    ratio = t_big / max(t_small, 1e-9)
    assert ratio <= 30.0, (
        f"{name}: sf0.01 -> sf0.1 (10x data) grew {ratio:.1f}x "
        f"({t_small:.3f}s -> {t_big:.3f}s) -- super-linear scale path"
    )
