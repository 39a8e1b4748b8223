"""Temperature-based domain rebalancing (sampling.temperature_mix):
alpha-limit laws (alpha=1 -> natural shares, alpha=0 -> uniform), the
low-resource up-weighting direction, partitioning invariance, and the
expected-size identity."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from nyc_taxi_dataset_analysis_apache_hive_spark.operators import sampling


@pytest.fixture(scope="module")
def skewed(spark):
    # 120 / 30 / 10: a 12x spread between high- and low-resource domains
    rows = (
        [Row(doc_id=i, dom="big") for i in range(120)]
        + [Row(doc_id=1000 + i, dom="mid") for i in range(30)]
        + [Row(doc_id=2000 + i, dom="small") for i in range(10)]
    )
    return spark.createDataFrame(rows)


def _rates(df, out):
    n_in = {r["dom"]: r["n"] for r in df.groupBy("dom").agg(F.count("*").alias("n")).collect()}
    n_out = {r["dom"]: r["n"] for r in out.groupBy("dom").agg(F.count("*").alias("n")).collect()}
    return {d: n_out.get(d, 0) / n_in[d] for d in n_in}


def test_alpha_one_keeps_natural_shares(spark, skewed):
    """alpha=1: w_d = n_d/N, so every domain's expected copy rate is the
    SAME (target/N) -- natural proportions survive."""
    out = sampling.temperature_mix(skewed, "dom", alpha=1.0, target_rows=160)
    rates = _rates(skewed, out)
    # expected rate 160/160 = 1.0 everywhere; Bernoulli noise is per-row
    for d, r in rates.items():
        assert abs(r - 1.0) <= 0.2, (d, rates)


def test_alpha_zero_is_uniform_over_domains(spark, skewed):
    """alpha=0: every domain gets weight 1/K, so expected per-domain
    OUTPUT size is target/K regardless of input size."""
    out = sampling.temperature_mix(skewed, "dom", alpha=0.0, target_rows=90)
    n_out = {r["dom"]: r["n"] for r in out.groupBy("dom").agg(F.count("*").alias("n")).collect()}
    for d in ("big", "mid", "small"):
        assert abs(n_out.get(d, 0) - 30) <= 8, n_out


def test_alpha_half_upweights_low_resource(spark, skewed):
    """0 < alpha < 1 sits between the limits: the smallest domain's copy
    RATE must exceed the biggest domain's."""
    out = sampling.temperature_mix(skewed, "dom", alpha=0.5, target_rows=160)
    rates = _rates(skewed, out)
    assert rates["small"] > rates["big"], rates
    # and the exact expected ratio: w_small/w_big = (10/120)^0.5
    expected = math.sqrt(10.0 / 120.0)
    # realized rate ratio tracks (w_small/n_small)/(w_big/n_big)
    # = (n_small/n_big)^(alpha-1) = (1/12)^(-0.5) ~ 3.46
    assert 2.0 < rates["small"] / rates["big"] < 5.5, rates


def test_partitioning_invariance(spark, skewed):
    base = sorted(
        map(tuple, sampling.temperature_mix(skewed, "dom", 0.5, 160).collect())
    )
    repart = sorted(
        map(
            tuple,
            sampling.temperature_mix(
                skewed.repartition(7), "dom", 0.5, 160
            ).collect(),
        )
    )
    assert base == repart


def test_epoch_indices_are_contiguous_from_zero(spark, skewed):
    out = sampling.temperature_mix(skewed, "dom", alpha=0.0, target_rows=600)
    per_doc = (
        out.groupBy("doc_id")
        .agg(F.count("*").alias("n"), F.min("epoch").alias("lo"), F.max("epoch").alias("hi"))
        .collect()
    )
    assert per_doc
    for r in per_doc:
        assert r["lo"] == 0 and r["hi"] == r["n"] - 1


def test_null_domain_is_its_own_stratum(spark):
    """NULL domain is a legitimate stratum: it earns its own n^alpha
    weight and resamples like any named domain (null-safe ratio join),
    instead of silently vanishing in a NULL-key equi-join."""
    rows = (
        [Row(doc_id=i, dom="big") for i in range(120)]
        + [Row(doc_id=5000 + i, dom=None) for i in range(30)]
    )
    df = spark.createDataFrame(rows, "doc_id bigint, dom string")
    out = sampling.temperature_mix(df, "dom", alpha=0.0, target_rows=100)
    n_null = out.filter(F.col("dom").isNull()).count()
    n_big = out.filter(F.col("dom") == "big").count()
    # alpha=0 -> uniform weights -> ~50 expected copies per stratum
    assert n_null > 0, "NULL-domain rows were silently dropped"
    assert abs(n_null - 50) <= 20 and abs(n_big - 50) <= 20, (n_null, n_big)
    # schema/columns unchanged: no helper columns leak
    assert out.columns == ["doc_id", "dom", "epoch"]
