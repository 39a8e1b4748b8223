"""Domain mixing: exact python-recompute parity (md5 draw + copy counts),
determinism/append-stability, share convergence, and plan shape (the
corpus must not shuffle)."""

from __future__ import annotations

import hashlib

import pytest

from pyspark.sql import functions as F

from nyc_taxi_dataset_analysis_apache_hive_spark.operators import sampling
from nyc_taxi_dataset_analysis_apache_hive_spark.sources.readers import load_table


def _u(salt: str, doc_id: int) -> float:
    h = hashlib.md5(f"{salt}:{doc_id}".encode()).hexdigest()
    return int(h[:15], 16) / float(16**15)


def _expected_copies(pdf, weights, target_rows, salt="mix-v1"):
    total_w = sum(weights.values())
    dom_n = pdf.groupby("source")["doc_id"].count().to_dict()
    out = {}
    for r in pdf.itertuples():
        if r.source not in weights:
            continue
        ratio = (weights[r.source] / total_w) * target_rows / dom_n[r.source]
        base = int(ratio // 1)
        extra = 1 if _u(salt, r.doc_id) < ratio - base else 0
        if base + extra > 0:
            out[r.doc_id] = base + extra
    return out


@pytest.fixture(scope="module")
def docs(spark, sf0001_dir):
    return load_table(spark, sf0001_dir, "documents")


WEIGHTS = {"src0": 4.0, "src1": 1.0, "src2": 1.0}  # src3..19 dropped


def test_mix_domains_matches_python_recompute(spark, docs):
    got = (
        sampling.mix_domains(docs, "source", WEIGHTS, target_rows=120)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    got = {r["doc_id"]: r["n"] for r in got}
    want = _expected_copies(
        docs.select("doc_id", "source").toPandas(), WEIGHTS, 120
    )
    assert got == want


def test_mix_domains_deterministic_and_append_stable(spark, docs):
    full = {
        (r["doc_id"], r["epoch"])
        for r in sampling.mix_domains(
            docs, "source", {"src0": 1.0}, target_rows=40
        ).collect()
    }
    again = {
        (r["doc_id"], r["epoch"])
        for r in sampling.mix_domains(
            docs, "source", {"src0": 1.0}, target_rows=40
        ).collect()
    }
    assert full == again
    # append-stability: a row's draw depends only on (salt, id) -- the
    # same target/domain-size ratio over a REPARTITIONED input yields the
    # exact same copy set
    shuffled = sampling.mix_domains(
        docs.repartition(13), "source", {"src0": 1.0}, target_rows=40
    )
    assert {(r["doc_id"], r["epoch"]) for r in shuffled.collect()} == full


def test_mix_domains_shares_and_upsampling(spark, docs):
    out = sampling.mix_domains(docs, "source", WEIGHTS, target_rows=600)
    by_dom = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert set(by_dom) == set(WEIGHTS)
    total = sum(by_dom.values())
    assert total == pytest.approx(600, rel=0.15)
    # src0 gets 4x the share of src1; each domain holds 25 docs, so src0
    # (target 400) MUST up-sample: epochs beyond 0 exist
    assert by_dom["src0"] > 3 * by_dom["src1"] * 0.8
    assert out.filter((F.col("source") == "src0") & (F.col("epoch") > 0)).count() > 0
    # every (doc, epoch) pair unique -- replication is indexed, not duplicated
    assert (
        out.groupBy("doc_id", "epoch").count().filter(F.col("count") > 1).count()
        == 0
    )


def test_mix_domains_corpus_not_shuffled(spark, docs):
    """The per-domain count table broadcasts; the corpus side must show no
    exchange other than the explode's narrow pipeline."""
    plan = (
        sampling.mix_domains(docs, "source", WEIGHTS, target_rows=120)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_null_domain_drops_under_weights_rule(spark):
    """A NULL domain can never be named by the string-keyed weights, so
    its rows drop by the documented absent-from-weights rule (zero
    copies via the weight lookup), not as a join accident -- and named
    domains are unaffected by NULL rows being present."""
    rows = [(i, "a") for i in range(50)] + [
        (1000 + i, None) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, source string")
    out = sampling.mix_domains(
        df, "source", weights={"a": 1.0}, target_rows=50
    )
    got = {r["source"] for r in out.select("source").distinct().collect()}
    assert got == {"a"}
    assert out.filter(F.col("source").isNull()).count() == 0
    assert abs(out.count() - 50) <= 15
