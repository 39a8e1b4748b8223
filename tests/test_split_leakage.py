"""Cross-split contamination audit (sampling.split_leakage_report): the
grouped split shows zero cross-boundary pairs by construction, a per-doc
split over the same dup structure shows the leakage the audit exists to
catch, and unassigned pair members surface as a (NULL, NULL) row."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from nyc_taxi_dataset_analysis_apache_hive_spark.operators import dedup, sampling


def _corpus_with_dups(spark):
    # 300 docs; dup clusters {i, i+1000} for i in 0..59 -> 60 near-dup pairs
    ids = [Row(doc_id=i) for i in range(300)] + [
        Row(doc_id=i + 1000) for i in range(60)
    ]
    pairs = spark.createDataFrame(
        [Row(doc_a=i, doc_b=i + 1000) for i in range(60)]
    )
    return spark.createDataFrame(ids), pairs


def test_grouped_split_shows_zero_leakage_and_per_doc_split_leaks(spark):
    ids, pairs = _corpus_with_dups(spark)
    clusters = dedup.connected_components(pairs)
    grouped = sampling.grouped_hash_split(
        ids, clusters.select("doc_id", "cluster_id")
    )
    rep_g = {
        (r["split_lo"], r["split_hi"]): r["n_pairs"]
        for r in sampling.split_leakage_report(grouped, pairs).collect()
    }
    assert sum(rep_g.values()) == 60  # report totals to the pair count
    assert all(lo == hi for lo, hi in rep_g)  # zero cross-split pairs

    per_doc = sampling.hash_split(ids, "doc_id").select("doc_id", "split_id")
    rep_d = {
        (r["split_lo"], r["split_hi"]): r["n_pairs"]
        for r in sampling.split_leakage_report(per_doc, pairs).collect()
    }
    assert sum(rep_d.values()) == 60
    # independent md5 draws across a pair: expect ~1-2*(0.8^2+0.1^2+0.1^2)
    # = ~34% crossing of 60 pairs; require the audit to SEE some
    assert sum(n for (lo, hi), n in rep_d.items() if lo != hi) > 0


def test_examples_are_deterministic_min_pairs(spark):
    split_df = spark.createDataFrame(
        [Row(doc_id=i, split_id=i % 2) for i in range(10)]
    )
    pairs = spark.createDataFrame(
        [Row(doc_a=3, doc_b=4), Row(doc_a=1, doc_b=2), Row(doc_a=5, doc_b=6)]
    )
    rows = sampling.split_leakage_report(split_df, pairs).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["split_lo"], r["split_hi"], r["n_pairs"]) == (0, 1, 3)
    assert (r["example_a"], r["example_b"]) == (1, 2)  # min struct


def test_unassigned_members_land_in_null_row(spark):
    split_df = spark.createDataFrame(
        [Row(doc_id=1, split_id=0), Row(doc_id=2, split_id=0)]
    )
    pairs = spark.createDataFrame(
        [Row(doc_a=1, doc_b=2), Row(doc_a=1, doc_b=99)]  # 99 unassigned
    )
    rows = {
        (r["split_lo"], r["split_hi"]): r["n_pairs"]
        for r in sampling.split_leakage_report(split_df, pairs).collect()
    }
    assert rows == {(0, 0): 1, (None, None): 1}


def test_duplicate_assignment_rows_do_not_inflate_counts(spark):
    """Exact duplicate (id, split) rows -- a split table unioned onto
    itself -- must not fan out through the joins: the report still
    totals to the pair count (r10 ADVICE finding)."""
    split_rows = [Row(doc_id=i, split_id=i % 2) for i in range(10)]
    split_df = spark.createDataFrame(split_rows + split_rows)  # doubled
    pairs = spark.createDataFrame(
        [Row(doc_a=1, doc_b=2), Row(doc_a=2, doc_b=4), Row(doc_a=1, doc_b=3)]
    )
    rows = {
        (r["split_lo"], r["split_hi"]): r["n_pairs"]
        for r in sampling.split_leakage_report(split_df, pairs).collect()
    }
    assert sum(rows.values()) == 3
    assert rows == {(0, 0): 1, (1, 1): 1, (0, 1): 1}


def test_conflicting_assignments_overshoot_loudly(spark):
    """An id with TWO DIFFERENT splits is a broken input; the documented
    outcome is fan-out (total > pair count), never a silent pick."""
    split_df = spark.createDataFrame(
        [Row(doc_id=1, split_id=0), Row(doc_id=1, split_id=1),
         Row(doc_id=2, split_id=0)]
    )
    pairs = spark.createDataFrame([Row(doc_a=1, doc_b=2)])
    total = (
        sampling.split_leakage_report(split_df, pairs)
        .agg(F.sum("n_pairs").alias("t"))
        .collect()[0]["t"]
    )
    assert total == 2  # one real pair seen twice: loud, not hidden


def test_report_plan_never_scans_wide(spark):
    """The audit touches only (id, split) and the pair list -- both id
    joins must stay equi-joins with no cartesian."""
    from nyc_taxi_dataset_analysis_apache_hive_spark.plans.explain import (
        explain_str,
    )

    ids, pairs = _corpus_with_dups(spark)
    split_df = sampling.hash_split(ids, "doc_id").select("doc_id", "split_id")
    plan = explain_str(sampling.split_leakage_report(split_df, pairs))
    assert "CartesianProduct" not in plan
