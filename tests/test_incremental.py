"""Incremental ingest: merged sketch state == from-scratch rebuild
(HLL/theta estimate equality, KLL accuracy), dedup admission semantics
(history + within-batch), and two-step ingest == one-shot ingest."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from nyc_taxi_dataset_analysis_apache_hive_spark.operators import (
    incremental as inc,
)
from nyc_taxi_dataset_analysis_apache_hive_spark.operators import sketches as sk
from nyc_taxi_dataset_analysis_apache_hive_spark.sources.readers import load_table


@pytest.fixture(scope="module")
def events(spark, sf0001_dir):
    return load_table(spark, sf0001_dir, "events")


@pytest.fixture(scope="module")
def halves(events):
    a = events.filter(F.col("event_id") % 2 == 0)
    b = events.filter(F.col("event_id") % 2 == 1)
    return a, b


def test_hll_merge_equals_rebuild(events, halves):
    """Per-period estimates from merged half-rollups EQUAL the estimates
    of a from-scratch rollup (HLL union is associative at fixed lg_k)."""
    a, b = halves
    merged = inc.merge_hll_rollup(
        sk.sketch_rollup(a, "ts", "user_id"),
        sk.sketch_rollup(b, "ts", "user_id"),
    )
    rebuilt = sk.sketch_rollup(events, "ts", "user_id")
    got = {
        r["period"]: (r["n_rows"], r["n_distinct_est"])
        for r in sk.distinct_by_period(merged).collect()
    }
    want = {
        r["period"]: (r["n_rows"], r["n_distinct_est"])
        for r in sk.distinct_by_period(rebuilt).collect()
    }
    assert got == want


def test_theta_merge_equals_rebuild(events, halves):
    a, b = halves
    merged = inc.merge_theta_rollup(
        sk.theta_rollup(a, "event_type", "user_id"),
        sk.theta_rollup(b, "event_type", "user_id"),
    )
    rebuilt = sk.theta_rollup(events, "event_type", "user_id")
    pair = sorted(
        r["part"] for r in rebuilt.select("part").distinct().collect()
    )[:2]
    got = sk.set_overlap(merged, *pair).first().asDict()
    want = sk.set_overlap(rebuilt, *pair).first().asDict()
    assert got == want


def test_kll_merge_accuracy(events, halves):
    """Merged KLL state: exact n preserved, rank estimate within the
    sketch's error budget of the exact filter count."""
    a, b = halves
    merged = inc.merge_kll_rollup(
        sk.quantile_rollup(a, "ts", "value"),
        sk.quantile_rollup(b, "ts", "value"),
    )
    nn = events.filter(F.col("value").isNotNull())
    n = nn.count()
    exact = nn.filter(F.col("value") <= 35.0).count()
    got = sk.rank_over_range(merged, 35.0).first()
    assert got["n"] == n
    assert abs(got["n_le_est"] - exact) <= max(0.02 * n, 2)


@pytest.fixture(scope="module")
def corpus(spark, sf0001_dir):
    docs = load_table(spark, sf0001_dir, "documents")
    return docs.select(
        "doc_id", F.md5("text").alias("fingerprint"), "text"
    ).localCheckpoint()


def test_admit_batch_rejects_history_and_batch_dupes(spark, corpus):
    history = corpus.select("fingerprint")
    base = 10_000_000
    dupe_of_history = corpus.limit(2).select(
        (F.col("doc_id") + base).alias("doc_id"), "fingerprint", "text"
    )
    fresh = spark.createDataFrame(
        [
            (base + 100, "brand new text one"),
            (base + 101, "brand new text two"),
            (base + 102, "brand new text one"),  # within-batch dupe
        ],
        "doc_id long, text string",
    ).select("doc_id", F.md5("text").alias("fingerprint"), "text")
    batch = dupe_of_history.unionByName(fresh)

    admitted = inc.admit_batch(history, batch).collect()
    ids = sorted(r["doc_id"] for r in admitted)
    # history dupes rejected; within-batch dupe keeps the SMALLEST doc_id
    assert ids == [base + 100, base + 101]


def test_ingest_twice_equals_once_and_is_idempotent(spark, corpus):
    """Folding batch A then batch B gives the same accepted set and the
    same sketch state as folding A∪B in one step; re-feeding a batch
    admits nothing."""
    docs = corpus.withColumn(
        "ts", F.to_timestamp(F.lit("2024-01-15 12:00:00"))
    ).withColumn("value", F.col("doc_id").cast("double"))
    a = docs.filter(F.col("doc_id") % 2 == 0)
    b = docs.filter(F.col("doc_id") % 2 == 1)

    empty_fps = spark.createDataFrame([], "fingerprint string")
    empty_hll = spark.createDataFrame(
        [], "period timestamp, n_rows long, sketch binary"
    )

    r1 = inc.ingest_batch(
        empty_fps, a, hll_state=empty_hll, hll_key_col="fingerprint"
    )
    r2 = inc.ingest_batch(
        r1.fingerprints.localCheckpoint(),
        b,
        hll_state=r1.hll_rollup.localCheckpoint(),
        hll_key_col="fingerprint",
    )
    once = inc.ingest_batch(
        empty_fps, docs, hll_state=empty_hll, hll_key_col="fingerprint"
    )

    stepwise = {
        r["period"]: (r["n_rows"], r["n_distinct_est"])
        for r in sk.distinct_by_period(r2.hll_rollup).collect()
    }
    oneshot = {
        r["period"]: (r["n_rows"], r["n_distinct_est"])
        for r in sk.distinct_by_period(once.hll_rollup).collect()
    }
    # row counts are exact state and must agree; estimates may differ by
    # the sketch's own error once it leaves sparse mode (~500 distinct at
    # lg_k=12 sits right on that boundary), so both paths are gated
    # against the exact distinct count instead of each other
    assert stepwise.keys() == oneshot.keys()
    exact = {
        r["period"]: r["n"]
        for r in docs.groupBy(F.date_trunc("day", "ts").alias("period"))
        .agg(F.countDistinct("fingerprint").alias("n"))
        .collect()
    }
    for p, n in exact.items():
        assert stepwise[p][0] == oneshot[p][0]
        assert abs(stepwise[p][1] - n) <= max(0.05 * n, 2)
        assert abs(oneshot[p][1] - n) <= max(0.05 * n, 2)
    assert r2.fingerprints.count() == once.fingerprints.count()

    refeed = inc.ingest_batch(r2.fingerprints, a)
    assert refeed.accepted.count() == 0


def test_admit_batch_order_col_parameterized(spark):
    """Batches without a doc_id column name their own deterministic
    tiebreak; a missing order_col raises instead of AnalysisException
    deep in the plan."""
    from nyc_taxi_dataset_analysis_apache_hive_spark.operators.incremental import (
        admit_batch,
    )

    history = spark.createDataFrame([("h1",)], "fingerprint string")
    batch = spark.createDataFrame(
        [("f1", 30), ("f1", 10), ("f2", 20), ("h1", 5)],
        "fingerprint string, item_id int",
    )
    got = {
        (r["fingerprint"], r["item_id"])
        for r in admit_batch(
            history, batch, order_col="item_id"
        ).collect()
    }
    assert got == {("f1", 10), ("f2", 20)}  # first-by-item_id, history dropped
    with pytest.raises(ValueError, match="order_col"):
        admit_batch(history, batch, order_col="doc_id")


def test_fingerprint_history_layout(spark, tmp_path):
    """The persisted fingerprint history is range-sorted (files cover
    narrow disjoint hex slices -> footer min/max prune probes) and
    carries a parquet bloom filter on the fingerprint (file bytes grow
    vs the same data written without one); admission against the
    read-back history equals admission against the in-memory frame."""
    import glob
    import os

    from pyspark.sql import functions as F

    from nyc_taxi_dataset_analysis_apache_hive_spark.operators.incremental import (
        admit_batch,
        write_fingerprint_history,
    )

    fps = spark.range(5000).select(
        F.md5(F.col("id").cast("string")).alias("fingerprint")
    )
    with_bloom = str(tmp_path / "hist_bloom")
    write_fingerprint_history(fps, with_bloom, n_files=4, expected_ndv=5000)
    no_bloom = str(tmp_path / "hist_plain")
    (
        fps.repartitionByRange(4, "fingerprint")
        .sortWithinPartitions("fingerprint")
        .write.parquet(no_bloom)
    )

    def total_bytes(p):
        return sum(
            os.path.getsize(f) for f in glob.glob(os.path.join(p, "*.parquet"))
        )

    assert total_bytes(with_bloom) > total_bytes(no_bloom)

    # range layout: per-file hex slices are disjoint (sorted files)
    import pyarrow.parquet as pq

    ranges = []
    for f in sorted(glob.glob(os.path.join(with_bloom, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        st = md.row_group(0).column(0).statistics
        lo = st.min
        hi = md.row_group(md.num_row_groups - 1).column(0).statistics.max
        ranges.append((lo, hi))
    ranges.sort()
    for (_, hi_prev), (lo_next, _) in zip(ranges, ranges[1:]):
        assert hi_prev <= lo_next, "files must cover disjoint sorted slices"

    # admission parity: read-back history behaves like the in-memory one
    back = spark.read.parquet(with_bloom)
    batch = spark.range(4990, 5010).select(
        F.md5(F.col("id").cast("string")).alias("fingerprint"),
        F.col("id").alias("doc_id"),
    )
    got = {r["doc_id"] for r in admit_batch(back, batch).collect()}
    want = {r["doc_id"] for r in admit_batch(fps, batch).collect()}
    assert got == want == set(range(5000, 5010))


class TestNearDupAdmission:
    """admit_batch_neardup: sketch-state near-duplicate admission."""

    def _docs(self, spark, rows):
        from pyspark.sql import Row

        return spark.createDataFrame(
            [Row(doc_id=i, text=t) for i, t in rows]
        )

    BASE = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lam mu nu xi omicron pi rho sigma tau upsilon "
        "one two three four five six seven eight nine ten "
        "eleven twelve thirteen fourteen fifteen sixteen "
        "seventeen eighteen nineteen twenty"
    )

    def test_planted_near_dup_rejected_novel_admitted(self, spark):
        from nyc_taxi_dataset_analysis_apache_hive_spark.operators import (
            incremental,
        )

        history = self._docs(spark, [(0, self.BASE), (2, "completely other words here beyond anything shared at all")])
        batch = self._docs(
            spark,
            [
                (101, self.BASE),  # exact copy of doc 0
                (103, self.BASE + " appended"),  # near copy (J ~ 0.97)
                (105, "wholly novel content nothing in common with corpus text stream"),
            ],
        )
        out = {
            r["doc_id"]: r
            for r in incremental.admit_batch_neardup(history, batch).collect()
        }
        assert set(out) == {101, 103, 105}
        # exact copy: identical signatures -> agreement 1.0, rejected
        assert out[101]["match_id"] == 0
        assert out[101]["sig_agreement"] == 1.0
        assert out[101]["admitted"] is False
        # near copy: high agreement, rejected, matched to doc 0
        assert out[103]["match_id"] == 0
        assert out[103]["sig_agreement"] >= 0.5
        assert out[103]["admitted"] is False
        # novel: no band collision -> NULL match, admitted
        assert out[105]["match_id"] is None
        assert out[105]["sig_agreement"] is None
        assert out[105]["admitted"] is True

    def test_persisted_signature_store_path_is_equivalent(self, spark, tmp_path):
        """The production path: history signatures computed once,
        persisted, and passed as history_sigs -- identical verdicts to
        deriving them from history text."""
        from nyc_taxi_dataset_analysis_apache_hive_spark.operators import (
            dedup,
            incremental,
        )

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        history = docs.filter("doc_id % 4 != 1")
        batch = docs.filter("doc_id % 4 = 1")
        store = str(tmp_path / "sig_store")
        dedup.minhash_signatures(history, 16, 3).write.parquet(store)
        from_text = sorted(
            map(tuple, incremental.admit_batch_neardup(history, batch).collect())
        )
        from_store = sorted(
            map(
                tuple,
                incremental.admit_batch_neardup(
                    None, batch, history_sigs=spark.read.parquet(store)
                ).collect(),
            )
        )
        assert from_text == from_store and from_text

    def test_threshold_controls_admission(self, spark):
        from nyc_taxi_dataset_analysis_apache_hive_spark.operators import (
            incremental,
        )

        history = self._docs(spark, [(0, self.BASE)])
        batch = self._docs(spark, [(101, self.BASE.replace("kappa", "zz"))])
        loose = incremental.admit_batch_neardup(
            history, batch, agreement_threshold=1.01
        ).collect()[0]
        assert loose["admitted"] is True  # nothing reaches > 1.0
        strict = incremental.admit_batch_neardup(
            history, batch, agreement_threshold=0.05
        ).collect()[0]
        assert strict["admitted"] is False

    def test_requires_some_history_input(self, spark):
        import pytest as _pytest

        from nyc_taxi_dataset_analysis_apache_hive_spark.operators import (
            incremental,
        )

        with _pytest.raises(ValueError):
            incremental.admit_batch_neardup(
                None, self._docs(spark, [(1, "a b c")])
            )
