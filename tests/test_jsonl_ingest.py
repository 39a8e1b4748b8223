"""JSONL corpus ingest (sources.readers.read_documents_jsonl): schema'd
line-parallel scan with the dead-letter corrupt-record posture -- valid
lines parity with the parquet documents table, corrupt lines quarantined
with the raw text preserved, never dropped or job-fatal."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from nyc_taxi_dataset_analysis_apache_hive_spark.sources.readers import (
    load_table,
    read_documents_jsonl,
)

SF = "/root/testdata/sf0.001"


def test_jsonl_round_trips_the_documents_table(spark, tmp_path):
    docs = load_table(spark, SF, "documents")
    d = str(tmp_path / "jl")
    docs.write.json(d)  # spark's JSONL writer: one object per line
    back = read_documents_jsonl(spark, d).cache()
    try:
        assert back.filter(F.col("_corrupt_record").isNotNull()).count() == 0
        a = sorted(map(tuple, docs.collect()))
        b = sorted(
            map(
                tuple,
                back.drop("_corrupt_record").select(*docs.columns).collect(),
            )
        )
        assert a == b
    finally:
        back.unpersist()


def test_corrupt_lines_quarantine_with_raw_text(spark, tmp_path):
    """One bad byte must cost one row, not the corpus: unparseable lines
    land with data columns NULL and the raw line in _corrupt_record;
    valid neighbours in the same file still parse."""
    d = str(tmp_path / "jl")
    os.makedirs(d)
    lines = [
        json.dumps({"doc_id": 1, "text": "good one", "lang": "en",
                    "source": "s0", "n_chars": 8}),
        '{"doc_id": 2, "text": "truncated',  # unparseable
        "not json at all",
        json.dumps({"doc_id": 3, "text": "also good", "lang": "fr",
                    "source": "s1", "n_chars": 9}),
    ]
    with open(os.path.join(d, "part-0.jsonl"), "w") as f:
        f.write("\n".join(lines) + "\n")
    out = read_documents_jsonl(spark, d).cache()
    try:
        good = out.filter(F.col("_corrupt_record").isNull())
        bad = out.filter(F.col("_corrupt_record").isNotNull())
        assert sorted(
            (r["doc_id"], r["text"]) for r in good.collect()
        ) == [(1, "good one"), (3, "also good")]
        bad_rows = bad.collect()
        assert len(bad_rows) == 2
        assert {r["_corrupt_record"] for r in bad_rows} == {
            '{"doc_id": 2, "text": "truncated',
            "not json at all",
        }
        assert all(r["doc_id"] is None for r in bad_rows)
    finally:
        out.unpersist()


def test_jsonl_scan_prunes_columns(spark, tmp_path):
    """Schema-on-read holds for JSONL too: a doc_id-only projection must
    reach the scan as a one-column ReadSchema."""
    import re

    from nyc_taxi_dataset_analysis_apache_hive_spark.plans.explain import (
        explain_str,
    )

    docs = load_table(spark, SF, "documents")
    d = str(tmp_path / "jl")
    docs.write.json(d)
    plan = explain_str(read_documents_jsonl(spark, d).select("doc_id"))
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m and [c.split(":")[0] for c in m.group(1).split(",") if c] == [
        "doc_id"
    ]
