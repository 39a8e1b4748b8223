"""PII redaction + repetition-feature gates: hand-crafted goldens, a
no-residual-match property over the corpus, and python recomputes."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from nyc_taxi_dataset_analysis_apache_hive_spark.operators import textops
from nyc_taxi_dataset_analysis_apache_hive_spark.sources.readers import load_table


def test_redact_pii_hand_golden(spark):
    docs = spark.createDataFrame(
        [
            (1, "mail me at jane.doe+x@example.co.uk or bob@test.io thanks"),
            (2, "server 10.0.255.7 and 192.168.1.1 rebooted"),
            (3, "call +1 (415) 555-0199 today"),
            (4, "no pii here at all"),
            (5, None),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in textops.redact_pii(docs).collect()}
    assert rows[1]["n_email"] == 2 and rows[1]["n_ip"] == 0
    assert rows[1]["text_redacted"] == "mail me at <EMAIL> or <EMAIL> thanks"
    assert rows[2]["n_ip"] == 2
    assert rows[2]["text_redacted"] == "server <IP> and <IP> rebooted"
    assert rows[3]["n_phone"] == 1
    assert rows[3]["text_redacted"] == "call <PHONE> today"
    assert rows[4]["text_redacted"] == "no pii here at all"
    assert (rows[4]["n_email"], rows[4]["n_ip"], rows[4]["n_phone"]) == (0, 0, 0)
    assert rows[5]["text_redacted"] is None


def test_redact_pii_no_residual_matches(spark, sf0001_dir):
    """Property over the real corpus + planted rows: after redaction, no
    pattern matches remain (the screens are idempotent/complete)."""
    docs = load_table(spark, sf0001_dir, "documents").select("doc_id", "text")
    planted = docs.limit(5).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" leak a@b.co 1.2.3.4 +12 3456 7890")).alias(
            "text"
        ),
    )
    red = textops.redact_pii(docs.unionByName(planted))
    residual = red.select(
        *[
            F.size(F.regexp_extract_all("text_redacted", F.lit(pat), 0)).alias(name)
            for name, pat, _ in textops.PII_PATTERNS
        ]
    ).agg(*[F.sum(name).alias(name) for name, _, _ in textops.PII_PATTERNS])
    [row] = residual.collect()
    assert all(v == 0 for v in row.asDict().values()), row.asDict()
    # the planted rows were actually counted
    got = red.filter(F.col("doc_id") >= 10_000_000).collect()
    assert all(r["n_email"] >= 1 and r["n_ip"] >= 1 for r in got)


def test_repetition_features_hand_golden(spark):
    text_rep = "Same line.\nSame line.\nOther line!\n\n   \n- bullet one\nTrailing...\n"
    docs = spark.createDataFrame(
        [(1, text_rep), (2, "one line no punct"), (3, "")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in textops.repetition_features(docs).collect()}
    r1 = rows[1]
    # non-empty trimmed lines: Same line. x2, Other line!, - bullet one, Trailing...
    assert r1["n_lines"] == 5
    assert r1["dup_line_frac"] == round(1 - 4 / 5, 4)
    # "Same line." twice, "Other line!", "Trailing..." -> 4 of 5
    assert r1["terminal_punct_line_frac"] == round(4 / 5, 4)
    assert r1["bullet_line_frac"] == round(1 / 5, 4)
    assert r1["ellipsis_line_frac"] == round(1 / 5, 4)
    assert rows[2]["n_lines"] == 1 and rows[2]["dup_line_frac"] == 0.0
    assert rows[2]["terminal_punct_line_frac"] == 0.0
    assert rows[3]["n_lines"] == 0 and rows[3]["dup_line_frac"] == 0.0


def test_repetition_features_python_recompute(spark, sf0001_dir):
    docs = load_table(spark, sf0001_dir, "documents").select("doc_id", "text")
    got = {r["doc_id"]: r for r in textops.repetition_features(docs).collect()}
    raw = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert set(got) == set(raw)
    for doc_id, text in list(raw.items())[:200]:
        lines = [ln.strip() for ln in (text or "").split("\n") if ln.strip()]
        n = len(lines)
        r = got[doc_id]
        assert r["n_lines"] == n, doc_id
        exp_dup = round(1 - len(set(lines)) / n, 4) if n else 0.0
        assert abs(r["dup_line_frac"] - exp_dup) < 1e-9, doc_id
        if n:
            exp_tp = round(
                sum(1 for ln in lines if re.search(r'[.!?"”]$', ln)) / n, 4
            )
            assert abs(r["terminal_punct_line_frac"] - exp_tp) < 1e-9, doc_id
