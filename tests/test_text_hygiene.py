"""PII redaction + repetition-feature gates: hand-crafted goldens, a
no-residual-match property over the corpus, python recomputes, and the
staged-count / CRLF / NULL-text regressions the round-3 review caught."""

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
    # staged counting: IPs must NOT also count as phones (review finding)
    assert rows[2]["n_ip"] == 2 and rows[2]["n_phone"] == 0
    assert rows[2]["text_redacted"] == "server <IP> and <IP> rebooted"
    # and a digit-run email local-part counts only as an email
    extra = spark.createDataFrame(
        [(9, "reach 123456789@qq.com now")], "doc_id long, text string"
    )
    [r9] = textops.redact_pii(extra).collect()
    assert (r9["n_email"], r9["n_ip"], r9["n_phone"]) == (1, 0, 0)
    assert rows[3]["n_phone"] == 1
    assert rows[3]["text_redacted"] == "call <PHONE> today"
    assert rows[4]["text_redacted"] == "no pii here at all"
    assert (rows[4]["n_email"], rows[4]["n_ip"], rows[4]["n_phone"]) == (0, 0, 0)
    # NULL text: NULL redacted output, ZERO counts (never a -1 sentinel)
    assert rows[5]["text_redacted"] is None
    assert (rows[5]["n_email"], rows[5]["n_ip"], rows[5]["n_phone"]) == (0, 0, 0)


def test_phone_pattern_never_crosses_lines(spark):
    """Digit runs on consecutive lines (numeric tables, IDs) must redact
    per-line, never collapse into one cross-line <PHONE> (the \\s-in-class
    over-redaction the round-3 advice flagged)."""
    table = "row totals:\n415 555 0199\n415 555 0142\n2024 2025 2026"
    docs = spark.createDataFrame([(1, table)], "doc_id long, text string")
    [r] = textops.redact_pii(docs).collect()
    # three separate per-line matches, and every newline survives
    assert r["n_phone"] == 3
    assert r["text_redacted"] == "row totals:\n<PHONE>\n<PHONE>\n<PHONE>"


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
            for name, pat, *_ in textops.PII_PATTERNS
        ]
    ).agg(*[F.sum(name).alias(name) for name, *_ in textops.PII_PATTERNS])
    [row] = residual.collect()
    assert all(v == 0 for v in row.asDict().values()), row.asDict()
    # the planted rows were actually counted
    got = red.filter(F.col("doc_id") >= 10_000_000).collect()
    assert all(r["n_email"] >= 1 and r["n_ip"] >= 1 for r in got)


def test_repetition_features_hand_golden(spark):
    text_rep = "Same line.\nSame line.\nOther line!\n\n   \n- bullet one\nTrailing...\n"
    docs = spark.createDataFrame(
        [
            (1, text_rep),
            (2, "one line no punct"),
            (3, ""),
            (4, "A.\r\nA.\r\n\r\nB.\r\n"),  # CRLF (review finding)
            (5, None),
        ],
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
    # CRLF text: \r stripped, blank CRLF line dropped
    r4 = rows[4]
    assert r4["n_lines"] == 3
    assert r4["dup_line_frac"] == round(1 - 2 / 3, 4)
    assert r4["terminal_punct_line_frac"] == 1.0
    # NULL text behaves as empty, not a -1 sentinel
    assert rows[5]["n_lines"] == 0 and rows[5]["dup_line_frac"] == 0.0


def test_repetition_features_python_recompute(spark, sf0001_dir):
    docs = load_table(spark, sf0001_dir, "documents").select("doc_id", "text")
    got = {r["doc_id"]: r for r in textops.repetition_features(docs).collect()}
    raw = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert set(got) == set(raw)
    for doc_id, text in list(raw.items())[:200]:
        lines = [ln.strip() for ln in re.split(r"\r?\n", text or "") if ln.strip()]
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


def test_hygiene_features_fused_equals_standalone(spark, sf0001_dir):
    """The fused one-scan featuriser must equal the join of the two
    standalone operators -- and actually scan the corpus ONCE."""
    from nyc_taxi_dataset_analysis_apache_hive_spark.plans.explain import (
        explain_str,
    )

    docs = load_table(spark, sf0001_dir, "documents").select("doc_id", "text")
    fused = textops.hygiene_features(docs)
    joined = textops.repetition_features(docs).join(
        textops.redact_pii(docs), "doc_id"
    )
    f_rows = sorted(tuple(r) for r in fused.select(*sorted(fused.columns)).collect())
    j_rows = sorted(
        tuple(r) for r in joined.select(*sorted(fused.columns)).collect()
    )
    assert f_rows == j_rows
    scans = re.findall(r"\(\d+\) Scan parquet", explain_str(fused))
    assert len(scans) == 1
