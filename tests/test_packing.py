"""Sequence-packing gates: python-recompute oracle + packing invariants."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from nyc_taxi_dataset_analysis_apache_hive_spark.operators import packing
from nyc_taxi_dataset_analysis_apache_hive_spark.sources.readers import load_table

SF = "/root/testdata/sf0.001"
BUDGET = 256
N_SHARDS = 8


def _expected(rows):
    """Greedy first-fit recompute in plain Python."""
    by_shard: dict[int, list] = {}
    for doc_id, n in rows:
        shard = (
            int(
                hashlib.md5(f"pack-v1:{doc_id}".encode()).hexdigest()[:15], 16
            )
            % N_SHARDS
        )
        by_shard.setdefault(shard, []).append((doc_id, n))
    out = {}
    for shard, docs in by_shard.items():
        bin_id, used = 0, 0
        for doc_id, n in sorted(docs):
            if used > 0 and used + n > BUDGET:
                bin_id, used = bin_id + 1, 0
            out[doc_id] = (n, shard, bin_id, used)
            used += n
    return out


def test_pack_sequences_matches_python_recompute(spark):
    docs = load_table(spark, SF, "documents")
    sized = [
        (r["doc_id"], r["n"])
        for r in docs.select(
            "doc_id",
            F.size(
                F.filter(
                    F.split(F.lower("text"), "[^a-z0-9]+"), lambda x: x != F.lit("")
                )
            ).cast("long").alias("n"),
        ).collect()
    ]
    got = {
        r["doc_id"]: (r["n_tokens"], r["shard"], r["bin_id"], r["offset"])
        for r in packing.pack_sequences(
            docs, budget=BUDGET, n_shards=N_SHARDS
        ).collect()
    }
    assert got == _expected(sized)


def test_pack_sequences_invariants(spark):
    docs = load_table(spark, SF, "documents")
    packed = packing.pack_sequences(docs, budget=BUDGET, n_shards=N_SHARDS)
    # no document split, none dropped
    assert packed.count() == docs.count()
    per_bin = (
        packed.groupBy("shard", "bin_id")
        .agg(
            F.sum("n_tokens").alias("total"),
            F.count(F.lit(1)).alias("n_docs"),
            F.min("offset").alias("min_off"),
        )
        .collect()
    )
    for r in per_bin:
        # a bin exceeds the budget only if it holds a single oversized doc
        assert r["total"] <= BUDGET or r["n_docs"] == 1, r
        assert r["min_off"] == 0  # offsets start at 0 per bin
    # offsets are consistent: offset + n_tokens never exceeds the next
    # document's offset within a bin (contiguous packing)
    rows = packed.orderBy("shard", "bin_id", "offset").collect()
    prev = {}
    for r in rows:
        key = (r["shard"], r["bin_id"])
        if key in prev:
            assert r["offset"] == prev[key], r
        else:
            assert r["offset"] == 0
        prev[key] = r["offset"] + r["n_tokens"]


def test_pack_sequences_string_ids_and_null_text(spark):
    """Non-long id columns keep their type in the output schema, and NULL
    text packs as a 0-token atomic row instead of crashing the worker."""
    docs = spark.createDataFrame(
        [("u1", "three little words here"), ("u2", None), ("u3", "more text")],
        "url string, text string",
    )
    rows = {
        r["url"]: (r["n_tokens"], r["bin_id"], r["offset"])
        for r in packing.pack_sequences(
            docs, budget=10, n_shards=1, id_col="url"
        ).collect()
    }
    assert set(rows) == {"u1", "u2", "u3"}
    assert rows["u2"][0] == 0  # null text -> zero tokens, still packed


def test_pack_sequences_partitioning_independent(spark):
    """Same assignments regardless of input partitioning (the md5 shard is
    content-deterministic, and packing order is pinned by doc_id)."""
    docs = load_table(spark, SF, "documents")
    a = {
        r["doc_id"]: (r["shard"], r["bin_id"], r["offset"])
        for r in packing.pack_sequences(
            docs.repartition(3), budget=BUDGET, n_shards=N_SHARDS
        ).collect()
    }
    b = {
        r["doc_id"]: (r["shard"], r["bin_id"], r["offset"])
        for r in packing.pack_sequences(
            docs.repartition(13), budget=BUDGET, n_shards=N_SHARDS
        ).collect()
    }
    assert a == b


def test_pack_sequences_rejects_nonpositive_budget(spark):
    import pytest

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    for bad in (0, -5):
        with pytest.raises(ValueError, match="budget"):
            packing.pack_sequences(docs, budget=bad)
    with pytest.raises(ValueError, match="n_shards"):
        packing.pack_sequences(docs, budget=10, n_shards=0)


def test_packing_stats_hand_computed(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c d"),          # 4 tokens
            (2, "a b c d"),          # 4 tokens -> joins bin 0 (8 <= 10)
            (3, "a b c d"),          # 4 tokens -> overflows, bin 1
            (4, " ".join(["t"] * 15)),  # 15 tokens -> its own oversize bin
        ],
        "doc_id long, text string",
    )
    packed = packing.pack_sequences(docs, budget=10, n_shards=1)
    [row] = packing.packing_stats(packed, budget=10).collect()
    assert row["n_bins"] == 3
    assert row["n_docs"] == 4
    assert row["total_tokens"] == 27
    assert row["fill_rate"] == round(27 / 30, 4)
    assert row["oversize_bins"] == 1
    assert 0 < row["p50_fill"] <= row["p90_fill"] <= 1.5

    import pytest

    with pytest.raises(ValueError, match="budget"):
        packing.packing_stats(packed, budget=0)


def test_packing_audit_all_green_on_corpus(spark):
    """The driver-facing audit row (pl1's packing leg): doc conservation,
    zero token drift across the Arrow boundary, and zero
    capacity/offset/greedy/contiguity violations on the real corpus."""
    docs = load_table(spark, SF, "documents")
    [r] = packing.packing_audit(docs, budget=256, n_shards=8).collect()
    assert r["n_pack_docs"] == docs.count()
    for c in (
        "n_pack_token_drift",
        "n_pack_capacity_viol",
        "n_pack_offset_viol",
        "n_pack_greedy_viol",
        "n_pack_bin_gap_viol",
    ):
        assert r[c] == 0, c


def test_packing_audit_catches_a_broken_packer(spark, monkeypatch):
    """The invariants actually bite: corrupt the packer's output (shift
    every offset, merge two bins) and the audit counters go nonzero --
    proof the driver gate would catch a packing regression, not just
    rubber-stamp it."""
    docs = load_table(spark, SF, "documents").limit(120)
    real = packing.pack_sequences

    def corrupted(d, budget, n_shards=8, id_col="doc_id", token_col=None):
        out = real(d, budget, n_shards, id_col, token_col)
        # offsets shifted by 1 token; bin 1 relabeled into bin 0
        return out.select(
            id_col,
            "n_tokens",
            "shard",
            F.when(F.col("bin_id") == 1, F.lit(0))
            .otherwise(F.col("bin_id"))
            .alias("bin_id"),
            (F.col("offset") + 1).alias("offset"),
        )

    monkeypatch.setattr(packing, "pack_sequences", corrupted)
    [r] = packing.packing_audit(docs, budget=256, n_shards=8).collect()
    assert r["n_pack_offset_viol"] > 0
    assert (
        r["n_pack_capacity_viol"] > 0
        or r["n_pack_bin_gap_viol"] > 0
        or r["n_pack_greedy_viol"] > 0
    )
