"""Incremental SemDeDup admission (similarity.semantic_admit_batch):
hand-computed golden verdicts, zero-norm/NULL/empty-cell policies,
state extension, tie-break determinism, and history_state-path
equivalence (the admit_batch_neardup persisted-signatures precedent)."""

from __future__ import annotations

import math
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StructField,
    StructType,
)

from nyc_taxi_dataset_analysis_apache_hive_spark.operators import similarity

_EMB_SCHEMA = StructType(
    [
        StructField("vec_id", LongType(), False),
        StructField("embedding", ArrayType(FloatType()), True),
    ]
)


def _emb(spark, rows):
    return spark.createDataFrame(
        [(int(i), None if v is None else [float(x) for x in v]) for i, v in rows],
        _EMB_SCHEMA,
    )


@pytest.fixture(scope="module")
def cents(spark):
    return spark.createDataFrame(
        [
            Row(cent_id=100, cent_emb=[1.0, 0.0]),
            Row(cent_id=101, cent_emb=[0.0, 1.0]),
            Row(cent_id=102, cent_emb=[-1.0, 0.0]),
        ]
    )


@pytest.fixture(scope="module")
def history(spark):
    # 10 -> cell 100, 11 -> cell 101; cell 102 stays empty
    return _emb(spark, [(10, [1.0, 0.1]), (11, [0.1, 1.0])])


@pytest.fixture(scope="module")
def batch(spark):
    return _emb(
        spark,
        [
            (20, [1.0, 0.12]),  # near-dup of 10 in cell 100 -> rejected
            (21, [1.0, -1.0]),  # cell 100, far from 10 -> admitted
            (22, [-1.0, 0.0]),  # cell 102 (empty) -> admitted, no match
            (23, [0.0, 0.0]),  # zero-norm -> admitted, NULL cell
            (24, None),  # NULL embedding -> admitted, NULL cell
        ],
    )


def _cos(a, b):
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return round(sum(x / na * y / nb for x, y in zip(a, b)), 6)


def test_admission_golden(spark, cents, history, batch):
    res = similarity.semantic_admit_batch(
        history, batch, threshold=0.9, centroids=cents
    )
    rep = {r["vec_id"]: r for r in res.report.collect()}
    assert set(rep) == {20, 21, 22, 23, 24}
    # 20: best match 10 at cosine ~0.9998 >= 0.9 -> rejected
    assert rep[20]["admitted"] is False
    assert rep[20]["match_id"] == 10
    assert rep[20]["cent_id"] == 100
    assert rep[20]["cosine"] == pytest.approx(
        _cos([1.0, 0.12], [1.0, 0.1]), abs=2e-6
    )
    # 21: same cell, cosine ~0.633 < 0.9 -> admitted WITH its best match
    assert rep[21]["admitted"] is True
    assert rep[21]["match_id"] == 10
    # 22: empty cell -> admitted, cell known, no match
    assert rep[22] ["admitted"] is True
    assert rep[22]["cent_id"] == 102
    assert rep[22]["match_id"] is None and rep[22]["cosine"] is None
    # 23/24: no unit vector -> admitted, NULL cell, no match
    for v in (23, 24):
        assert rep[v]["admitted"] is True
        assert rep[v]["cent_id"] is None
        assert rep[v]["match_id"] is None

    # state = history assignments + admitted DIRECTIONAL batch vectors
    state_ids = {r["vec_id"] for r in res.state.collect()}
    assert state_ids == {10, 11, 21, 22}
    stats = {r["cent_id"]: r["n_vectors"] for r in res.cell_stats.collect()}
    assert stats == {100: 2, 101: 1, 102: 1}


def test_ties_break_to_lowest_history_id(spark, cents):
    history = _emb(spark, [(31, [0.0, 1.0]), (30, [0.0, 1.0])])
    batch = _emb(spark, [(40, [0.0, 2.0])])
    res = similarity.semantic_admit_batch(
        history, batch, threshold=0.999, centroids=cents
    )
    r = res.report.collect()[0]
    assert (r["match_id"], r["admitted"]) == (30, False)


def test_history_state_path_is_equivalent(spark, cents, history, batch):
    """Persisted-state admission (history_state=) must produce the
    identical report and state as on-the-fly history assignment."""
    via_raw = similarity.semantic_admit_batch(
        history, batch, threshold=0.9, centroids=cents
    )
    persisted = similarity.assign_to_centroids(history, cents)
    via_state = similarity.semantic_admit_batch(
        None, batch, threshold=0.9, centroids=cents, history_state=persisted
    )
    key = lambda r: r["vec_id"]  # noqa: E731
    assert sorted(via_raw.report.collect(), key=key) == sorted(
        via_state.report.collect(), key=key
    )
    assert {tuple(r[:2]) for r in via_raw.state.select("vec_id", "cent_id").collect()} == {
        tuple(r[:2]) for r in via_state.state.select("vec_id", "cent_id").collect()
    }


def test_requires_history_or_state_and_centroid_source(spark, cents, batch):
    with pytest.raises(ValueError, match="history"):
        similarity.semantic_admit_batch(None, batch, centroids=cents)
    with pytest.raises(ValueError, match="centroids"):
        similarity.semantic_admit_batch(None, batch, history_state=batch)


def test_admitted_state_feeds_next_batch(spark, cents, history):
    """Sequential admissions: a vector rejected ONLY because batch 1
    admitted its near-copy proves the state actually extends."""
    b1 = _emb(spark, [(21, [1.0, -1.0])])
    res1 = similarity.semantic_admit_batch(
        history, b1, threshold=0.9, centroids=cents
    )
    b2 = _emb(spark, [(50, [1.0, -1.01])])
    res2 = similarity.semantic_admit_batch(
        None,
        b2,
        threshold=0.9,
        centroids=cents,
        history_state=res1.state,
    )
    r = res2.report.collect()[0]
    assert r["admitted"] is False and r["match_id"] == 21


def test_duplicate_batch_ids_keep_multiset_semantics(spark, cents, history):
    """A batch carrying the same vec_id twice (identical payload -- the
    adversarial-corpus shape) must yield exactly TWO report rows (the
    batch multiset, not dup^2 join fanout); the STATE stores one row per
    distinct id (assignment collapses duplicates -- a second identical
    row would only double downstream join work)."""
    batch = _emb(spark, [(21, [1.0, -1.0]), (21, [1.0, -1.0])])
    res = similarity.semantic_admit_batch(
        history, batch, threshold=0.9, centroids=cents
    )
    rows = res.report.collect()
    assert len(rows) == 2
    assert rows[0] == rows[1]
    assert rows[0]["admitted"] is True and rows[0]["match_id"] == 10
    state_rows = [r for r in res.state.collect() if r["vec_id"] == 21]
    assert len(state_rows) == 1


# ---------------------------------------------------------------------------
# Randomized parity against a from-scratch pure-Python reference (the
# test_rrf randomized-parity discipline): integer-valued vectors are
# exactly representable in float32, the fold order of dot/norm matches
# the operator's sequential HOF folds, and round-6 is replicated with
# decimal HALF_UP (Spark's BigDecimal rounding, not Python's
# banker's round) -- so the reference is bit-exact and the assert is
# full equality, ties and degenerate rows included.
# ---------------------------------------------------------------------------

from decimal import ROUND_HALF_UP, Decimal

from hypothesis import given, settings
from hypothesis import strategies as st


def _r6(x):
    if x is None:
        return None
    d = Decimal(repr(x)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)
    return float(d)


def _norm(v):
    return math.sqrt(sum(float(x) * float(x) for x in v))


def _ref_admit(history, batch, cents, threshold):
    """(vec_id -> (cent_id, match_id, cosine, admitted)) from scratch."""

    def unit(v):
        if v is None:
            return None
        n = _norm(v)
        return [float(x) / n for x in v] if n > 0 else None

    def assign(v):
        best = None  # (sim, cent_id); ties keep the earlier (lower) id
        for cid, ce in cents:
            if v is None or ce is None:
                continue
            den = _norm(v) * _norm(ce)
            if den == 0:
                continue
            s = _r6(sum(float(a) * float(b) for a, b in zip(v, ce)) / den)
            if best is None or s > best[0]:
                best = (s, cid)
        return best[1] if best else None

    state = []  # (match_id, cent_id, unit_vec) -- history assignment
    for hid, hv in history:
        u = unit(hv)
        c = assign(hv)
        if u is not None and c is not None:
            state.append((hid, c, u))
    out = {}
    for bid, bv in batch:
        u = unit(bv)
        cell = assign(bv) if u is not None else None
        best = None  # (cosine, match_id): highest cosine, ties lowest id
        if cell is not None:
            for hid, hc, hu in state:
                if hc != cell:
                    continue
                cos = _r6(sum(a * b for a, b in zip(u, hu)))
                if (
                    best is None
                    or cos > best[0]
                    or (cos == best[0] and hid < best[1])
                ):
                    best = (cos, hid)
        out[bid] = (
            cell,
            best[1] if best else None,
            best[0] if best else None,
            best is None or best[0] < threshold,
        )
    return out


_vec = st.one_of(
    st.none(),
    st.lists(
        st.integers(min_value=-3, max_value=3), min_size=3, max_size=3
    ),
)


@settings(max_examples=8, deadline=None, derandomize=True)
@given(
    hvecs=st.lists(_vec, min_size=0, max_size=5),
    bvecs=st.lists(_vec, min_size=1, max_size=5),
    cvecs=st.lists(_vec, min_size=1, max_size=3),
    threshold=st.sampled_from([0.25, 0.5, 0.9]),
)
def test_admission_matches_python_reference(
    spark, hvecs, bvecs, cvecs, threshold
):
    history = [(10 + i, v) for i, v in enumerate(hvecs)]
    batch = [(50 + i, v) for i, v in enumerate(bvecs)]
    cents = [(100 + i, v) for i, v in enumerate(cvecs)]
    cents_df = spark.createDataFrame(
        [(c, None if v is None else [float(x) for x in v]) for c, v in cents],
        "cent_id long, cent_emb array<double>",
    )
    res = similarity.semantic_admit_batch(
        _emb(spark, history),
        _emb(spark, batch),
        threshold=threshold,
        centroids=cents_df,
    )
    got = {
        r["vec_id"]: (r["cent_id"], r["match_id"], r["cosine"], r["admitted"])
        for r in res.report.collect()
    }
    assert got == _ref_admit(history, batch, cents, threshold)


def test_batch_state_hook_is_equivalent(spark, cents, history, batch):
    """batch_state= (a pre-sliced shared assignment pass, the k3 entry's
    posture) must produce the identical report/state as on-the-fly
    batch assignment."""
    direct = similarity.semantic_admit_batch(
        history, batch, threshold=0.9, centroids=cents
    )
    pre = similarity.assign_to_centroids(batch, cents)
    via_hook = similarity.semantic_admit_batch(
        history, batch, threshold=0.9, centroids=cents, batch_state=pre
    )
    key = lambda r: r["vec_id"]  # noqa: E731
    assert sorted(direct.report.collect(), key=key) == sorted(
        via_hook.report.collect(), key=key
    )


def test_semantic_dedup_assigned_hook_is_equivalent(spark, cents, history):
    """semantic_dedup's assigned= compute-once hook: identical clusters
    and keep-list with and without the precomputed assignment."""
    emb = _emb(
        spark,
        [
            (10, [1.0, 0.1]),
            (11, [1.0, 0.11]),
            (12, [0.1, 1.0]),
            (13, [0.0, 0.0]),
        ],
    )
    direct = sorted(
        map(tuple, similarity.semantic_dedup(emb, 0.9, centroids=cents).collect())
    )
    pre = similarity.assign_to_centroids(emb, cents)
    via_hook = sorted(
        map(
            tuple,
            similarity.semantic_dedup(
                emb, 0.9, centroids=cents, assigned=pre
            ).collect(),
        )
    )
    assert direct == via_hook and direct


def test_duplicate_ids_with_different_payloads_are_deterministic(
    spark, cents
):
    """The same id re-emitted with a DIFFERENT embedding collapses to
    one deterministic assignment row: the (cell, embedding) pair
    maximizing (cosine, lowest-cent tie, lexicographically greatest
    embedding) -- never a run-dependent first()."""
    emb = _emb(spark, [(7, [1.0, 0.0]), (7, [0.0, 1.0])])
    rows = similarity.assign_to_centroids(emb, cents).collect()
    assert len(rows) == 1
    # both payloads hit cosine 1.0 in their own cell (cells 100 / 101);
    # tie -> lowest cent_id wins -> cell 100, embedding [1, 0]
    assert rows[0]["cent_id"] == 100
    assert rows[0]["emb_n"] == [1.0, 0.0]


def test_readmitted_id_does_not_duplicate_state(spark, cents, history):
    """An id already in the corpus that re-arrives (changed embedding,
    below threshold vs everything) admits in the REPORT but must not
    create a second state row: the corpus state is append-only keyed by
    vec_id, first admission wins."""
    b1 = _emb(spark, [(60, [1.0, -1.0])])
    res1 = similarity.semantic_admit_batch(
        history, b1, threshold=0.9, centroids=cents
    )
    # same id re-arrives pointing elsewhere (cell 101, far from 11)
    b2 = _emb(spark, [(60, [-0.9, 1.0])])
    res2 = similarity.semantic_admit_batch(
        None, b2, threshold=0.9, centroids=cents, history_state=res1.state
    )
    rep = res2.report.collect()[0]
    assert rep["admitted"] is True
    rows = [r for r in res2.state.collect() if r["vec_id"] == 60]
    assert len(rows) == 1
    assert rows[0]["cent_id"] == 100  # the ORIGINAL admission's cell


def test_persisted_state_lifecycle_roundtrip(spark, cents, history, tmp_path):
    """The state table written to parquet and re-read FROM FILES must
    drive the next batch's verdicts identically to the in-memory chain
    (the serve-layout lifecycle discipline): batch 1 admits new vectors,
    its state is persisted, and batch 2 -- containing a near-dup of a
    batch-1 ADMISSION -- must reject it based on what the files say."""
    b1 = _emb(spark, [(20, [1.0, 0.12]), (21, [1.0, -1.0])])
    b2 = _emb(spark, [(30, [1.0, -0.98]), (31, [0.3, 1.0])])
    r1 = similarity.semantic_admit_batch(
        history, b1, threshold=0.9, centroids=cents
    )
    mem = similarity.semantic_admit_batch(
        None, b2, threshold=0.9, centroids=cents, history_state=r1.state
    )
    want = {
        (r["vec_id"], r["admitted"], r["match_id"], r["cosine"])
        for r in mem.report.collect()
    }
    path = str(tmp_path / "admit_state")
    r1.state.write.parquet(path)
    filed = similarity.semantic_admit_batch(
        None,
        b2,
        threshold=0.9,
        centroids=cents,
        history_state=spark.read.parquet(path),
    )
    got = {
        (r["vec_id"], r["admitted"], r["match_id"], r["cosine"])
        for r in filed.report.collect()
    }
    assert got == want and want
    # 30 near-dups batch-1's ADMITTED 21 -- only state that flowed
    # through the parquet round-trip can know that
    verdicts = {r["vec_id"]: r for r in filed.report.collect()}
    assert verdicts[30]["admitted"] is False and verdicts[30]["match_id"] == 21
    # the updated state is identical through either path
    assert sorted(
        (r["vec_id"], r["cent_id"]) for r in filed.state.collect()
    ) == sorted((r["vec_id"], r["cent_id"]) for r in mem.state.collect())


@pytest.mark.scale
def test_persisted_state_lifecycle_at_sf01(spark, tmp_path):
    """Opt-in nightly (the sf0.1 sweep discipline): the full admission
    state lifecycle at the bench decade -- admit a quarter-corpus batch
    against a quarter-corpus history, persist the state to parquet,
    admit a second batch FROM THE FILES, and require verdict-for-verdict
    equality with the one-shot in-memory chain."""
    # resolve the bench decade the way bench.py does (r14: the hardcoded
    # path silently pinned this scale-marked test to one machine layout)
    sf01_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    path01 = os.path.join(sf01_dir, "embeddings.parquet")
    if not os.path.exists(path01):
        pytest.skip(f"no sf0.1 testdata at {path01}")
    emb = spark.read.parquet(path01).select("vec_id", "embedding")
    cents = similarity.default_centroids(emb)
    hist = emb.filter(F.col("vec_id") % 4 == 0)
    b1 = emb.filter(F.col("vec_id") % 4 == 1)
    b2 = emb.filter(F.col("vec_id") % 4 == 2)
    r1 = similarity.semantic_admit_batch(
        hist, b1, threshold=0.35, centroids=cents
    )
    mem = similarity.semantic_admit_batch(
        None, b2, threshold=0.35, centroids=cents, history_state=r1.state
    )
    want = {
        (r["vec_id"], r["admitted"], r["match_id"], r["cosine"])
        for r in mem.report.collect()
    }
    path = str(tmp_path / "admit_state01")
    r1.state.write.parquet(path)
    filed = similarity.semantic_admit_batch(
        None,
        b2,
        threshold=0.35,
        centroids=cents,
        history_state=spark.read.parquet(path),
    )
    got = {
        (r["vec_id"], r["admitted"], r["match_id"], r["cosine"])
        for r in filed.report.collect()
    }
    assert got == want and len(want) == b2.count()


def test_all_hot_cell_admission_exact_and_equijoin(spark):
    """Adversarial cell skew (r13): EVERY vector -- 80 history + 40
    batch -- lands in one centroid cell.  Verdicts must still equal the
    pure-Python reference exactly, and the within-cell scoring must
    stay an equi-join on the cell key (the shape AQE's skew split can
    act on at scale), never a cartesian."""
    # integer vectors hugging [3, 1, 0]: all assign to centroid 100;
    # centroids 101/102 point away and capture nothing
    cents = [(100, [3, 1, 0]), (101, [-3, 0, 1]), (102, [0, -3, -1])]
    history = [(10 + i, [3, 1, (i % 3) - 1]) for i in range(80)]
    batch = [(500 + i, [3, 1, (i % 5) - 2]) for i in range(40)]
    cents_df = spark.createDataFrame(
        [(c, [float(x) for x in v]) for c, v in cents],
        "cent_id long, cent_emb array<double>",
    )
    res = similarity.semantic_admit_batch(
        _emb(spark, history),
        _emb(spark, batch),
        threshold=0.9,
        centroids=cents_df,
    )
    rows = res.report.collect()
    got = {
        r["vec_id"]: (r["cent_id"], r["match_id"], r["cosine"], r["admitted"])
        for r in rows
    }
    assert got == _ref_admit(history, batch, cents, 0.9)
    # the hot cell is real: every verdict came from cell 100
    assert {r["cent_id"] for r in rows} == {100}
    # plan shape: cell-keyed equi-join, no cartesian fallback
    plan = res.report._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "cent_id" in plan
