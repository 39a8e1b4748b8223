"""Embedding PCA / whitening (operators/pca.py): numpy-replay parity
on the real embeddings table, whitening law, reconstruction ordering,
repartition invariance, artifact round-trip, and the stateless
no-shuffle projection plan.

No oracle slot: the eigensolve is not SQL-expressible (the weaker
pytest-only gate, the kmeans posture) -- but the MOMENTS are exact
arithmetic, so the parity gates compare against a full-precision numpy
replay of the identical math on the collected sf0.001 vectors.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from nyc_taxi_dataset_analysis_apache_hive_spark.operators import pca
from nyc_taxi_dataset_analysis_apache_hive_spark.sources.readers import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def embs(spark):
    return load_table(spark, SF, "embeddings").localCheckpoint(eager=True)


@pytest.fixture(scope="module")
def xmat(embs):
    rows = embs.select("vec_id", "embedding").collect()
    rows.sort(key=lambda r: r["vec_id"])
    return np.asarray(
        [np.asarray(r["embedding"], dtype=np.float64) for r in rows]
    )


@pytest.fixture(scope="module")
def model(embs):
    return pca.pca_fit(embs, k=8)


def _np_cov(x):
    mean = x.mean(axis=0)
    c = (x - mean).T @ (x - mean) / (x.shape[0] - 1)
    return mean, (c + c.T) / 2


def test_moments_match_numpy(embs, xmat):
    parts = pca.embedding_moments(embs).collect()
    n = sum(p["n"] for p in parts)
    d = len(parts[0]["s"])
    s = np.sum([np.asarray(p["s"]) for p in parts], axis=0)
    ss = np.sum([np.asarray(p["ss"]).reshape(d, d) for p in parts], axis=0)
    assert n == xmat.shape[0] and d == xmat.shape[1]
    np.testing.assert_allclose(s, xmat.sum(axis=0), rtol=1e-12)
    np.testing.assert_allclose(ss, xmat.T @ xmat, rtol=1e-12)


def test_fit_matches_numpy_eigh(model, xmat):
    mean, cov = _np_cov(xmat)
    np.testing.assert_allclose(model["mean"], mean, rtol=1e-9, atol=1e-12)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:8]
    np.testing.assert_allclose(
        model["eigvals"], vals[order], rtol=1e-7, atol=1e-10
    )
    # components match up to the deterministic sign convention
    for i, j in enumerate(order):
        v = vecs[:, j]
        jm = int(np.argmax(np.abs(v)))
        if v[jm] < 0:
            v = -v
        np.testing.assert_allclose(
            model["components"][i], v, rtol=1e-6, atol=1e-8
        )
    assert model["explained_variance_ratio"] == sorted(
        model["explained_variance_ratio"], reverse=True
    )


def test_projection_matches_numpy(spark, embs, model, xmat):
    got = pca.pca_project(embs, model).select("vec_id", "proj").collect()
    got.sort(key=lambda r: r["vec_id"])
    g = np.asarray([r["proj"] for r in got])
    comps = np.asarray(model["components"])
    want = (xmat - np.asarray(model["mean"])) @ comps.T
    np.testing.assert_allclose(g, want, rtol=1e-7, atol=1e-9)


def test_whitened_projection_has_unit_variance(embs, model):
    proj = pca.pca_project(embs, model, whiten=True)
    rows = np.asarray([r["proj"] for r in proj.select("proj").collect()])
    var = rows.var(axis=0, ddof=1)
    np.testing.assert_allclose(var, np.ones(model["k"]), rtol=1e-3)


def test_full_rank_projection_preserves_distances(embs, xmat):
    full = pca.pca_fit(embs, k=xmat.shape[1])
    rows = pca.pca_project(embs, full).select("vec_id", "proj").collect()
    rows.sort(key=lambda r: r["vec_id"])
    g = np.asarray([r["proj"] for r in rows])
    # rotation + centering: pairwise distances survive exactly
    d0 = np.linalg.norm(xmat[:50, None] - xmat[None, :50], axis=2)
    d1 = np.linalg.norm(g[:50, None] - g[None, :50], axis=2)
    np.testing.assert_allclose(d1, d0, rtol=1e-6, atol=1e-8)


def test_explained_variance_grows_with_k(embs):
    r4 = sum(pca.pca_fit(embs, k=4)["explained_variance_ratio"])
    r16 = sum(pca.pca_fit(embs, k=16)["explained_variance_ratio"])
    assert 0 < r4 < r16 <= 1 + 1e-9


def test_repartition_invariance(embs, model):
    shuffled = pca.pca_fit(embs.repartition(13), k=8)
    np.testing.assert_allclose(
        shuffled["mean"], model["mean"], rtol=1e-9, atol=1e-12
    )
    np.testing.assert_allclose(
        shuffled["components"], model["components"], rtol=1e-6, atol=1e-8
    )


def test_null_vectors_skipped_in_fit_and_null_in_projection(spark, model):
    rows = [(1, [1.0] * 64), (2, None), (3, [2.0] * 64), (4, [3.0] * 64)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    m = pca.pca_fit(df, k=2)
    assert m["n"] == 3
    out = {
        r["vec_id"]: r["proj"]
        for r in pca.pca_project(df, m).select("vec_id", "proj").collect()
    }
    assert out[2] is None and out[1] is not None


def test_fit_raises_on_empty_and_bad_k(spark, embs):
    empty = spark.createDataFrame([], "embedding array<float>")
    with pytest.raises(ValueError, match="no non-NULL"):
        pca.pca_fit(empty, k=2)
    with pytest.raises(ValueError, match="k must be"):
        pca.pca_fit(embs, k=0)
    with pytest.raises(ValueError, match="k must be"):
        pca.pca_fit(embs, k=65)


def test_model_round_trip(spark, embs, model, tmp_path):
    path = str(tmp_path / "pca_model")
    pca.save_pca_model(model, spark, path)
    loaded = pca.load_pca_model(spark, path)
    assert loaded == model


def test_projection_plan_is_stateless(embs, model):
    plan = (
        pca.pca_project(embs, model)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for op in ("Exchange", "Join", "Aggregate", "BatchEvalPython",
               "ArrowEvalPython"):
        assert op not in plan, f"projection plan must not contain {op}"
