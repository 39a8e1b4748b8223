"""Embedding PCA / whitening: exact method-of-moments principal
components over an ``array<float>`` embedding column, and a stateless
JVM-side projection.

The vector-pipeline stage the similarity family was missing: reduce /
whiten embeddings BEFORE indexing (IVF/PQ train faster and bucket
better on decorrelated inputs; whitening is the standard preprocessing
in the ANN literature, e.g. Jegou et al.'s PQ follow-ups) and compress
vectors for storage.  The reference workload (a HiveQL analytics
script; REF:1-389) has no vector surface -- this module is
training-data-pipeline extension surface like operators/similarity.py.

Scale design (the 100-TB posture):

* ``embedding_moments`` is ONE Arrow-batched pass
  (``mapInPandas``): each batch contributes (n, sum x, X^T X) computed
  by numpy gemm -- vectorized C, not per-row Python -- and the output
  is PARTITION-COUNT-sized (one ~33 KB row per input partition for
  d=64).  Nothing data-sized ever reaches the driver: the partial
  reduce collects O(num_partitions) rows (the bloom-geometry one-row
  collect posture), and everything after is a d x d eigensolve --
  O(1) in corpus size.
* A built-in-only spelling of the same moments (explode to d^2
  products, partial-aggregated groupBy) would amplify the scan
  ~d(d+3)/2 x before map-side combine; the Arrow batch path does the
  same arithmetic inside one gemm per batch.  This is exactly the
  "UDFs are the slow path EXCEPT where builtins can't express the
  batch shape" carve-out (the winnow gram-hash precedent).
* ``pca_project`` is a pure stateless map: the (k x d) component
  matrix rides into the plan as literal arrays (k * d doubles -- tiny
  for any sane k, d), each output coordinate is one
  ``aggregate(zip_with(...))`` fold -- JVM codegen, no shuffle, no
  join, no Python.  The plan shape is pinned in tests/test_pca.py.

Determinism: the eigensolve is driver-side numpy on a symmetric d x d
matrix; component SIGN is normalized (largest-|coefficient| entry made
positive) so refits are reproducible.  Float sums depend on partition
order as in every distributed reduction -- the parity gates use
tolerances sized to double precision, and repartition-invariance is
tested under the same tolerance.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, functions as F

#: embedding dimensionality cap for the literal-matrix projection: the
#: plan embeds k*d + 2*d literal doubles; past this, ship the model as
#: a broadcast join against a posexploded projection instead.  64-dim
#: corpus embeddings and k <= d stay far inside.
MAX_LITERAL_DIMS = 256


def embedding_moments(
    embeddings: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """Per-partition moment partials: one row ``(n, s, ss)`` per input
    partition with ``n`` = vector count, ``s`` = elementwise sum
    (length d), ``ss`` = row-major flattened X^T X (length d*d).

    NULL vectors are skipped (unmatchable mass, the house NULL rule);
    a ragged vector (length != the batch's first) raises inside the
    worker rather than silently mis-summing.
    """
    import numpy as np
    import pandas as pd

    def partial(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        n = 0
        s = None
        ss = None
        for pdf in batches:
            vecs = [v for v in pdf[vec_col] if v is not None]
            if not vecs:
                continue
            x = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
            if s is None:
                s = np.zeros(x.shape[1])
                ss = np.zeros((x.shape[1], x.shape[1]))
            if x.shape[1] != s.shape[0]:
                raise ValueError(
                    f"ragged embedding: got length {x.shape[1]}, "
                    f"expected {s.shape[0]}"
                )
            n += x.shape[0]
            s += x.sum(axis=0)
            ss += x.T @ x
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "ss": [ss.ravel().tolist()]}
            )

    return embeddings.select(vec_col).mapInPandas(
        partial, "n bigint, s array<double>, ss array<double>"
    )


def model_from_moments(n: int, s, ss, k: int) -> dict:
    """The model math shared by :func:`pca_fit` and the maintained-
    state read path (streaming/maintenance.py): moments in, fitted
    model dict out.  ``s`` = length-d sum vector, ``ss`` = d x d (or
    flattened d*d) second-moment matrix."""
    import numpy as np

    s = np.asarray(s, dtype=np.float64)
    d = s.shape[0]
    ss = np.asarray(ss, dtype=np.float64).reshape(d, d)
    if not 1 <= k <= d:
        raise ValueError(f"k must be in [1, {d}], got {k}")
    if n < 2:
        raise ValueError(f"PCA needs >= 2 vectors, got {n}")
    mean = s / n
    # unbiased covariance from raw moments; symmetrize against float
    # asymmetry before eigh (eigh reads the lower triangle, but the
    # sign normalization below should see the symmetrized values too)
    cov = (ss - n * np.outer(mean, mean)) / (n - 1)
    cov = (cov + cov.T) / 2.0
    eigvals, eigvecs = np.linalg.eigh(cov)
    order = np.argsort(eigvals)[::-1][:k]
    comps = eigvecs[:, order].T
    vals = np.maximum(eigvals[order], 0.0)
    # deterministic sign: the largest-|coefficient| entry of each
    # component is positive (ties by first index -- argmax's rule)
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    total = float(np.maximum(eigvals, 0.0).sum())
    return {
        "k": int(k),
        "dims": int(d),
        "n": int(n),
        "mean": mean.tolist(),
        "components": comps.tolist(),
        "eigvals": vals.tolist(),
        "explained_variance_ratio": (
            (vals / total).tolist() if total > 0 else [0.0] * k
        ),
    }


def pca_fit(
    embeddings: DataFrame, k: int, vec_col: str = "embedding"
) -> dict:
    """Fit a k-component PCA model from one moments pass.

    Returns ``{"k", "dims", "n", "mean", "components", "eigvals",
    "explained_variance_ratio"}`` -- ``components`` is a k x d list of
    lists (rows = components, descending eigenvalue), plain Python so
    the model is a serializable artifact.

    The collect here is PARTITION-COUNT-sized partials (O(1) in data);
    the eigensolve is a d x d ``numpy.linalg.eigh`` on the driver
    (:func:`model_from_moments`).
    """
    import numpy as np

    parts = embedding_moments(embeddings, vec_col).collect()
    if not parts:
        raise ValueError("pca_fit: no non-NULL vectors to fit on")
    d = len(parts[0]["s"])
    n = sum(p["n"] for p in parts)
    s = np.zeros(d)
    ss = np.zeros((d, d))
    for p in parts:
        s += np.asarray(p["s"])
        ss += np.asarray(p["ss"]).reshape(d, d)
    return model_from_moments(n, s, ss, k)


def _lit_array(values) -> str:
    return "array(" + ", ".join(f"{float(v)!r}D" for v in values) + ")"


def pca_project(
    embeddings: DataFrame,
    model: dict,
    vec_col: str = "embedding",
    out_col: str = "proj",
    whiten: bool = False,
    eps: float = 1e-9,
) -> DataFrame:
    """Project each vector onto the model's components: ``out_col`` =
    array<double> of length k, coordinate j = (x - mean) . component_j
    (divided by sqrt(eigval_j + eps) when ``whiten`` -- unit-variance
    output, the ANN-preprocessing form).

    Pure stateless map (no shuffle, no join, no Python): mean and
    components enter the plan as literal arrays, each coordinate is an
    ``aggregate(zip_with(...))`` fold over the centered vector.  NULL
    vectors project to NULL.  Plan shape pinned in tests/test_pca.py.
    """
    d, k = model["dims"], model["k"]
    if d > MAX_LITERAL_DIMS:
        raise ValueError(
            f"dims={d} exceeds MAX_LITERAL_DIMS={MAX_LITERAL_DIMS}: the "
            "literal-matrix plan would bloat; use a broadcast-join "
            "projection at this width"
        )
    centered = (
        f"zip_with({vec_col}, {_lit_array(model['mean'])},"
        " (x, m) -> CAST(x AS DOUBLE) - m)"
    )
    coords = []
    for j in range(k):
        dot = (
            f"aggregate(zip_with(__pca_c, {_lit_array(model['components'][j])},"
            " (x, c) -> x * c), 0D, (acc, v) -> acc + v)"
        )
        if whiten:
            scale = (model["eigvals"][j] + eps) ** 0.5
            dot = f"({dot}) / {scale!r}D"
        coords.append(dot)
    return embeddings.withColumn("__pca_c", F.expr(centered)).withColumn(
        out_col,
        F.when(
            F.col(vec_col).isNotNull(),
            F.expr("array(" + ", ".join(coords) + ")"),
        ),
    ).drop("__pca_c")


def save_pca_model(model: dict, spark, path: str) -> None:
    """Persist the model as a one-row parquet artifact (the PQ-meta
    posture: geometry rides the row, so a reload can never pair with a
    mismatched projection).  Built as a pure-JVM literal frame --
    ``createDataFrame([row])`` is python-RDD-backed and pays a worker
    pool spin-up per action (the maintenance-fold lesson)."""
    comps = "array(" + ", ".join(
        _lit_array(c) for c in model["components"]
    ) + ")"
    spark.range(1).select(
        F.lit(model["k"]).cast("int").alias("k"),
        F.lit(model["dims"]).cast("int").alias("dims"),
        F.lit(model["n"]).cast("long").alias("n"),
        F.expr(_lit_array(model["mean"])).alias("mean"),
        F.expr(comps).alias("components"),
        F.expr(_lit_array(model["eigvals"])).alias("eigvals"),
        F.expr(_lit_array(model["explained_variance_ratio"])).alias(
            "explained_variance_ratio"
        ),
    ).write.mode("overwrite").parquet(path)


def load_pca_model(spark, path: str) -> dict:
    """Reload a :func:`save_pca_model` artifact (one-row read)."""
    r = spark.read.parquet(path).collect()[0]
    return {
        "k": int(r["k"]),
        "dims": int(r["dims"]),
        "n": int(r["n"]),
        "mean": list(r["mean"]),
        "components": [list(c) for c in r["components"]],
        "eigvals": list(r["eigvals"]),
        "explained_variance_ratio": list(r["explained_variance_ratio"]),
    }
