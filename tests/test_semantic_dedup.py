"""SemDeDup-style semantic dedup: DuckDB oracle parity + keep-list
semantics + plan shape (the pair search must stay cell-bounded, never
all-pairs)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from nyc_taxi_dataset_analysis_apache_hive_spark.operators import similarity
from nyc_taxi_dataset_analysis_apache_hive_spark.sources.readers import load_table
from tests.parity import compare, duckdb_conn

_COS_VC = (
    "round(list_dot_product(v.emb, c.cent_emb) /"
    " nullif(sqrt(list_dot_product(v.emb, v.emb))"
    " * sqrt(list_dot_product(c.cent_emb, c.cent_emb)), 0), 6)"
)

# Same stages as similarity.semantic_dedup, replayed in DuckDB: fixed-slice
# centroids -> max-cosine assignment -> within-cell pairs -> recursive-CTE
# connected components -> keep-list.
_ORACLE = f"""
    WITH RECURSIVE e AS (
      SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
    ),
    cents AS (
      SELECT vec_id AS cent_id, emb AS cent_emb FROM e
      WHERE vec_id >= 100 AND vec_id < 116
    ),
    assigned AS (
      SELECT vec_id, cent_id FROM (
        SELECT v.vec_id, c.cent_id,
               row_number() OVER (PARTITION BY v.vec_id
                 ORDER BY {_COS_VC} DESC, c.cent_id ASC) AS crank
        FROM e v CROSS JOIN cents c
      ) WHERE crank = 1
    ),
    en AS (
      SELECT vec_id,
             list_transform(emb,
               x -> x / nullif(sqrt(list_dot_product(emb, emb)), 0)) AS emb_n
      FROM e
    ),
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM assigned a
      JOIN assigned b ON a.cent_id = b.cent_id AND a.vec_id < b.vec_id
      JOIN en ea ON ea.vec_id = a.vec_id
      JOIN en eb ON eb.vec_id = b.vec_id
      WHERE round(list_dot_product(ea.emb_n, eb.emb_n), 6) >= 0.35
    ),
    edges AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION
      SELECT id_b AS a, id_a AS b FROM pairs
    ),
    verts AS (SELECT DISTINCT a AS v FROM edges),
    reach(v, r) AS (
      SELECT v, v FROM verts
      UNION
      SELECT e2.a, reach.r FROM edges e2 JOIN reach ON reach.v = e2.b
    ),
    comp AS (SELECT v AS vec_id, min(r) AS cluster_id FROM reach GROUP BY v)
    SELECT e.vec_id,
           coalesce(comp.cluster_id, e.vec_id) AS sem_cluster,
           coalesce(comp.cluster_id, e.vec_id) = e.vec_id AS keep
    FROM e LEFT JOIN comp USING (vec_id)
"""


def test_semantic_dedup_oracle_parity(spark, sf0001_dir):
    emb = load_table(spark, sf0001_dir, "embeddings")
    got = similarity.semantic_dedup(emb, threshold=0.35)
    con = duckdb_conn(sf0001_dir)
    assert compare(got, con, _ORACLE, "semantic_dedup") == []


def test_semantic_dedup_covers_every_vector_and_finds_dups(spark, sf0001_dir):
    emb = load_table(spark, sf0001_dir, "embeddings")
    got = similarity.semantic_dedup(emb, threshold=0.35)
    rows = {r["vec_id"]: r for r in got.toLocalIterator()}
    assert len(rows) == emb.count()  # every vector classified
    dropped = [r for r in rows.values() if not r["keep"]]
    assert dropped, "threshold below max pairwise cosine must drop something"
    for r in dropped:  # every drop points at a surviving canonical
        assert rows[r["sem_cluster"]]["keep"]
        assert r["sem_cluster"] < r["vec_id"]  # min-id election


def test_semantic_dedup_planted_clique(spark):
    """Three exact copies + one orthogonal vector: copies collapse onto the
    min id, the orthogonal vector is a kept singleton."""
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0, 0.0]),
            (1, [1.0, 0.0, 0.0, 0.0]),
            (2, [2.0, 0.0, 0.0, 0.0]),  # same direction, different norm
            (3, [0.0, 1.0, 0.0, 0.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    cents = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0, 0.0])],
        "cent_id long, cent_emb array<double>",
    )
    got = {
        r["vec_id"]: (r["sem_cluster"], r["keep"])
        for r in similarity.semantic_dedup(
            emb, threshold=0.99, centroids=cents
        ).collect()
    }
    assert got == {0: (0, True), 1: (0, False), 2: (0, False), 3: (3, True)}


def test_semantic_dedup_pair_join_is_equi_join(spark, sf0001_dir):
    """The only nested-loop allowed is the broadcast of the tiny centroid
    table; the within-cell pair search must compile to an equi-join on the
    cell key -- never a corpus-x-corpus cartesian."""
    emb = load_table(spark, sf0001_dir, "embeddings")
    plan = (
        similarity.semantic_dedup(emb, threshold=0.35)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan


def test_semantic_dedup_reliable_checkpoint_mode_matches_local(
    spark, sf0001_dir, tmp_path
):
    """checkpoint_dir= flows through to the CC label loop: identical
    (vec_id, sem_cluster, keep) output in both cut modes."""
    emb = load_table(spark, sf0001_dir, "embeddings")
    want = {
        (r["vec_id"], r["sem_cluster"], r["keep"])
        for r in similarity.semantic_dedup(emb, threshold=0.9).collect()
    }
    got = {
        (r["vec_id"], r["sem_cluster"], r["keep"])
        for r in similarity.semantic_dedup(
            emb, threshold=0.9, checkpoint_dir=str(tmp_path / "sem_ck")
        ).collect()
    }
    assert got == want and want
