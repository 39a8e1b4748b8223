"""Embedding similarity search (k1 brute force, k2 LSH/IVF/PQ/IVFPQ, k3 near-pairs + SemDeDup) and the fused text/multimodal profiles (t1, m1-m3).

Split out of the monolithic registry.py in round 8 (registration
order preserved by the package __init__; see its docstring).
"""

from __future__ import annotations

import threading
from functools import reduce

from pyspark.sql import functions as F

from .. import caching
from ..functions.text import (
    BPE_TOKEN_REGEX,
    STOPWORDS,
    TOKEN_SPLIT_REGEX,
)
from ..operators import (
    dedup,
    multimodal,
    similarity,
    textops,
)
from .base import (
    register,
    register_legs,
    _t,
)


# ---------------------------------------------------------------------------
# Similarity search over embeddings
# ---------------------------------------------------------------------------

#: normalize-then-dot (matches the Spark side, which pre-normalizes each
#: vector once instead of recomputing norms per pair)
_COS = "round(list_dot_product(q.emb_n, c.emb_n), 6)"

#: RRF constants interpolated into the k2 oracle (and, via registry_sql,
#: the Spark-SQL text) from their ONE definition in operators.similarity
#: -- the bm25_constants repr-roundtrip discipline, so changing RRF_K /
#: the micro scale / the fused depth can never desynchronize surfaces.
_RRF_K_F = float(similarity.RRF_K)
_RRF_MICRO_F = float(similarity.RRF_MICRO)
#: fused top-k depth of the k2 ``rrf`` leg (the same k the ANN legs use)
K2_RRF_K = 5

#: label rides along since r15 (the k1 mining legs read it; the other
#: consumers ignore it) so ONE normalization CTE serves every embedding
#: oracle -- forking it per-entry is how a NULL-guard change would
#: silently miss a surface.
_NORM_CTE = """e0 AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS emb,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
               AS nrm
      FROM embeddings WHERE embedding IS NOT NULL
    )"""


#: semi-hard band width repr-roundtripped from its ONE definition
_MINING_MARGIN_F = float(similarity.MINING_MARGIN)

#: raw-embedding cosine spellings shared by every IVF routing CTE (the
#: k2 ivf leg, the k2 ivfpq router, and the k1 routed-mining legs since
#: r16) -- defined ABOVE the k1 entry because its oracle f-string
#: interpolates them at registration time.
_IVF_COS_VC = (
    "round(list_dot_product(v.emb, c.cent_emb) /"
    " nullif(sqrt(list_dot_product(v.emb, v.emb))"
    " * sqrt(list_dot_product(c.cent_emb, c.cent_emb)), 0), 6)"
)
_IVF_COS_QC = _IVF_COS_VC.replace("v.emb", "q.emb")
_IVF_COS_PA = (
    "round(list_dot_product(p.q_emb, a.c_emb) /"
    " nullif(sqrt(list_dot_product(p.q_emb, p.q_emb))"
    " * sqrt(list_dot_product(a.c_emb, a.c_emb)), 0), 6)"
)


@register(
    "k1_knn_bruteforce",
    f"""
    WITH {_NORM_CTE},
    e AS (
      SELECT vec_id, label, list_transform(emb, x -> x / nrm) AS emb_n
      FROM e0 WHERE nrm > 0
    ),
    scored AS (
      SELECT q.vec_id AS query_id, q.label AS ql,
             c.vec_id AS neighbor_id, c.label AS nl,
             {_COS} AS cosine
      FROM (SELECT * FROM e WHERE vec_id < 8) q
      CROSS JOIN e c
      WHERE c.vec_id <> q.vec_id
    ),
    sup AS (SELECT * FROM scored WHERE ql IS NOT NULL AND nl IS NOT NULL),
    hpos_r AS (
      SELECT query_id, neighbor_id, cosine,
             CAST(row_number() OVER (
               PARTITION BY query_id
               ORDER BY cosine ASC, neighbor_id ASC) AS BIGINT) AS rank
      FROM sup WHERE nl = ql
    ),
    mcents AS (
      SELECT vec_id AS cent_id, emb AS cent_emb FROM e0
      WHERE vec_id >= 100 AND vec_id < 116
    ),
    massigned AS (
      SELECT neighbor_id, cent_id FROM (
        SELECT v.vec_id AS neighbor_id, c.cent_id,
               row_number() OVER (PARTITION BY v.vec_id
                 ORDER BY {_IVF_COS_VC} DESC, c.cent_id ASC) AS crank
        FROM e0 v CROSS JOIN mcents c
      ) WHERE crank = 1
    ),
    mprobes AS (
      SELECT query_id, cent_id FROM (
        SELECT q.vec_id AS query_id, c.cent_id,
               row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY {_IVF_COS_QC} DESC, c.cent_id ASC) AS crank
        FROM (SELECT * FROM e0 WHERE vec_id < 8) q CROSS JOIN mcents c
      ) WHERE crank <= 3
    ),
    rsup AS (
      SELECT DISTINCT p.query_id, qe.label AS ql, a.neighbor_id,
             ce.label AS nl,
             round(list_dot_product(qe.emb_n, ce.emb_n), 6) AS cosine
      FROM mprobes p
      JOIN massigned a USING (cent_id)
      JOIN e qe ON qe.vec_id = p.query_id
      JOIN e ce ON ce.vec_id = a.neighbor_id
      WHERE p.query_id <> a.neighbor_id
        AND qe.label IS NOT NULL AND ce.label IS NOT NULL
    ),
    rhpos_r AS (
      SELECT query_id, neighbor_id, cosine,
             CAST(row_number() OVER (
               PARTITION BY query_id
               ORDER BY cosine ASC, neighbor_id ASC) AS BIGINT) AS rank
      FROM rsup WHERE nl = ql
    )
    SELECT 'knn' AS op, query_id, neighbor_id, cosine, rank FROM (
      SELECT query_id, neighbor_id, cosine, CAST(row_number() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS BIGINT) AS rank
      FROM scored
    ) WHERE rank <= 5
    UNION ALL
    SELECT 'hard_neg' AS op, query_id, neighbor_id, cosine, rank FROM (
      SELECT query_id, neighbor_id, cosine, CAST(row_number() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS BIGINT) AS rank
      FROM sup WHERE nl <> ql
    ) WHERE rank <= 5
    UNION ALL
    SELECT 'hard_pos' AS op, query_id, neighbor_id, cosine, rank
    FROM hpos_r WHERE rank <= 1
    UNION ALL
    SELECT 'semi_hard' AS op, query_id, neighbor_id, cosine, rank FROM (
      SELECT s.query_id, s.neighbor_id, s.cosine, CAST(row_number() OVER (
        PARTITION BY s.query_id
        ORDER BY s.cosine DESC, s.neighbor_id ASC) AS BIGINT) AS rank
      FROM sup s
      JOIN (SELECT query_id, cosine AS pcos FROM hpos_r WHERE rank <= 1) p
        USING (query_id)
      WHERE s.nl <> s.ql AND s.cosine < p.pcos
        AND s.cosine >= p.pcos - {_MINING_MARGIN_F!r}
    ) WHERE rank <= 5
    UNION ALL
    SELECT 'hard_neg_ivf' AS op, query_id, neighbor_id, cosine, rank FROM (
      SELECT query_id, neighbor_id, cosine, CAST(row_number() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS BIGINT) AS rank
      FROM rsup WHERE nl <> ql
    ) WHERE rank <= 5
    UNION ALL
    SELECT 'hard_pos_ivf' AS op, query_id, neighbor_id, cosine, rank
    FROM rhpos_r WHERE rank <= 1
    UNION ALL
    SELECT 'semi_hard_ivf' AS op, query_id, neighbor_id, cosine, rank FROM (
      SELECT s.query_id, s.neighbor_id, s.cosine, CAST(row_number() OVER (
        PARTITION BY s.query_id
        ORDER BY s.cosine DESC, s.neighbor_id ASC) AS BIGINT) AS rank
      FROM rsup s
      JOIN (SELECT query_id, cosine AS pcos FROM rhpos_r WHERE rank <= 1) p
        USING (query_id)
      WHERE s.nl <> s.ql AND s.cosine < p.pcos
        AND s.cosine >= p.pcos - {_MINING_MARGIN_F!r}
    ) WHERE rank <= 5
    """,
)
def k1_knn_bruteforce(spark, sf):
    """Brute-force cosine surface over the embeddings table, seven
    tagged legs (query vectors = vec_id < 8, the fixed-anchor
    convention):

    * ``op='knn'``: exact top-5 cosine neighbours -- the ANN baseline
      every k2 recall gate measures against.  Query side broadcast;
      corpus never shuffled.
    * ``op='hard_neg'`` / ``op='hard_pos'`` / ``op='semi_hard'`` (r15):
      similarity.contrastive_mining -- batch-hard triplet mining
      (Hermans et al. 2017) + the FaceNet semi-hard band (Schroff et
      al. 2015) over the labeled corpus, the selection stage of
      contrastive-training data.  Same scored-pair shape as knn with
      the label columns riding, so the oracle replays all four legs
      from ONE scored CTE; the semi-hard band anchors at the hard
      positive's cosine minus MINING_MARGIN (repr-roundtripped from
      its one definition).
    * ``op='hard_neg_ivf'`` / ``op='hard_pos_ivf'`` /
      ``op='semi_hard_ivf'`` (r16): the ROUTED mining legs -- anchors
      probe their 3 nearest of the 16 fixed centroids through a
      precomputed ivf_assign index and mine only those cells' members,
      the deployment path when EVERY document is an anchor (the brute
      pass's scored relation is the quadratic object there; see the
      operator docstring).  The oracle replays the routing with the
      k2 ivf leg's CTE spellings verbatim (ONE routing definition) and
      the mining windows over the routed candidate set; hard_neg
      recall vs the brute leg is additionally pytest-gated
      (tests/test_contrastive_mining.py).  The index is built
      per-invocation here (recompute-by-default at gate scale, the k2
      measured posture -- ``index=`` exists so a deployment builds it
      once)."""
    emb = _t(spark, sf, "embeddings")
    knn = similarity.cosine_topk_bruteforce(emb, k=5, n_queries=8).select(
        F.lit("knn").alias("op"),
        "query_id",
        "neighbor_id",
        "cosine",
        "rank",
    )
    routed = similarity.contrastive_mining(
        emb,
        k=5,
        n_queries=8,
        index=similarity.ivf_assign(emb, n_centroids=16, centroid_offset=100),
        n_probe=3,
        tag_suffix="_ivf",
    )
    return knn.unionByName(
        similarity.contrastive_mining(emb, k=5, n_queries=8)
    ).unionByName(routed)


#: trained-centroid gate parameters (the k3 ``semdedup_trained`` leg):
#: ONE definition feeding the DataFrame leg, the DuckDB oracle's
#: unrolled-Lloyd CTEs, and registry_sql's temp-view replay -- the
#: bm25_constants repr-roundtrip discipline, so retuning the trained
#: index can never desynchronize the three surfaces.
K3_KMEANS_N = 16
K3_KMEANS_ITER = 5
K3_KMEANS_Q = 6
#: training sample bound: the index trains on vec_id < K3_KMEANS_SAMPLE
#: (a deterministic prefix both engines replay).  Training on a bounded
#: sample IS the deployment posture -- an IVF/SemDeDup index at 100 TB
#: is trained on a sample and ASSIGNS the full corpus (the FAISS
#: training discipline); it also makes the training stage's data volume
#: scale-invariant while assignment stays full-corpus.
K3_KMEANS_SAMPLE = 500
#: disjoint vertex-id offset so ONE connected-components loop can label
#: the fixed-slice AND trained-centroid pair graphs together (a union
#: of disjoint graphs has the union of their components; min-label
#: within the offset part = offset + min original id, so subtracting
#: the offset recovers the standalone labels exactly)
K3_CC_OFFSET = 1 << 40

def _k3_trained_cents_ctes() -> str:
    """DuckDB replay of ``similarity.kmeans_train(n_centroids=K3_KMEANS_N,
    n_iter=K3_KMEANS_ITER, quantize=K3_KMEANS_Q)`` as unrolled-Lloyd CTEs:
    deterministic init (the K3_KMEANS_N smallest vec_ids, cent_id =
    1-based rank), then per iteration (a) normalize the centroids (tcn)
    and assign every vector to its max-round-9-DOT centroid -- unit
    vectors on both sides, the operator's pre-normalized spelling --
    with NULL sims filtered before the election, ties to the lowest
    cent_id then the greatest payload (emb DESC = the operator's max_by
    struct tail, and the elected emb rides THROUGH the election so a
    duplicated training vec_id contributes exactly one payload to the
    mean -- r14), (b) element-wise means per cluster over ta{{i}}'s own
    elected emb
    (generate_subscripts/unnest mirror posexplode; list(... ORDER BY pos)
    mirrors the array_sort re-assembly), (c) coalesce empty clusters to
    their previous centroid and quantize every element to K3_KMEANS_Q
    decimals.  The quantization barrier is what makes the replay exact:
    raw double means are summation-order-dependent at the last ulp, the
    rounded grid is engine-independent (verified bit-identical at
    sf0.001/0.01/0.1).  Training sees only the K3_KMEANS_SAMPLE id-prefix
    sample (e0s), exactly as the entry's
    ``kmeans_train(emb.filter(vec_id < SAMPLE))``; assignment downstream
    is full-corpus.  Final view: tc{K3_KMEANS_ITER}(cent_id, cent_emb)."""
    ctes = [
        f"""e0s AS (
      SELECT vec_id, emb,
             list_transform(emb, x -> x / nullif(nrm, 0)) AS emb_n
      FROM e0 WHERE vec_id < {K3_KMEANS_SAMPLE}
    )""",
        f"""tc0 AS (
      SELECT row_number() OVER (ORDER BY vec_id, emb) AS cent_id,
             emb AS cent_emb
      FROM (SELECT vec_id, emb FROM e0s ORDER BY vec_id, emb
            LIMIT {K3_KMEANS_N})
    )""",
    ]
    for i in range(1, K3_KMEANS_ITER + 1):
        ctes.append(
            f"""tcn{i - 1} AS (
      SELECT cent_id,
             list_transform(cent_emb, x -> x /
               nullif(sqrt(list_dot_product(cent_emb, cent_emb)), 0)) AS cn
      FROM tc{i - 1}
    )"""
        )
        ctes.append(
            # the elected emb PAYLOAD rides the election (r14, mirroring
            # the operator's max_by over (sim, -cent_id, v)): a
            # duplicated training vec_id with two payloads must
            # contribute exactly the ONE elected vector to its cluster
            # mean -- the previous re-join of e0s on vec_id pulled BOTH
            # payloads back in.  emb DESC = the struct-max "greatest
            # payload" tie-break.
            f"""ta{i} AS (
      SELECT vec_id, cent_id, emb FROM (
        SELECT vec_id, cent_id, emb,
               row_number() OVER (PARTITION BY vec_id
                 ORDER BY sim DESC, cent_id ASC, emb DESC) AS r
        FROM (
          SELECT v.vec_id, c.cent_id, v.emb,
                 round(list_dot_product(v.emb_n, c.cn), 9) AS sim
          FROM e0s v CROSS JOIN tcn{i - 1} c
        ) WHERE sim IS NOT NULL
      ) WHERE r = 1
    )"""
        )
        ctes.append(
            f"""tm{i} AS (
      SELECT cent_id, list(m ORDER BY pos) AS centroid FROM (
        SELECT cent_id, pos, avg(x) AS m FROM (
          SELECT a.cent_id, generate_subscripts(a.emb, 1) AS pos,
                 unnest(a.emb) AS x
          FROM ta{i} a
        ) GROUP BY cent_id, pos
      ) GROUP BY cent_id
    )"""
        )
        ctes.append(
            f"""tc{i} AS (
      SELECT c.cent_id,
             list_transform(coalesce(m.centroid, c.cent_emb),
                            x -> round(x, {K3_KMEANS_Q})) AS cent_emb
      FROM tc{i - 1} c LEFT JOIN tm{i} m ON c.cent_id = m.cent_id
    )"""
        )
    return ",\n    ".join(ctes)


_K2_LSH_SQL = f"""
    WITH {_NORM_CTE},
    e AS (
      SELECT vec_id, list_transform(emb, x -> x / nrm) AS emb_n,
             concat(CASE WHEN emb[1] >= 0 THEN '1' ELSE '0' END,
                    CASE WHEN emb[2] >= 0 THEN '1' ELSE '0' END,
                    CASE WHEN emb[3] >= 0 THEN '1' ELSE '0' END,
                    CASE WHEN emb[4] >= 0 THEN '1' ELSE '0' END) AS bucket
      FROM e0 WHERE nrm > 0
    ),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             {_COS} AS cosine
      FROM (SELECT * FROM e WHERE vec_id < 8) q
      JOIN e c ON q.bucket = c.bucket
      WHERE c.vec_id <> q.vec_id
    )
    SELECT query_id, neighbor_id, cosine, rank FROM (
      SELECT *, CAST(row_number() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS BIGINT) AS rank
      FROM scored
    ) WHERE rank <= 5
"""

_K4_IVF_SQL = f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb
               FROM embeddings WHERE embedding IS NOT NULL),
    cents AS (
      SELECT vec_id AS cent_id, emb AS cent_emb FROM e
      WHERE vec_id >= 100 AND vec_id < 116
    ),
    assigned AS (
      SELECT neighbor_id, c_emb, cent_id FROM (
        SELECT v.vec_id AS neighbor_id, v.emb AS c_emb, c.cent_id,
               row_number() OVER (PARTITION BY v.vec_id
                 ORDER BY {_IVF_COS_VC} DESC, c.cent_id ASC) AS crank
        FROM e v CROSS JOIN cents c
      ) WHERE crank = 1
    ),
    probes AS (
      SELECT query_id, q_emb, cent_id FROM (
        SELECT q.vec_id AS query_id, q.emb AS q_emb, c.cent_id,
               row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY {_IVF_COS_QC} DESC, c.cent_id ASC) AS crank
        FROM (SELECT * FROM e WHERE vec_id < 8) q CROSS JOIN cents c
      ) WHERE crank <= 3
    ),
    scored AS (
      SELECT DISTINCT p.query_id, a.neighbor_id, {_IVF_COS_PA} AS cosine
      FROM probes p JOIN assigned a USING (cent_id)
      WHERE p.query_id <> a.neighbor_id
    )
    SELECT query_id, neighbor_id, cosine, rank FROM (
      SELECT *, CAST(row_number() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS BIGINT)
        AS rank
      FROM scored
    ) WHERE rank <= 5
"""


# PQ oracle (m=16 subspaces x 4 dims, k_sub=32 codes, 128-candidate ADC
# prune, exact re-rank): every float op mirrors the DataFrame program --
# normalization by the same sequential-fold norm, sub-distances as
# explicit LEFT-TO-RIGHT 4-term sums rounded to 6, the ADC total as the
# fixed-order chain of 16 single-row partial sums, and identical
# tie-breaks -- so the candidate set (not just the final ranking) is
# bit-reproducible across engines.
_PQ_M, _PQ_DSUB, _PQ_KSUB, _PQ_NCAND = 16, 4, 32, 128


def _pq_subdist(v: str, c: str) -> str:
    terms = " + ".join(
        f"({v}[j.j*{_PQ_DSUB}+{i}] - {c}[j.j*{_PQ_DSUB}+{i}])"
        f" * ({v}[j.j*{_PQ_DSUB}+{i}] - {c}[j.j*{_PQ_DSUB}+{i}])"
        for i in range(1, _PQ_DSUB + 1)
    )
    return f"round({terms}, 6)"


_PQ_ADC_CHAIN = " + ".join(
    f"sum(CASE WHEN c.j = {j} THEN q.d END)" for j in range(_PQ_M)
)

_PQ_SQL = f"""
    WITH eraw AS (
      SELECT vec_id, embedding::DOUBLE[] AS emb_raw,
             sqrt(list_dot_product(embedding::DOUBLE[],
                                   embedding::DOUBLE[])) AS nrm
      FROM embeddings WHERE embedding IS NOT NULL
    ),
    e AS (
      -- zero-norm drop-out mirrored from the operator (WHERE nrm > 0)
      SELECT vec_id, emb_raw,
             list_transform(emb_raw, x -> x / nrm) AS emb
      FROM eraw WHERE nrm > 0
    ),
    cb AS (
      SELECT CAST(vec_id - 200 AS INT) AS code_id, emb AS cb_emb FROM e
      WHERE vec_id >= 200 AND vec_id < {200 + _PQ_KSUB}
    ),
    sdl AS (
      SELECT v.vec_id, c.code_id, j.j,
             {_pq_subdist("v.emb", "c.cb_emb")} AS d
      FROM e v CROSS JOIN cb c
      CROSS JOIN (SELECT unnest(range(0, {_PQ_M})) AS j) j
    ),
    codes AS (
      SELECT vec_id, j, code_id AS code FROM (
        SELECT vec_id, j, code_id,
               row_number() OVER (PARTITION BY vec_id, j
                 ORDER BY d ASC, code_id ASC) AS rn
        FROM sdl) WHERE rn = 1
    ),
    qtab AS (
      SELECT vec_id AS query_id, j, code_id, d FROM sdl WHERE vec_id < 8
    ),
    adc AS (
      SELECT q.query_id, c.vec_id,
             round({_PQ_ADC_CHAIN}, 6) AS adc
      FROM codes c JOIN qtab q ON q.j = c.j AND q.code_id = c.code
      WHERE q.query_id <> c.vec_id
      GROUP BY q.query_id, c.vec_id
    ),
    cands AS (
      SELECT query_id, vec_id FROM (
        SELECT query_id, vec_id, row_number() OVER (
          PARTITION BY query_id ORDER BY adc ASC, vec_id ASC) AS crank
        FROM adc) WHERE crank <= {_PQ_NCAND}
    ),
    pq_scored AS (
      SELECT ca.query_id, ca.vec_id AS neighbor_id,
             round(list_dot_product(q.emb_raw, n.emb_raw)
                   / nullif(sqrt(list_dot_product(q.emb_raw, q.emb_raw))
                            * sqrt(list_dot_product(n.emb_raw, n.emb_raw)),
                            0), 6) AS cosine
      FROM cands ca
      JOIN e q ON q.vec_id = ca.query_id
      JOIN e n ON n.vec_id = ca.vec_id
    )
    SELECT query_id, neighbor_id, cosine, rank FROM (
      SELECT *, CAST(row_number() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC)
        AS BIGINT) AS rank
      FROM pq_scored) WHERE rank <= 5
"""

#: IVFPQ (r7): the FAISS composition -- the IVF fragment's routing CTEs
#: (raw-vector cosines, same rounding/tie-break) gate which (query, vec)
#: pairs the PQ fragment's ADC may score.
_IVFPQ_COS_VC = (
    "round(list_dot_product(v.emb_raw, c.cent_emb) /"
    " nullif(sqrt(list_dot_product(v.emb_raw, v.emb_raw))"
    " * sqrt(list_dot_product(c.cent_emb, c.cent_emb)), 0), 6)"
)

_IVFPQ_SQL = f"""
    WITH eraw AS (
      SELECT vec_id, embedding::DOUBLE[] AS emb_raw,
             sqrt(list_dot_product(embedding::DOUBLE[],
                                   embedding::DOUBLE[])) AS nrm
      FROM embeddings WHERE embedding IS NOT NULL
    ),
    e AS (
      -- zero-norm drop-out mirrored from the operator (WHERE nrm > 0)
      SELECT vec_id, emb_raw,
             list_transform(emb_raw, x -> x / nrm) AS emb
      FROM eraw WHERE nrm > 0
    ),
    icents AS (
      SELECT vec_id AS cent_id, emb_raw AS cent_emb FROM eraw
      WHERE vec_id >= 100 AND vec_id < 116
    ),
    iassigned AS (
      SELECT vec_id, cent_id FROM (
        SELECT v.vec_id, c.cent_id,
               row_number() OVER (PARTITION BY v.vec_id
                 ORDER BY {_IVFPQ_COS_VC} DESC, c.cent_id ASC) AS crank
        FROM eraw v CROSS JOIN icents c
      ) WHERE crank = 1
    ),
    iprobes AS (
      SELECT query_id, cent_id FROM (
        SELECT v.vec_id AS query_id, c.cent_id,
               row_number() OVER (PARTITION BY v.vec_id
                 ORDER BY {_IVFPQ_COS_VC} DESC, c.cent_id ASC) AS crank
        FROM (SELECT * FROM eraw WHERE vec_id < 8) v CROSS JOIN icents c
      ) WHERE crank <= 3
    ),
    iallowed AS (
      SELECT p.query_id, a.vec_id
      FROM iprobes p JOIN iassigned a USING (cent_id)
    ),
    cb AS (
      SELECT CAST(vec_id - 200 AS INT) AS code_id, emb AS cb_emb FROM e
      WHERE vec_id >= 200 AND vec_id < {200 + _PQ_KSUB}
    ),
    sdl AS (
      SELECT v.vec_id, c.code_id, j.j,
             {_pq_subdist("v.emb", "c.cb_emb")} AS d
      FROM e v CROSS JOIN cb c
      CROSS JOIN (SELECT unnest(range(0, {_PQ_M})) AS j) j
    ),
    codes AS (
      SELECT vec_id, j, code_id AS code FROM (
        SELECT vec_id, j, code_id,
               row_number() OVER (PARTITION BY vec_id, j
                 ORDER BY d ASC, code_id ASC) AS rn
        FROM sdl) WHERE rn = 1
    ),
    qtab AS (
      SELECT vec_id AS query_id, j, code_id, d FROM sdl WHERE vec_id < 8
    ),
    adc AS (
      SELECT q.query_id, c.vec_id,
             round({_PQ_ADC_CHAIN}, 6) AS adc
      FROM codes c
      JOIN iallowed al ON al.vec_id = c.vec_id
      JOIN qtab q ON q.query_id = al.query_id
             AND q.j = c.j AND q.code_id = c.code
      WHERE q.query_id <> c.vec_id
      GROUP BY q.query_id, c.vec_id
    ),
    cands AS (
      SELECT query_id, vec_id FROM (
        SELECT query_id, vec_id, row_number() OVER (
          PARTITION BY query_id ORDER BY adc ASC, vec_id ASC) AS crank
        FROM adc) WHERE crank <= {_PQ_NCAND}
    ),
    ipq_scored AS (
      SELECT ca.query_id, ca.vec_id AS neighbor_id,
             round(list_dot_product(q.emb_raw, n.emb_raw)
                   / nullif(sqrt(list_dot_product(q.emb_raw, q.emb_raw))
                            * sqrt(list_dot_product(n.emb_raw, n.emb_raw)),
                            0), 6) AS cosine
      FROM cands ca
      JOIN e q ON q.vec_id = ca.query_id
      JOIN e n ON n.vec_id = ca.vec_id
    )
    SELECT query_id, neighbor_id, cosine, rank FROM (
      SELECT *, CAST(row_number() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC)
        AS BIGINT) AS rank
      FROM ipq_scored) WHERE rank <= 5
"""


#: IVF over the TRAINED index (r14): the same list-probing search as
#: _K4_IVF_SQL, but the centroid table is kmeans_train's unrolled-Lloyd
#: replay (the k3 CTE block verbatim -- ONE definition of the trained
#: index across both entries) instead of the fixed corpus slice.  This
#: closes the retrieval half of the 100-TB story: the deployment-path
#: ANN probes a trained, cell-balanced index end-to-end under the
#: driver's value gate, not just under a pytest recall gate.
_IVF_TRAINED_SQL = f"""
    WITH {_NORM_CTE},
    {_k3_trained_cents_ctes()},
    tassigned AS (
      SELECT neighbor_id, c_emb, cent_id FROM (
        SELECT v.vec_id AS neighbor_id, v.emb AS c_emb, c.cent_id,
               row_number() OVER (PARTITION BY v.vec_id
                 ORDER BY {_IVF_COS_VC} DESC, c.cent_id ASC) AS crank
        FROM e0 v CROSS JOIN tc{K3_KMEANS_ITER} c
      ) WHERE crank = 1
    ),
    tprobes AS (
      SELECT query_id, q_emb, cent_id FROM (
        SELECT q.vec_id AS query_id, q.emb AS q_emb, c.cent_id,
               row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY {_IVF_COS_QC} DESC, c.cent_id ASC) AS crank
        FROM (SELECT * FROM e0 WHERE vec_id < 8) q
        CROSS JOIN tc{K3_KMEANS_ITER} c
      ) WHERE crank <= 3
    ),
    tscored AS (
      SELECT DISTINCT p.query_id, a.neighbor_id, {_IVF_COS_PA} AS cosine
      FROM tprobes p JOIN tassigned a USING (cent_id)
      WHERE p.query_id <> a.neighbor_id
    )
    SELECT query_id, neighbor_id, cosine, rank FROM (
      SELECT *, CAST(row_number() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS BIGINT)
        AS rank
      FROM tscored
    ) WHERE rank <= 5
"""


@register(
    "k2_ann_lsh_ivf",
    f"""
    WITH allm AS (
      SELECT 'lsh' AS method, query_id, neighbor_id, cosine, rank
      FROM ({_K2_LSH_SQL})
      UNION ALL
      SELECT 'ivf' AS method, query_id, neighbor_id, cosine, rank
      FROM ({_K4_IVF_SQL})
      UNION ALL
      SELECT 'ivf_trained' AS method, query_id, neighbor_id, cosine, rank
      FROM ({_IVF_TRAINED_SQL})
      UNION ALL
      SELECT 'pq' AS method, query_id, neighbor_id, cosine, rank
      FROM ({_PQ_SQL})
      UNION ALL
      SELECT 'ivfpq' AS method, query_id, neighbor_id, cosine, rank
      FROM ({_IVFPQ_SQL})
    )
    SELECT method, query_id, neighbor_id, cosine, rank FROM allm
    UNION ALL
    -- reciprocal-rank fusion of the five method rankings (r10,
    -- similarity.rrf_fuse): floor(micro/(rrf_k+rank)) contributions,
    -- exact integer sums, fused rank on the raw micro sum; constants
    -- interpolated from similarity.RRF_K/RRF_MICRO (one definition)
    SELECT 'rrf' AS method, query_id, neighbor_id,
           CAST(sum_micro AS DOUBLE) / {_RRF_MICRO_F!r} AS cosine, rank
    FROM (
      SELECT query_id, neighbor_id, sum_micro,
             CAST(row_number() OVER (PARTITION BY query_id
               ORDER BY sum_micro DESC, neighbor_id ASC) AS BIGINT) AS rank
      FROM (
        SELECT query_id, neighbor_id,
               sum(CAST(floor({_RRF_MICRO_F!r} / ({_RRF_K_F!r} + rank))
                   AS BIGINT)) AS sum_micro
        FROM allm GROUP BY query_id, neighbor_id
      )
    ) WHERE rank <= {K2_RRF_K}
    """,
)
def k2_ann_lsh_ivf(spark, sf):
    """The two scale-path ANN variants, tagged and stacked in one slot
    (k1 above stays the exact baseline):

    * ``lsh`` -- sign-bucket LSH top-5: bucket equi-join replaces the
      cross join.
    * ``ivf`` -- IVF list-probing: corpus assigned to 16 fixed centroids
      (narrow broadcast pass), queries probe their 3 nearest lists, so
      candidate generation scans ~3/16 of the corpus via an equi-join.
    * ``ivf_trained`` (r14) -- the SAME list-probing search over a
      TRAINED index: ``similarity.kmeans_train`` at the shared k3 gate
      constants (16 centroids, 5 Lloyd iterations, quantize=6 -- the
      cross-engine replay barrier), sample-bounded training (vec_id <
      K3_KMEANS_SAMPLE, the FAISS train-on-a-sample posture) with
      full-corpus assignment.  The oracle replays the training as the
      k3 entry's unrolled-Lloyd CTE block verbatim (ONE definition of
      the trained index), so the deployment-path ANN -- balanced cells
      instead of a skewable fixed slice -- is value-gated end-to-end,
      completing the retrieval half of the trained-index story the k3
      ``semdedup_trained`` leg opened for dedup.  Trained-vs-seed
      recall stays pytest-gated (tests/test_asof_skew.py).
    * ``pq`` (r7) -- product quantization (Jegou et al., TPAMI 2011):
      vectors encoded as 16 codes over 4-dim subspaces (the FAISS
      billion-vector memory format -- the candidate scan reads a
      16x-smaller code table), searched by fixed-order ADC with a
      128-candidate exact re-rank; recall@5 0.975/0.90
      (sf0.001/sf0.1) vs brute force.
    * ``ivfpq`` (r7) -- the two composed (FAISS IVFPQ): IVF routing
      gates which (query, vec) pairs PQ's ADC scores, so the approximate
      scan covers ~3/16 of the corpus AND reads it 16x smaller.  Recall
      is bounded by the coarse router (measured: ivfpq 0.525/0.35
      tracks ivf's 0.525/0.375 at these fixed-slice settings -- the PQ
      stage loses almost nothing on top, which is the composition
      property tests/test_pq.py gates).

    * ``rrf`` (r10) -- reciprocal-rank fusion of the five method
      rankings (similarity.rrf_fuse, Cormack et al. 2009): the
      ensemble-retrieval combiner over approximate indexes.  Each
      (method, rank) row contributes floor(1e6/(60+rank)) micro-units;
      per-(query, neighbor) sums are exact integers, the fused rank
      orders on the raw micro sum, and ``cosine`` carries the fused
      score (micro/1e6 -- same integer, same double, both engines).
      The five rank tables are materialized once (200 rows) so the
      fusion subtree never re-runs the ANN suite.

    IVF and PQ recall vs the k1 exact baseline are pytest-gated
    (tests/test_asof_skew.py::test_ivf_recall_vs_bruteforce,
    tests/test_pq.py); every method's
    full top-k result set is value-verified against the DuckDB oracle
    here."""
    thunks = _k2_method_thunks(spark, sf)
    # the 5 method rank tables feed the output AND the rrf ensemble:
    # materialize once (200 rows) so the fusion subtree does not re-run
    # the whole ANN suite (the tv1 shared-pass discipline).  Thunk CALLS
    # run overlapped (r17, guide §2.6): each owns its eager work
    # (ivf_trained's driver-side training collect, pq's shared encode
    # checkpoint -- lock-guarded in _k2_method_thunks), which used to
    # serialize ahead of the union job
    tables = caching.run_overlapped(*thunks.values())
    allm = reduce(
        lambda a, b: a.unionByName(b), tables
    ).localCheckpoint(eager=True)
    return allm.unionByName(_k2_rrf_leg(allm))


def _k2_method_thunks(spark, sf):
    """The five k2 ANN method tables as LAZY thunks (ONE construction
    serving the registry entry and bench.py's per-leg timing -- r15):
    each thunk builds its tagged (method, query_id, neighbor_id,
    cosine, rank) table from scratch, including any eager work the
    method owns (``ivf_trained`` trains its index INSIDE the thunk, so
    a per-leg timing attributes the SF-invariant training cost to the
    leg that pays it)."""
    emb = _t(spark, sf, "embeddings")

    def tag(df, label):
        return df.select(
            F.lit(label).alias("method"),
            "query_id",
            "neighbor_id",
            "cosine",
            "rank",
        )

    # IVF routing stays UNSHARED here (r15 measured negative result):
    # sharing one checkpointed ivf_assign between the ivf and ivfpq
    # legs ran 7.5-8.6 s vs 7.2-8.0 s unshared over 3 interleaved reps
    # at sf0.1 -- materializing 2k payload-carrying assignment rows
    # plus the extra stage costs more than the ~0.5 s recompute it
    # saves at gate scale.  The `index=` overload exists for deployment
    # (where the assignment is a full corpus scan worth paying once);
    # the persist_shingles recompute-by-default posture applies.
    def lsh():
        return tag(
            similarity.cosine_topk_lsh(emb, k=5, n_queries=8, n_bits=4), "lsh"
        )

    def ivf():
        return tag(
            similarity.cosine_topk_ivf(
                emb,
                k=5,
                n_queries=8,
                n_centroids=16,
                n_probe=3,
                centroid_offset=100,
            ),
            "ivf",
        )

    def ivf_trained():
        # trained index at the shared k3 gate constants (r14): training
        # is sample-bounded (SF-invariant), the per-iteration
        # localCheckpoints leave the 16-row centroid table materialized
        # for the probe pass
        trained_cents = similarity.kmeans_train(
            emb.filter(F.col("vec_id") < K3_KMEANS_SAMPLE),
            n_centroids=K3_KMEANS_N,
            n_iter=K3_KMEANS_ITER,
            quantize=K3_KMEANS_Q,
        )
        return tag(
            similarity.cosine_topk_ivf(
                emb, k=5, n_queries=8, n_probe=3, centroids=trained_cents
            ),
            "ivf_trained",
        )

    # shared PQ encode (r15): pq and ivfpq used to encode the corpus
    # twice with identical parameters; one pq_encode(checkpoint=True)
    # now serves both (geometry rides the artifact).  Lazily built so
    # the FIRST consumer pays it -- in entry/leg order that is the pq
    # leg, and ivfpq's number becomes its true marginal (IVF routing +
    # the restricted ADC join).
    enc_box: dict = {}
    enc_lock = threading.Lock()

    def _enc():
        # lock-guarded: the entry calls the pq and ivfpq thunks
        # overlapped (r17), and an unguarded check-then-set would encode
        # the corpus twice under that concurrency; bench.py's per-leg
        # path still calls sequentially (pq first), so leg attribution
        # is unchanged
        with enc_lock:
            if "e" not in enc_box:
                enc_box["e"] = similarity.pq_encode(emb, checkpoint=True)
            return enc_box["e"]

    def pq():
        return tag(
            similarity.cosine_topk_pq(k=5, n_queries=8, encoding=_enc()),
            "pq",
        )

    def ivfpq():
        return tag(
            similarity.cosine_topk_ivfpq(
                emb,
                k=5,
                n_queries=8,
                n_centroids=16,
                n_probe=3,
                centroid_offset=100,
                encoding=_enc(),
            ),
            "ivfpq",
        )

    return {
        "lsh": lsh,
        "ivf": ivf,
        "ivf_trained": ivf_trained,
        "pq": pq,
        "ivfpq": ivfpq,
    }


def _k2_rrf_leg(allm):
    """The rrf fusion subtree over an already-materialized allm table."""
    return similarity.rrf_fuse(allm, k=K2_RRF_K).select(
        F.lit("rrf").alias("method"),
        "query_id",
        "neighbor_id",
        F.col("rrf_score").alias("cosine"),
        "rank",
    )


def _k2_leg_builder(spark, sf):
    """bench.py per-leg protocol for k2 (registry.LEG_BUILDERS): the
    entry eagerly checkpoints its whole method union at BUILD time, so
    the generic tag-filter timing would measure nothing.  Instead each
    method leg thunk builds AND materializes its own table (timing =
    that method's full standalone cost, training included), and the
    final ``rrf`` thunk fuses the five already-materialized tables
    (timing = the fusion's true in-entry marginal -- a 200-row
    aggregate).  One pass over the suite costs about one k2 entry run.
    Thunk order is the contract: rrf LAST (bench times legs in order)."""
    thunks = _k2_method_thunks(spark, sf)
    built: dict = {}

    def mk(mname, thunk):
        def leg():
            df = thunk().localCheckpoint(eager=True)
            built[mname] = df
            return df

        return leg

    legs = {mname: mk(mname, t) for mname, t in thunks.items()}

    def rrf():
        allm = reduce(lambda a, b: a.unionByName(b), built.values())
        return _k2_rrf_leg(allm)

    legs["rrf"] = rrf
    return legs


_K3_COS_VC = (
    "round(list_dot_product(v.emb, c.cent_emb) /"
    " nullif(sqrt(list_dot_product(v.emb, v.emb))"
    " * sqrt(list_dot_product(c.cent_emb, c.cent_emb)), 0), 6)"
)

@register(
    "k3_embedding_near_pairs",
    f"""
    WITH RECURSIVE e0 AS (
      SELECT vec_id, embedding::DOUBLE[] AS emb,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm,
             concat(CASE WHEN embedding[1] >= 0 THEN '1' ELSE '0' END,
                    CASE WHEN embedding[2] >= 0 THEN '1' ELSE '0' END,
                    CASE WHEN embedding[3] >= 0 THEN '1' ELSE '0' END,
                    CASE WHEN embedding[4] >= 0 THEN '1' ELSE '0' END) AS bucket
      FROM embeddings WHERE embedding IS NOT NULL
    ),
    e AS (
      SELECT vec_id, list_transform(emb, x -> x / nrm) AS emb_n, bucket
      FROM e0 WHERE nrm > 0
    ),
    cents AS (
      SELECT vec_id AS cent_id, emb AS cent_emb FROM e0
      WHERE vec_id >= 100 AND vec_id < 116
    ),
    assigned AS (
      -- NULL sims filtered BEFORE the rank election (r13): the
      -- operator's assign_to_centroids drops directionless candidates
      -- before max_by, so a vector with only NULL cosines gets NO cell
      -- instead of an arbitrary NULLS-LAST one
      SELECT vec_id, cent_id FROM (
        SELECT vec_id, cent_id,
               row_number() OVER (PARTITION BY vec_id
                 ORDER BY sim DESC, cent_id ASC) AS crank
        FROM (
          SELECT v.vec_id, c.cent_id, {_K3_COS_VC} AS sim
          FROM e0 v CROSS JOIN cents c
        ) WHERE sim IS NOT NULL
      ) WHERE crank = 1
    ),
    cell_pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM assigned a
      JOIN assigned b ON a.cent_id = b.cent_id AND a.vec_id < b.vec_id
      JOIN e ea ON ea.vec_id = a.vec_id
      JOIN e eb ON eb.vec_id = b.vec_id
      WHERE round(list_dot_product(ea.emb_n, eb.emb_n), 6) >= 0.35
    ),
    edges AS (
      SELECT id_a AS a, id_b AS b FROM cell_pairs
      UNION
      SELECT id_b AS a, id_a AS b FROM cell_pairs
    ),
    verts AS (SELECT DISTINCT a AS v FROM edges),
    reach(v, r) AS (
      SELECT v, v FROM verts
      UNION
      SELECT e2.a, reach.r FROM edges e2 JOIN reach ON reach.v = e2.b
    ),
    comp AS (SELECT v AS vec_id, min(r) AS cluster_id FROM reach GROUP BY v),
    -- trained-centroid index (r13): kmeans_train replayed as unrolled
    -- Lloyd iterations (deterministic init, round-9 assignment cosine,
    -- per-iteration round-{K3_KMEANS_Q} quantization barrier), then the
    -- SAME semdedup pipeline over the trained cells
    {_k3_trained_cents_ctes()},
    tassigned AS (
      SELECT vec_id, cent_id FROM (
        SELECT vec_id, cent_id,
               row_number() OVER (PARTITION BY vec_id
                 ORDER BY sim DESC, cent_id ASC) AS crank
        FROM (
          SELECT v.vec_id, c.cent_id, {_K3_COS_VC} AS sim
          FROM e0 v CROSS JOIN tc{K3_KMEANS_ITER} c
        ) WHERE sim IS NOT NULL
      ) WHERE crank = 1
    ),
    tcell_pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM tassigned a
      JOIN tassigned b ON a.cent_id = b.cent_id AND a.vec_id < b.vec_id
      JOIN e ea ON ea.vec_id = a.vec_id
      JOIN e eb ON eb.vec_id = b.vec_id
      WHERE round(list_dot_product(ea.emb_n, eb.emb_n), 6) >= 0.35
    ),
    tedges AS (
      SELECT id_a AS a, id_b AS b FROM tcell_pairs
      UNION
      SELECT id_b AS a, id_a AS b FROM tcell_pairs
    ),
    tverts AS (SELECT DISTINCT a AS v FROM tedges),
    treach(v, r) AS (
      SELECT v, v FROM tverts
      UNION
      SELECT e3.a, treach.r FROM tedges e3 JOIN treach ON treach.v = e3.b
    ),
    tcomp AS (SELECT v AS vec_id, min(r) AS cluster_id FROM treach GROUP BY v)
    SELECT 'near_pairs' AS op, q.vec_id AS id_a, c.vec_id AS id_b,
           round(list_dot_product(q.emb_n, c.emb_n), 6) AS cosine,
           CAST(NULL AS BOOLEAN) AS keep
    FROM e q JOIN e c ON q.bucket = c.bucket AND q.vec_id < c.vec_id
    WHERE round(list_dot_product(q.emb_n, c.emb_n), 6) >= 0.35
    UNION ALL
    SELECT 'semdedup' AS op, raw.vec_id AS id_a,
           coalesce(comp.cluster_id, raw.vec_id) AS id_b,
           CAST(NULL AS DOUBLE) AS cosine,
           coalesce(comp.cluster_id, raw.vec_id) = raw.vec_id AS keep
    -- the RAW table, not e0: semdedup verdicts every document, and a
    -- NULL/zero embedding that can pair with nothing is a kept
    -- singleton (the Spark operator's final union reads raw ids too)
    FROM embeddings raw LEFT JOIN comp ON raw.vec_id = comp.vec_id
    UNION ALL
    -- the SAME semdedup election over the TRAINED cells (r13): the
    -- 100-TB skew answer -- balanced trained cells keep the
    -- within-cell quadratic bounded where a fixed corpus slice cannot
    SELECT 'semdedup_trained' AS op, raw.vec_id AS id_a,
           coalesce(tcomp.cluster_id, raw.vec_id) AS id_b,
           CAST(NULL AS DOUBLE) AS cosine,
           coalesce(tcomp.cluster_id, raw.vec_id) = raw.vec_id AS keep
    FROM embeddings raw LEFT JOIN tcomp ON raw.vec_id = tcomp.vec_id
    UNION ALL
    -- incremental semantic admission (r12,
    -- similarity.semantic_admit_batch): history = even vec_ids (the
    -- persisted corpus state), batch = odd (the d7 parity-split
    -- precedent); each batch vector near-dup-tests ONLY within its
    -- centroid cell, best match = highest cosine with ties to the
    -- lowest history id; keep carries 'admitted' (best cosine below
    -- threshold, or no directional match -- NULL/zero-norm batch
    -- vectors admit with NULL match, the kept-singleton policy)
    SELECT 'admit' AS op, raw.vec_id AS id_a, ab.match_id AS id_b,
           ab.cosine AS cosine,
           coalesce(ab.cosine < 0.35, TRUE) AS keep
    FROM embeddings raw LEFT JOIN (
      -- NULL cosines filtered BEFORE the rank election (r13): the
      -- operator drops directionless candidates before min_by, so the
      -- oracle must not elect one via NULLS-LAST ordering defaults
      SELECT vec_id, match_id, cosine FROM (
        SELECT vec_id, match_id, cosine,
               row_number() OVER (PARTITION BY vec_id
                 ORDER BY cosine DESC, match_id ASC) AS arank
        FROM (
          SELECT b.vec_id, h.vec_id AS match_id,
                 round(list_dot_product(eb.emb_n, eh.emb_n), 6) AS cosine
          FROM assigned b
          JOIN assigned h ON b.cent_id = h.cent_id
          JOIN e eb ON eb.vec_id = b.vec_id
          JOIN e eh ON eh.vec_id = h.vec_id
          WHERE b.vec_id % 2 = 1 AND h.vec_id % 2 = 0
        ) WHERE cosine IS NOT NULL
      ) WHERE arank = 1
    ) ab ON raw.vec_id = ab.vec_id
    WHERE raw.vec_id % 2 = 1
    """,
)
def k3_embedding_near_pairs(spark, sf):
    """The embedding-space dedup surface, tagged and stacked:

    - ``op='near_pairs'``: embedding-cosine near-duplicate pairs
      (sign-bucketed self-join, cosine >= 0.35 -- chosen below the
      corpus' max pairwise cosine so the operator returns a non-trivial
      set).
    - ``op='semdedup'``: SemDeDup-style semantic dedup
      (``similarity.semantic_dedup``, arXiv:2303.09540) at the same
      threshold: broadcast centroid assignment (fixed corpus-slice
      centroids the oracle replays) -> within-cell exact pairs ->
      connected components -> min-id keep-list.  ``id_b`` carries the
      elected cluster; the oracle recomputes the components with a
      recursive CTE (the d6 precedent).
    - ``op='admit'`` (r12): incremental semantic admission
      (``similarity.semantic_admit_batch``) -- history = even vec_ids
      (the persisted corpus state), batch = odd (the d7 parity-split
      precedent), the SAME fixed centroid index.  Each batch vector
      near-dup-tests ONLY within its cell against the history state;
      ``id_b``/``cosine`` carry the best match, ``keep`` the admission
      verdict.  At 100 TB this is the operation that replaces
      semdedup-from-scratch per ingest batch.
    - ``op='semdedup_trained'`` (r13): the SAME semdedup election over
      a TRAINED centroid index -- ``similarity.kmeans_train`` at the
      K3_KMEANS_N/ITER/Q gate constants (16 centroids, 5 Lloyd
      iterations, quantize=6), replayed in the oracle as unrolled-Lloyd
      CTEs (the quantization barrier makes the replay engine-exact).
      Trained cells are the
      100-TB skew answer for every cell-bounded operator: a fixed
      corpus slice can leave one hot cell holding most of the corpus
      (the within-cell quadratic blows up), trained centroids balance
      the cells (pytest-gated max/mean cell-size ratio,
      tests/test_semantic_dedup.py)."""
    emb = _t(spark, sf, "embeddings")
    pairs = similarity.pairwise_above(emb, threshold=0.35, n_bits=4).select(
        F.lit("near_pairs").alias("op"),
        "id_a",
        "id_b",
        "cosine",
        F.lit(None).cast("boolean").alias("keep"),
    )
    # ONE centroid-assignment pass feeds the semdedup leg, admission's
    # history state, AND its batch side (the tv1 shared-pass
    # discipline): the table is tiny-per-row (vec_id, cent_id, emb_n),
    # and without the checkpoint each consumer would re-run the
    # broadcast-argmax corpus pass
    cents = similarity.default_centroids(emb)
    # trained-centroid index (r13): kmeans_train on the deterministic
    # id-prefix SAMPLE (the FAISS posture -- train bounded, assign
    # full); quantize=6 is the cross-engine replay barrier (see
    # kmeans_train's docstring).  Since r17 the bounded sample trains
    # driver-side (one collect, no per-iteration checkpoint jobs) and
    # the 16-row table is a JVM literal.
    trained = similarity.kmeans_train(
        emb.filter(F.col("vec_id") < K3_KMEANS_SAMPLE),
        n_centroids=K3_KMEANS_N,
        n_iter=K3_KMEANS_ITER,
        quantize=K3_KMEANS_Q,
    )
    # the two full-corpus assignment passes are independent: overlap
    # their checkpoint jobs (r17, guide §2.6) instead of paying two
    # sequential scheduling round-trips
    assigned_full, assigned_tr = caching.checkpoint_overlapped(
        similarity.assign_to_centroids(emb, cents),
        similarity.assign_to_centroids(emb, trained),
    )
    # ONE pass labels BOTH semdedup pair graphs: the trained graph's
    # vertex ids AND cells are offset into a disjoint space (see
    # K3_CC_OFFSET), then partitioned_components runs per-cell
    # union-find -- every near pair is within-cell by construction, so
    # the generic label-propagation loop (measured 12-13
    # checkpoint+probe rounds on this graph at sf0.1) is replaced by
    # one shuffle on the cell key; labels split back by range
    off = F.lit(K3_CC_OFFSET)
    pair_graph = (
        similarity.semantic_near_pairs(assigned_full, threshold=0.35)
        .select("cell", "id_a", "id_b")
        .unionByName(
            similarity.semantic_near_pairs(assigned_tr, threshold=0.35)
            .select(
                (F.col("cell") + off).alias("cell"),
                (F.col("id_a") + off).alias("id_a"),
                (F.col("id_b") + off).alias("id_b"),
            )
        )
    )
    # materialized once: the label table feeds BOTH output legs, and
    # without the barrier each would replay the pair join + union-find
    comp = dedup.partitioned_components(
        pair_graph, part_col="cell", a_col="id_a", b_col="id_b"
    ).localCheckpoint(eager=True)
    comp_fixed = comp.filter(F.col("doc_id") < K3_CC_OFFSET)
    comp_tr = comp.filter(F.col("doc_id") >= K3_CC_OFFSET).select(
        (F.col("doc_id") - off).alias("doc_id"),
        (F.col("cluster_id") - off).alias("cluster_id"),
    )
    # components= alone: the labels carry the whole dedup semantics
    # (built from the 0.35 fixed-slice pair graph above), and
    # semantic_dedup raises on any other parameter passed alongside
    sem = similarity.semantic_dedup(emb, components=comp_fixed).select(
        F.lit("semdedup").alias("op"),
        F.col("vec_id").alias("id_a"),
        F.col("sem_cluster").alias("id_b"),
        F.lit(None).cast("double").alias("cosine"),
        "keep",
    )
    # the persisted centroid index is the same fixed corpus slice the
    # semdedup leg assigns under (similarity.default_centroids, ONE
    # definition), passed EXPLICITLY (an admission index must be stable
    # across batches -- deriving it from the even-id history would
    # silently re-index)
    adm = similarity.semantic_admit_batch(
        history=None,
        batch=emb.filter(F.col("vec_id") % 2 == 1),
        threshold=0.35,
        centroids=cents,
        history_state=assigned_full.filter(F.col("vec_id") % 2 == 0),
        batch_state=assigned_full.filter(F.col("vec_id") % 2 == 1),
    ).report.select(
        F.lit("admit").alias("op"),
        F.col("vec_id").alias("id_a"),
        F.col("match_id").alias("id_b"),
        "cosine",
        F.col("admitted").alias("keep"),
    )
    sem_tr = similarity.semantic_dedup(emb, components=comp_tr).select(
        F.lit("semdedup_trained").alias("op"),
        F.col("vec_id").alias("id_a"),
        F.col("sem_cluster").alias("id_b"),
        F.lit(None).cast("double").alias("cosine"),
        "keep",
    )
    return (
        pairs.unionByName(sem).unionByName(adm).unionByName(sem_tr)
    )


# ---------------------------------------------------------------------------
# Text analysis over documents
# ---------------------------------------------------------------------------


_LANGS = sorted(STOPWORDS)


def _hits_from_t_sql(lang: str) -> str:
    """Stopword-hit count computed from the materialized token list ``t``."""
    words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return f"len(list_filter(t, x -> list_contains([{words}], x)))"


_LANG_CASE = " ".join(f"WHEN hits_{lang} = best THEN '{lang}'" for lang in _LANGS)

#: PII patterns shared with the operator (ONE pattern source).  Since r8
#: the phone pattern is RE2-compatible (boundary capture group instead of
#: lookarounds), so ALL three staged counts run on the DuckDB oracle:
#: n_phone counts occurrences of the pattern's capture group
#: (``_PHONE_GRP``) on the email+ip-redacted text, exactly as the Spark
#: stage does.
_EMAIL_PAT = textops.PII_PATTERNS[0][1]
_IP_PAT = textops.PII_PATTERNS[1][1]
_PHONE_PAT = textops.PII_PATTERNS[2][1]
_PHONE_GRP = textops.PII_PATTERNS[2][3]

#: trimmed non-empty lines -- DuckDB mirror of textops._lines_col
_LINES_SQL = (
    "list_filter(list_transform(string_split_regex(coalesce(text, ''),"
    " '\\r?\\n'), x -> trim(x)), x -> x <> '')"
)


def _line_frac_sql(pat: str) -> str:
    return (
        "CASE WHEN len(lines) > 0 THEN "
        f"round(len(list_filter(lines, x -> regexp_matches(x, '{pat}')))"
        " / CAST(len(lines) AS DOUBLE), 4) ELSE 0.0 END"
    )


_TERMINAL_FRAC = _line_frac_sql('[.!?"”]$')
_BULLET_FRAC = _line_frac_sql("^[-*•]")
_ELLIPSIS_FRAC = _line_frac_sql(r"\.\.\.$")


@register(
    "t1_text_profile",
    rf"""
    WITH toked AS (
      SELECT doc_id, lang, text,
             list_filter(string_split_regex(lower(coalesce(text, '')),
                                            '{TOKEN_SPLIT_REGEX}'),
                         x -> x <> '') AS t,
             {_LINES_SQL} AS lines, coalesce(text, '') AS t0
      FROM documents
    ),
    feat AS (
      SELECT doc_id, lang,
             CAST(len(t) AS BIGINT) AS n_tokens_ws,
             CAST(len(regexp_extract_all(lower(coalesce(text, '')),
                                         '{BPE_TOKEN_REGEX}'))
               AS BIGINT) AS n_tokens_bpe,
             CAST(length(text) AS BIGINT) AS n_chars,
             md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
               AS fingerprint,
             coalesce(CAST(length(regexp_replace(text, '[a-zA-Z0-9\s]', '', 'g'))
                 AS DOUBLE) / nullif(CAST(length(text) AS DOUBLE), 0), 0) AS pr,
             {", ".join(f"CAST({_hits_from_t_sql(lang)} AS BIGINT) AS hits_{lang}" for lang in _LANGS)},
             CAST(len(lines) AS BIGINT) AS n_lines,
             CASE WHEN len(lines) > 0 THEN
               round(1.0 - len(list_distinct(lines)) / CAST(len(lines) AS DOUBLE), 4)
             ELSE 0.0 END AS dup_line_frac,
             {_TERMINAL_FRAC} AS terminal_punct_line_frac,
             {_BULLET_FRAC} AS bullet_line_frac,
             {_ELLIPSIS_FRAC} AS ellipsis_line_frac,
             CAST(len(regexp_extract_all(t0, '{_EMAIL_PAT}')) AS BIGINT)
               AS n_email,
             CAST(len(regexp_extract_all(
                    regexp_replace(t0, '{_EMAIL_PAT}', '<EMAIL>', 'g'),
                    '{_IP_PAT}')) AS BIGINT) AS n_ip,
             CAST(len(regexp_extract_all(
                    regexp_replace(
                      regexp_replace(t0, '{_EMAIL_PAT}', '<EMAIL>', 'g'),
                      '{_IP_PAT}', '<IP>', 'g'),
                    '{_PHONE_PAT}', {_PHONE_GRP})) AS BIGINT) AS n_phone
      FROM toked
    )
    SELECT doc_id, n_tokens_ws, n_tokens_bpe, n_chars, fingerprint,
           round(CAST(n_chars AS DOUBLE) / nullif(CAST(n_tokens_ws AS DOUBLE), 0), 4)
             AS mean_token_len,
           round(pr, 4) AS punct_ratio,
           round(coalesce(hits_en / nullif(CAST(n_tokens_ws AS DOUBLE), 0), 0), 4)
             AS stopword_ratio,
           floor((least(CAST(n_tokens_ws AS DOUBLE) / 100.0, 1.0) * 0.4
                 + least(coalesce(hits_en / nullif(CAST(n_tokens_ws AS DOUBLE), 0), 0) * 5, 1.0) * 0.3
                 + (1 - least(pr * 10, 1.0)) * 0.3) * 10000.0 + 1e-7) / 10000.0 AS quality_score,
           lang AS lang_true,
           CASE WHEN best = 0 THEN 'und' {_LANG_CASE} END AS lang_pred,
           n_lines, dup_line_frac, terminal_punct_line_frac,
           bullet_line_frac, ellipsis_line_frac, n_email, n_ip, n_phone
    FROM (
      SELECT *, greatest({", ".join(f"hits_{lang}" for lang in _LANGS)}) AS best
      FROM feat
    )
    """,
)
def t1_text_profile(spark, sf):
    """The per-document text-analysis stage, fused: whitespace + BPE-ish
    token counts, md5 fingerprint, quality features + composite score,
    stopword-heuristic language ID (deterministic argmax tie-break), AND
    the hygiene family (C4/Gopher repetition fractions + staged PII
    counts) -- all from ONE corpus scan
    (operators/textops.text_profile(include_hygiene=True)).  All THREE
    staged PII counts are driver-oracled since r8 (the phone pattern is
    RE2-compatible now -- boundary capture group instead of lookarounds);
    only ``text_redacted`` stays out of the projection (the oracle
    counts, it does not rewrite text).  Redaction output remains
    hand-golden + property gated in tests/test_text_hygiene.py.  The
    individual featurisers remain available as separate operators; the
    registry entry runs the fused production shape."""
    return textops.text_profile(
        _t(spark, sf, "documents"), include_hygiene=True
    ).select(
        "doc_id",
        "n_tokens_ws",
        "n_tokens_bpe",
        "n_chars",
        "fingerprint",
        "mean_token_len",
        "punct_ratio",
        "stopword_ratio",
        "quality_score",
        "lang_true",
        "lang_pred",
        "n_lines",
        "dup_line_frac",
        "terminal_punct_line_frac",
        "bullet_line_frac",
        "ellipsis_line_frac",
        "n_email",
        "n_ip",
        "n_phone",
    )


# ---------------------------------------------------------------------------
# Multimodal columns (binary payload + typed metadata; operators/multimodal)
# ---------------------------------------------------------------------------


@register(
    "m1_media_catalog",
    """
    SELECT CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
                WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
           count(*) AS n_media,
           CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           CAST(max(64 + (doc_id % 16) * 32) AS INT) AS max_width
    FROM documents GROUP BY kind
    """,
)
def m1_media_catalog(spark, sf):
    """Media catalog rollup: binary payload + typed meta are first-class
    columns; the aggregate proves payload bytes and meta derivations stay
    JVM-side (octet_length of utf-8 == Spark length(binary))."""
    media = multimodal.synth_media_from_docs(_t(spark, sf, "documents"))
    return (
        media.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.sum(F.length("payload").cast("long")).alias("total_bytes"),
            F.max("meta.width").alias("max_width"),
        )
    )


@register(
    "m2_media_features",
    """
    SELECT doc_id AS media_id,
           CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
                WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           true AS recompute_ok
    FROM documents
    """,
)
def m2_media_features(spark, sf):
    """Arrow-batched mapInPandas decode/feature stage over binary payloads
    (stubbed codecs -- deterministic fake features; plumbing is real).

    The feature VALUES (crc32, byte entropy, first byte) are computed in
    Python and cannot be expressed in SQL; their correctness is pytest-gated
    by a python-recompute (tests/test_multimodal.py).  What the driver gate
    verifies here: the row universe (one feature row per media row), the
    byte accounting (n_bytes matches the payload length the oracle derives
    JVM-side), and an IN-PLANE determinism check -- the stage runs twice as
    two independent mapInPandas subtrees and ``recompute_ok`` asserts every
    feature column agrees, with the oracle expecting ``true``."""
    media = multimodal.synth_media_from_docs(_t(spark, sf, "documents"))
    a = multimodal.media_features(media).alias("a")
    b = multimodal.media_features(media).alias("b")
    # eqNullSafe: NULL-payload rows carry NULL features on BOTH runs
    # (the documented multimodal policy); plain == would turn the
    # determinism gate NULL where the oracle expects true
    ok = (
        F.col("a.n_bytes").eqNullSafe(F.col("b.n_bytes"))
        & F.col("a.crc32").eqNullSafe(F.col("b.crc32"))
        & F.col("a.byte_entropy").eqNullSafe(F.col("b.byte_entropy"))
        & F.col("a.first_byte").eqNullSafe(F.col("b.first_byte"))
    )
    return a.join(b, F.col("a.media_id") == F.col("b.media_id")).select(
        F.col("a.media_id").alias("media_id"),
        F.col("a.kind").alias("kind"),
        F.col("a.n_bytes").alias("n_bytes"),
        ok.alias("recompute_ok"),
    )


@register(
    "m3_frame_sample",
    """
    WITH videos AS (
      SELECT doc_id AS media_id, octet_length(encode(text)) AS n
      FROM documents WHERE CAST(doc_id % 3 AS INT) = 2
    )
    SELECT media_id, CAST(i AS INT) AS frame_idx,
           CAST(n * (i + 1) // 4 - n * i // 4 AS BIGINT) AS n_bytes
    FROM videos, (SELECT unnest(range(0, 4)) AS i)
    """,
)
def m3_frame_sample(spark, sf):
    """One-to-many frame sampling via mapInPandas (video -> 4 byte-slice
    frames); the oracle reproduces the slice-length arithmetic, proving the
    explode shape and byte accounting without shipping payloads."""
    media = multimodal.synth_media_from_docs(_t(spark, sf, "documents"))
    return multimodal.sample_frames(media, n_frames=4).select(
        "media_id", "frame_idx", "n_bytes"
    )
# ---------------------------------------------------------------------------
# Leg declarations (r15): tagged-union entries, for bench.py's per-leg
# timing breakdown (pinned by tests/test_bench_legs.py).
# k2 materializes its method union at build time, so its legs are timed
# through the explicit builder (rrf last -- it fuses the five tables the
# method thunks materialized)
register_legs(
    "k2_ann_lsh_ivf",
    "method",
    ("lsh", "ivf", "ivf_trained", "pq", "ivfpq", "rrf"),
    builder=_k2_leg_builder,
)
register_legs(
    "k3_embedding_near_pairs",
    "op",
    ("admit", "near_pairs", "semdedup", "semdedup_trained"),
)
register_legs(
    "k1_knn_bruteforce",
    "op",
    (
        "hard_neg",
        "hard_neg_ivf",
        "hard_pos",
        "hard_pos_ivf",
        "knn",
        "semi_hard",
        "semi_hard_ivf",
    ),
)
# m1_media_catalog is deliberately NOT declared: its kind column is
# derived from doc_id inside ONE scan+aggregate (not a stacked union),
# so there is no per-leg subtree to time.
