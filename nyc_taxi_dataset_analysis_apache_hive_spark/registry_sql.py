"""Declarative SQL entry points: usage-mode parity with the reference.

The reference user writes HiveQL *text* (the whole of
/root/reference/Surabhi_Srinath_NYC_Taxi_Assignment_FInal.txt is declarative
SQL); round 2 proved semantic parity through the DataFrame API only.  This
module closes the usage-mode gap: every SQL-expressible registry entry also
runs as ``spark.sql(...)`` text over the temp-view catalog that
:func:`..sources.readers.load_testdata` registers (the Spark analog of the
reference's ``USE ss`` metastore catalog, REF:18).

``SQL_QUERIES[name]`` is Spark SQL producing the SAME columns and rows as
``registry.QUERIES[name]`` -- asserted pairwise in
tests/test_sql_mode.py.  The statements are the DuckDB oracles' shapes
re-spelled in Spark's function surface (``unix_timestamp``/``unix_micros``
for ``epoch``/``epoch_us``, ``get_json_object`` for
``json_extract_string``); everything else -- grouping sets, set ops,
windows, percentiles -- is shared ANSI that Spark's Hive-heritage parser
accepts verbatim.

Entries NOT here are the ones whose semantics are not a single SQL
statement (multi-step dedup pipelines, iterative clustering, mapInPandas
media stages, salted-plan variants): their declarative form IS the
DataFrame program, and their value parity is driver-oracled instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .session import apply_runtime_confs
from .sources.readers import load_testdata


def _s6_split_case() -> str:
    """CASE arm embedding sampling.hash_split's OWN float-exact boundaries
    (one definition in sampling.cumulative_split_bounds) as repr literals,
    so the SQL path compares u bit-identically."""
    from .operators.sampling import cumulative_split_bounds

    bounds = cumulative_split_bounds((0.8, 0.1, 0.1))
    return (
        f"CASE WHEN u < {bounds[0]!r}D THEN 0 "
        f"WHEN u < {bounds[1]!r}D THEN 1 ELSE 2 END"
    )


SQL_QUERIES: dict[str, str] = {
    # -- §2.2 projections / filters / predicates ---------------------------
    "p1_limit_peek": """
        SELECT *, r_name AS region_name, r_regionkey AS region_id
        FROM region ORDER BY r_regionkey LIMIT 3
    """,
    "p3_filter_compare": """
        SELECT l_orderkey, l_linenumber, l_discount
        FROM lineitem WHERE l_discount < 0.02
    """,
    "p4_not_in_set": """
        SELECT l_returnflag, count(*) AS cnt
        FROM lineitem
        WHERE l_quantity NOT IN (1.0, 2.0, 3.0)
        GROUP BY l_returnflag
    """,
    "p5_dirty_or_predicate": """
        SELECT l_returnflag, count(*) AS cnt
        FROM (
          SELECT l_returnflag, l_quantity, l_discount, l_tax, l_shipdate,
                 l_extendedprice * (1 - l_discount) AS profit
          FROM lineitem
        )
        WHERE l_quantity <= 2 OR l_discount > 0.09 OR l_tax < 0.01
           OR profit > 90000 OR year(l_shipdate) = 1995
           OR month(l_shipdate) NOT IN (2,3,4,5,6,7,8,9,10,11,12)
        GROUP BY l_returnflag
    """,
    "p6_in_list": """
        SELECT l_returnflag, count(*) AS cnt
        FROM lineitem
        WHERE month(l_shipdate) IN (11, 12)
        GROUP BY l_returnflag
    """,
    "p7_derived_duration_join": """
        SELECT o_orderpriority,
               min(delay_hours) AS min_delay,
               max(delay_hours) AS max_delay,
               round(avg(delay_hours), 2) AS avg_delay
        FROM (
          SELECT o.o_orderpriority,
                 (unix_timestamp(l.l_shipdate) - unix_timestamp(o.o_orderdate))
                   / 3600 AS delay_hours
          FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        )
        GROUP BY o_orderpriority
    """,
    "p8_derived_rate": """
        SELECT event_type, round(avg(rate), 2) AS avg_rate
        FROM (
          SELECT event_type,
                 value / nullif((unix_micros(ts)
                   - unix_micros(date_trunc('day', ts))) / 3600000000.0, 0)
                   AS rate
          FROM events
        )
        GROUP BY event_type
    """,
    # -- §2.4 aggregations -------------------------------------------------
    "a1_group_count": """
        SELECT l_returnflag, count(*) AS cnt FROM lineitem GROUP BY l_returnflag
    """,
    "a3_two_key_count": """
        SELECT l_returnflag, l_linestatus, count(*) AS cnt,
               count(l_quantity) AS cnt_qty
        FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
    "a4_minmax_timestamp": """
        SELECT o_orderstatus,
               min(o_orderdate) AS min_date, max(o_orderdate) AS max_date
        FROM orders GROUP BY o_orderstatus
    """,
    "a5_derived_stats": """
        SELECT event_type, min(value) AS minval, max(value) AS maxval,
               round(avg(value), 2) AS average
        FROM events GROUP BY event_type
    """,
    "a6_global_avg": """
        SELECT round(avg(l_extendedprice), 2) AS avg_price FROM lineitem
    """,
    "a7_avg_by_key": """
        SELECT CAST(year(l_shipdate) AS BIGINT) AS yr,
               round(avg(l_extendedprice), 2) AS avg_price
        FROM lineitem GROUP BY yr
    """,
    "a8_corr": """
        SELECT round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price
        FROM lineitem
    """,
    "a10_distinct_counts": """
        SELECT l_returnflag, n_supp, n_part,
               abs(n_supp_approx - n_supp)
                 <= greatest(0.05D * n_supp, 2) AS approx_ok
        FROM (
          SELECT l_returnflag,
                 count(DISTINCT l_suppkey) AS n_supp,
                 count(DISTINCT l_partkey) AS n_part,
                 approx_count_distinct(l_suppkey, 0.02) AS n_supp_approx
          FROM lineitem GROUP BY l_returnflag
        )
    """,
    "a9_percentile": """
        SELECT round(ps[0], 4) AS p25,
               round(ps[1], 4) AS p50,
               round(ps[2], 4) AS p75,
               (abs(pa[0] - ps[0]) <= 0.01 * abs(ps[0])
                AND abs(pa[1] - ps[1]) <= 0.01 * abs(ps[1])
                AND abs(pa[2] - ps[2]) <= 0.01 * abs(ps[2])) AS approx_ok
        FROM (
          SELECT percentile(l_extendedprice, array(0.25D, 0.50D, 0.75D)) AS ps,
                 percentile_approx(l_extendedprice,
                                   array(0.25D, 0.50D, 0.75D)) AS pa
          FROM lineitem
        )
    """,
    # -- §2.5 windows, §2.3 joins, F9, §2.6 sort/limit ---------------------
    "w1_pct_share": """
        SELECT o_orderpriority, count(*) AS cnt,
               round(count(*) * 100.0D / sum(count(*)) OVER (), 2) AS pct
        FROM orders GROUP BY o_orderpriority
    """,
    "w2_rank_per_group": """
        SELECT o_orderpriority, o_orderkey, o_totalprice, rn FROM (
          SELECT o_orderpriority, o_orderkey, o_totalprice,
                 CAST(row_number() OVER (
                   PARTITION BY o_orderpriority
                   ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS rn
          FROM orders
        ) WHERE rn <= 3
    """,
    "j1_scalar_cross_ratio": """
        SELECT round(flagged / total, 2) AS discounted_fraction
        FROM (SELECT count(*) AS flagged FROM lineitem WHERE l_discount > 0)
        CROSS JOIN (SELECT count(*) AS total FROM lineitem)
    """,
    "j2_semi_anti_join": """
        SELECT 'has_big_order' AS segment, c_custkey, c_name FROM customer c
        WHERE EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000
        )
        UNION ALL
        SELECT 'no_orders' AS segment, c_custkey, c_name FROM customer c
        WHERE NOT EXISTS (
          SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
        )
    """,
    "j4_outer_join": """
        SELECT n_name, CAST(coalesce(n_customers, 0) AS BIGINT) AS n_customers
        FROM nation n LEFT JOIN (
          SELECT c_nationkey, count(*) AS n_customers
          FROM customer GROUP BY c_nationkey
        ) c ON n.n_nationkey = c.c_nationkey
    """,
    "f9_case_segmentation": """
        SELECT price_segment, count(*) AS cnt,
               round(count(*) * 100.0D / sum(count(*)) OVER (), 2) AS segment_pct
        FROM (
          SELECT CASE
            WHEN l_extendedprice < 10000 THEN '[0-10k)'
            WHEN l_extendedprice >= 10000 AND l_extendedprice < 30000
              THEN '[10k-30k)'
            WHEN l_extendedprice >= 30000 AND l_extendedprice < 60000
              THEN '[30k-60k)'
            WHEN l_extendedprice >= 60000 AND l_extendedprice < 90000
              THEN '[60k-90k)'
            ELSE '>=90k' END AS price_segment
          FROM lineitem
        )
        GROUP BY price_segment
    """,
    "o3_topk_multi_sort": """
        SELECT p_brand, count(*) AS cnt FROM part GROUP BY p_brand
        ORDER BY cnt DESC, p_brand DESC LIMIT 5
    """,
    # -- §2.7 set ops, grouping-set lattices -------------------------------
    "u1_set_ops": """
        SELECT 'union' AS op, o_custkey FROM (
          SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
          UNION
          SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        )
        UNION ALL
        SELECT 'intersect' AS op, o_custkey FROM (
          SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
          INTERSECT
          SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        )
        UNION ALL
        SELECT 'except' AS op, o_custkey FROM (
          SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
          EXCEPT
          SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        )
    """,
    "r1_rollup_cube": """
        SELECT 'rollup' AS op, l_returnflag AS flag, l_linestatus AS status,
               count(*) AS cnt, round(sum(l_quantity), 2) AS sum_qty
        FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        UNION ALL
        SELECT 'cube' AS op, l_returnflag AS flag, l_linestatus AS status,
               count(*) AS cnt, round(sum(l_quantity), 2) AS sum_qty
        FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    # -- S3 ETL transform, scalar surface, JSON ----------------------------
    "s3_etl_clean_derive": """
        SELECT CAST(year(l_shipdate) AS BIGINT) AS yr,
               CAST(month(l_shipdate) AS BIGINT) AS mnth,
               count(*) AS cnt
        FROM lineitem
        WHERE l_quantity > 0 AND l_extendedprice >= 0
          AND l_discount BETWEEN 0 AND 0.08 AND l_tax >= 0
          AND year(l_shipdate) BETWEEN 1995 AND 2000
        GROUP BY yr, mnth
    """,
    "f_scalar_surface": """
        SELECT o_orderkey,
               CAST(year(o_orderdate) AS BIGINT) AS yr,
               CAST(month(o_orderdate) AS BIGINT) AS mn,
               CAST(day(o_orderdate) AS BIGINT) AS dy,
               CAST(o_orderdate AS DATE) AS order_date,
               upper(o_orderpriority) AS prio_upper,
               substr(o_orderpriority, 1, 1) AS prio_code,
               concat(o_orderpriority, ':', CAST(o_orderkey % 7 AS STRING))
                 AS tagged,
               CAST(length(o_orderpriority) AS BIGINT) AS prio_len,
               replace(o_orderpriority, '-', '_') AS prio_snake,
               CAST(regexp_extract(o_orderpriority, '[0-9]+', 0) AS BIGINT)
                 AS prio_num
        FROM orders WHERE o_orderkey % 500 = 0
    """,
    "f_json_extract": """
        SELECT CAST(get_json_object(props, '$.k') AS BIGINT) AS k_val,
               count(*) AS cnt
        FROM events GROUP BY k_val
    """,
    "p9_pivot": """
        SELECT l_returnflag,
               `F_qty` AS qty_f, `O_qty` AS qty_o,
               `F_cnt` AS cnt_f, `O_cnt` AS cnt_o
        FROM (
          SELECT * FROM (
            SELECT l_returnflag, l_linestatus, l_quantity FROM lineitem
          )
          PIVOT (
            round(sum(l_quantity), 2) AS qty, count(1) AS cnt
            FOR l_linestatus IN ('F' AS `F`, 'O' AS `O`)
          )
        )
    """,
    "f_array_hof": """
        SELECT vec_id,
               size(filter(emb, x -> x > 0)) AS n_pos,
               round(aggregate(transform(emb, x -> x * x),
                               0.0D, (a, x) -> a + x), 6) AS sum_sq,
               round(array_max(emb), 6) AS max_dim,
               round(aggregate(transform(emb, x -> abs(x)),
                               0.0D, (a, x) -> a + x), 6) AS l1_norm
        FROM (
          SELECT vec_id, CAST(embedding AS array<double>) AS emb
          FROM embeddings
        )
        WHERE vec_id % 100 = 0
    """,
    # -- dedup + splits (the SQL-expressible scale extensions) -------------
    "d1_dedup_groups": r"""
        SELECT 'exact' AS method, text AS grp,
               min(doc_id) AS keep_id, count(*) AS n_copies
        FROM documents GROUP BY text
        UNION ALL
        SELECT 'fp' AS method,
               md5(trim(regexp_replace(lower(text), '\\s+', ' '))) AS grp,
               min(doc_id) AS keep_id, count(*) AS n_copies
        FROM documents GROUP BY grp
    """,
    "s6_hash_split": f"""
        SELECT doc_id, CAST({_s6_split_case()} AS INT) AS split_id
        FROM (
          SELECT doc_id,
                 CAST(conv(substr(md5(concat('split-v1', ':',
                                             CAST(doc_id AS STRING))), 1, 15),
                           16, 10) AS DOUBLE)
                   / CAST(1152921504606846976 AS DOUBLE) AS u
          FROM documents
        )
    """,
    # -- streaming batch analogs / event ops -------------------------------
    "e1_tumbling_window_counts": """
        SELECT date_trunc('hour', ts) AS window_start, event_type,
               count(*) AS n_events, round(sum(value), 2) AS sum_value
        FROM events GROUP BY window_start, event_type
    """,
    "e2_sessionize": """
        SELECT user_id, session_id, count(*) AS n_events,
               min(ts) AS session_start, max(ts) AS session_end
        FROM (
          SELECT user_id, ts,
                 sum(is_new) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS session_id
          FROM (
            SELECT user_id, ts, event_id,
                   CASE WHEN unix_micros(ts) - lag(unix_micros(ts)) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id) > 300000000
                     OR lag(unix_micros(ts)) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                   THEN 1 ELSE 0 END AS is_new
            FROM events
          )
        )
        GROUP BY user_id, session_id
    """,
    "e3_dedup_latest_per_key": """
        SELECT user_id, event_id, ts FROM (
          SELECT user_id, event_id, ts,
                 row_number() OVER (
                   PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
          FROM events
        ) WHERE rn = 1
    """,
}


def run_sql(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Run one named entry in declarative mode: register the table catalog
    as temp views (idempotent) and execute the SQL text.  Same runtime-conf
    pinning as the registry wrapper, so SQL-mode and DataFrame-mode results
    are comparable on any session."""
    apply_runtime_confs(spark)
    load_testdata(spark, sf_dir)
    return spark.sql(SQL_QUERIES[name])
