#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "total_query_seconds", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 0.1}

Each query is timed end-to-end (plan + execute + collect).  The headline set
spans the engine's surface: scan/agg, window %, join+derive, CASE+window,
top-k, exact percentile, ETL clean+derive, sessionization, minhash LSH,
brute-force KNN, text quality -- so a regression anywhere shows up here.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from nyc_taxi_dataset_analysis_apache_hive_spark import registry  # noqa: E402
from nyc_taxi_dataset_analysis_apache_hive_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "a1_group_count",
    "a3_two_key_count",
    "w1_pct_share",
    "p5_dirty_or_predicate",
    "p7_derived_duration_join",
    "f9_case_segmentation",
    "o3_topk_multi_sort",
    "a9_percentile",
    "s3_etl_clean_derive",
    "e1_tumbling_window_counts",
    "e2_sessionize",
    "a10_distinct_counts",
    "d3_minhash_lsh_pairs",
    "d4_ngram_jaccard_pairs",
    "d5_simhash_pairs",
    "d6_dup_clusters",
    "k1_knn_bruteforce",
    "k2_ann_lsh_ivf",
    "t1_text_profile",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM/codegen once so per-query numbers measure the queries,
    # not session startup.
    registry.QUERIES["a1_group_count"](spark, sf_dir).collect()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        registry.QUERIES[name](spark, sf_dir).collect()
        timings[name] = round(time.perf_counter() - t0, 3)

    out = {
        "metric": "total_query_seconds",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
