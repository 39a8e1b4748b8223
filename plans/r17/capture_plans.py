#!/usr/bin/env python
"""Capture .explain("formatted") for registry entries into plans/r17/.

Usage:
    python plans/r17/capture_plans.py before [name ...]
    python plans/r17/capture_plans.py after  [name ...]

With no names, captures every registry entry.  Each file records the
physical plan of the DataFrame the entry returns at $SPARK_GRAFT_SF_DIR
(default sf0.1).  Entries with eager build work (localCheckpoints,
training) show LogicalRDD scans where the materialized intermediates
enter the plan -- that IS the executed shape; the build-side plans are
what the per-operator notes in OPTIMIZATION_r17.md describe.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

from nyc_taxi_dataset_analysis_apache_hive_spark import registry  # noqa: E402
from nyc_taxi_dataset_analysis_apache_hive_spark.session import get_spark  # noqa: E402


def explain_str(df) -> str:
    qe = df._jdf.queryExecution()
    return qe.explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or sorted(registry.QUERIES)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.dirname(os.path.abspath(__file__))
    spark = get_spark("plans-r17")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = registry.QUERIES[name](spark, sf_dir)
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(explain_str(df))
        print("wrote", path)


if __name__ == "__main__":
    main()
