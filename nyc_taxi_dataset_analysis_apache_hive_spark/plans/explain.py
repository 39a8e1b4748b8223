"""Physical-plan inspection helpers (SURVEY.md §4).

The reference delegated all plan work to Hive; our contract is that Catalyst
produces the plans we want.  These helpers make that contract *testable*:
tests assert that filters are pushed to the parquet scan, that small-side
joins broadcast, and that the hot path stays inside whole-stage codegen.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """Return the explain output as a string (instead of printing)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def has_pushed_filters(df: DataFrame, *fragments: str) -> bool:
    """True if every fragment appears in a PushedFilters list of the plan."""
    plan = explain_str(df)
    pushed = " ".join(re.findall(r"PushedFilters: \[[^\]]*\]", plan))
    return all(frag in pushed for frag in fragments)


def join_strategies(df: DataFrame) -> list[str]:
    """Physical join node names in the plan (e.g. BroadcastHashJoin)."""
    plan = explain_str(df)
    return re.findall(
        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
        r"BroadcastNestedLoopJoin|CartesianProduct)",
        plan,
    )


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans in the physical plan."""
    return len(re.findall(r"WholeStageCodegen", explain_str(df, "simple")))
