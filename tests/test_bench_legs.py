"""Pin the registry's LEGS declarations (r15): bench.py times each leg
of a tagged-union entry by filtering on the tag column, so the
declarations must (a) name exactly the legs the entry produces and (b)
actually isolate a leg -- Catalyst must prune the other union branches
under the tag filter, otherwise the "per-leg" number silently re-times
the whole entry.  One build per entry serves both checks (the build
call pays each entry's eager checkpoints/training once)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nyc_taxi_dataset_analysis_apache_hive_spark import registry

#: opt-in heavy suite (driver default-run budget): run via `pytest -m scale`
pytestmark = pytest.mark.scale


def test_legs_declared_only_for_registered_entries():
    unknown = set(registry.LEGS) - set(registry.QUERIES)
    assert not unknown, f"LEGS declared for unregistered entries: {unknown}"


def test_declared_legs_match_and_filter_prunes(spark, sf0001_dir):
    """For every LEGS entry at sf0.001: the tag is the FIRST column, the
    distinct tag values equal the declaration, and a single-leg filter's
    optimized plan contains no Union (branch pruning held -- the per-leg
    timing measures one subtree, not a filtered full union)."""
    problems: list[str] = []
    for name, (tag, legs) in registry.LEGS.items():
        df = registry.QUERIES[name](spark, sf0001_dir)
        first = df.schema.fields[0]
        if first.name != tag or first.dataType.simpleString() != "string":
            problems.append(f"{name}: first column {first} is not tag {tag!r}")
            continue
        got = sorted(r[0] for r in df.select(tag).distinct().collect())
        if got != sorted(legs):
            problems.append(f"{name}: declared {sorted(legs)} != produced {got}")
        if name in registry.LEG_BUILDERS:
            # explicit-builder entries (k2): bench times thunks, not
            # filters, so the pruning proof does not apply -- instead
            # pin that the builder's thunk names equal the declaration
            # and that each thunk's rows match the entry's leg slice.
            thunks = registry.LEG_BUILDERS[name](spark, sf0001_dir)
            if tuple(thunks) != legs:
                problems.append(
                    f"{name}: builder legs {tuple(thunks)} != declared {legs}"
                )
                continue
            entry_rows = {
                leg: sorted(map(tuple, df.filter(F.col(tag) == leg).collect()))
                for leg in legs
            }
            for leg, thunk in thunks.items():
                rows = sorted(map(tuple, thunk().collect()))
                if rows != entry_rows[leg]:
                    problems.append(
                        f"{name}: builder leg {leg!r} rows diverge from entry"
                    )
            continue
        # pruning proof: a filter on a tag value NO branch carries must
        # constant-fold every branch away (the predicate reaches each
        # branch's F.lit tag and PruneFilters drops it), leaving an
        # empty LocalRelation.  This exercises the same mechanism the
        # per-leg filter relies on, for EVERY branch at once -- and it
        # stays valid for legs that contain inner unions of their own
        # (d1's planted bloom batch, s8's NEW-row stacks), where a
        # blanket no-Union-after-filter check would false-positive.
        pruned = (
            df.filter(F.col(tag) == "__no_such_leg__")
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
        if "LocalRelation <empty>" not in pruned or "Union" in pruned:
            problems.append(
                f"{name}: tag filter did not prune union branches:\n{pruned}"
            )
    assert not problems, "\n".join(problems)
