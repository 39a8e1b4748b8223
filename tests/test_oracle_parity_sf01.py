"""Scale-robustness oracle gate: the entries whose gates or formulas
proved scale-sensitive, verified at sf0.1 -- 10x the driver's sf0.01
correctness scale.

This exists because an sf0.1 sweep in round 6 caught two latent defects
the sf0.01 gate could not see: the incremental-HLL leg's merged ==
rebuilt equality (only holds while sketches stay in exact/sparse mode)
and a cross-engine decimal-rounding divergence in quality_score at exact
half boundaries.  These entries stay pinned at the bigger decade so the
same defect class cannot silently return.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from nyc_taxi_dataset_analysis_apache_hive_spark import registry_sql
from tests.parity import canon, compare, duckdb_conn

#: opt-in heavy suite (driver default-run budget): run via `pytest -m scale`
pytestmark = pytest.mark.scale

SF01 = "/root/testdata/sf0.1"

#: the scale-sensitive set: every round-6 fold + the two r6 fixes' hosts
SCALE_SENSITIVE = [
    "a10_distinct_counts",  # sketch gates: estimation-mode behavior
    "t1_text_profile",  # quality_score truncation boundary
    "pl1_curation_funnel",  # funnel composes both of the above classes
    "p3_filter_compare",
    "s7_stratified_rates",
    "s8_upsert",
    "k3_embedding_near_pairs",
    "j5_join_surface",  # r6 chain/star legs join the pinned set
    "d4_ngram_jaccard_pairs",  # r6 winnow leg: hot-print cap is sf-sensitive
    # r14: the bloom leg's dup class only becomes non-degenerate at
    # sf0.1 (the smaller decades have no cross-split exact duplicates),
    # and the span legs' hot-gram cap + pair density shift with corpus
    "d1_dedup_groups",
    # r7: the scrub fold's heavy-gram set and the frequent legs' phi
    # thresholds both shift with corpus size (tv1 rides a10's slot above
    # for the frequent legs; the scrub leg rides tv1)
    "tv1_text_stats",
    # r7: the pq leg's ADC candidate set is a per-query top-128 over the
    # whole corpus -- scale-sensitive by construction
    "k2_ann_lsh_ivf",
    # r7: the overlap leg's hit fraction depends on the corpus-wide gram
    # set (grows with corpus), and tv1's lm/probe legs hinge on the
    # micro-unit/decimal exactness claims precisely where sums get big --
    # (tv1 is pinned above; d7 joins here for the overlap leg)
    "d7_cross_corpus_decontam",
    # r7: the grouped_split leg composes CC convergence with split
    # arithmetic; the recursive-CTE oracle measures ~5 s at sf0.1, cheap
    # enough to pin (d6 has no SQL text, so only the oracle gate applies)
    "d6_dup_clusters",
    # r7: inc_admit's candidate set and a10's ks_drift/frequent gates all
    # shift with data volume
    "d3_minhash_lsh_pairs",
]

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


@pytest.fixture(scope="module")
def con():
    c = duckdb_conn(SF01)
    yield c
    c.close()


@pytest.mark.parametrize("name", SCALE_SENSITIVE)
def test_query_matches_oracle_at_sf01(name, spark, con):
    problems = compare(QUERIES[name](spark, SF01), con, ORACLES[name], name)
    assert not problems, "\n".join(problems)


#: the SQL-text surface was only parity-gated at sf0.001, which is exactly
#: the scale where the s7 sequence(0, n_copies-1) phantom-row defect stayed
#: latent (every mix ratio >= 1.2 there, so n_copies was never 0).  Pin the
#: scale-sensitive entries that ALSO ship SQL text to the bigger decade.
SCALE_SENSITIVE_SQL = [
    n
    for n in SCALE_SENSITIVE
    if n in registry_sql.SQL_QUERIES or n in registry_sql.SQL_PROGRAMS
]


@pytest.mark.parametrize("name", SCALE_SENSITIVE_SQL)
def test_sql_text_matches_dataframe_at_sf01(name, spark):
    sql_schema, sql_rows = canon(registry_sql.run_sql(spark, SF01, name))
    api_schema, api_rows = canon(QUERIES[name](spark, SF01))
    assert sql_schema == api_schema, f"{name}: schema drift SQL vs DataFrame"
    assert sql_rows == api_rows, f"{name}: value drift SQL vs DataFrame"
    assert len(sql_rows) > 0, f"{name}: empty result proves nothing"


#: Opt-in NIGHTLY insurance (r8): the r6 full sf0.1 sweep caught two
#: latent scale defects the sf0.01 gate could not see, so the WHOLE
#: 50-entry surface stays runnable at the bigger decade --
#: ``pytest -m scale tests/test_oracle_parity_sf01.py`` (excluded from
#: default runs via addopts; the pinned SCALE_SENSITIVE set above stays
#: in every run).  Entries without SQL oracles get the same weaker
#: rows-only check the driver applies.  Measured runtime: ~55 s for the
#: 36 non-pinned entries on local[32] (one warm session; the pinned set
#: above runs in every default invocation).
FULL_SWEEP = [n for n in sorted(QUERIES) if n not in SCALE_SENSITIVE]


@pytest.mark.scale
@pytest.mark.parametrize("name", FULL_SWEEP)
def test_full_sweep_matches_oracle_at_sf01(name, spark, con):
    if name not in ORACLES:
        assert QUERIES[name](spark, SF01).count() >= 0
        return
    problems = compare(QUERIES[name](spark, SF01), con, ORACLES[name], name)
    assert not problems, "\n".join(problems)
