"""Replay of the oracle-parity gate at sf0.01 -- the scale the driver's
CORRECTNESS check actually runs.  Slower; run explicitly or in CI."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from tests.parity import compare, duckdb_conn

#: opt-in heavy suite (driver default-run budget): run via `pytest -m scale`
pytestmark = pytest.mark.scale

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


@pytest.fixture(scope="module")
def con(sf001_dir):
    c = duckdb_conn(sf001_dir)
    yield c
    c.close()


@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle_sf001(name, spark, con, sf001_dir):
    df = QUERIES[name](spark, sf001_dir)
    problems = compare(df, con, ORACLES[name], name)
    assert not problems, "\n".join(problems)
