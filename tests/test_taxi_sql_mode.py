"""Reference-workload SQL-mode gate: every REF SELECT, re-spelled as Spark
SQL in taxi_sql.py, must produce the same result as the DataFrame operator
that already carries the REF golden values (test_taxi_golden.py).  Chain:
REF HiveQL text -> Spark SQL -> == DataFrame API -> == REF goldens."""

from __future__ import annotations

import pytest

from nyc_taxi_dataset_analysis_apache_hive_spark import taxi_sql
from nyc_taxi_dataset_analysis_apache_hive_spark.operators import (
    analysis,
    etl,
    quality,
)
from nyc_taxi_dataset_analysis_apache_hive_spark.sources.readers import (
    read_trips_parquet,
)
from tests.parity import canon
from tests.taxi_fixture import write_fixture


@pytest.fixture(scope="module")
def trips(spark, tmp_path_factory):
    paths = write_fixture(str(tmp_path_factory.mktemp("taxi_sql")))
    df = read_trips_parquet(spark, paths["parquet"])
    taxi_sql.register_taxi_views(spark, df)
    return df


@pytest.fixture(scope="module")
def clean(trips):
    return etl.clean_trips(trips)


def _df_op(name, trips, clean):
    """The DataFrame counterpart of each SQL statement."""
    if name == "peek":
        return quality.peek(trips)
    if name == "removed_row_counts":
        return etl.removed_row_counts(trips)
    if name == "validate_clean":
        return etl.validate_clean(clean)
    if name == "clean_vendor_counts":
        return etl.clean_vendor_counts(clean)
    if name == "tip_percentiles":
        return analysis.tip_percentiles(clean)  # default = approx sketch
    if name in quality.ALL_CHECKS:
        return quality.ALL_CHECKS[name](trips)
    return analysis.ALL_ANALYSES[name](clean)


@pytest.mark.parametrize("name", sorted(taxi_sql.ALL_TAXI_SQL))
def test_ref_sql_matches_dataframe_operator(spark, trips, clean, name):
    sql_df = taxi_sql.run_taxi_sql(spark, name)
    api_df = _df_op(name, trips, clean)
    s_schema, s_rows = canon(sql_df)
    a_schema, a_rows = canon(api_df)
    assert s_schema == a_schema, f"{name}: schema drift"
    if name in taxi_sql.NONDETERMINISTIC_SAMPLES:
        # REF writes LIMIT without ORDER BY: engine picks the rows, so the
        # contract here is schema + row count; set membership is asserted
        # in test_sample_rows_belong_to_predicate_set
        assert len(s_rows) == len(a_rows)
        return
    assert s_rows == a_rows, f"{name}: value drift SQL vs DataFrame"
    if name not in taxi_sql.MAY_BE_EMPTY:
        assert s_rows, f"{name}: empty result proves nothing"
    else:
        assert not s_rows or name == "negative_distances"


def test_sample_rows_belong_to_predicate_set(spark, trips, clean):
    """The LIMIT samples must return rows FROM the matching set (the part
    of REF's contract that is deterministic)."""
    from pyspark.sql import functions as F

    full_mta = {
        (r["vendorid"], r["mta_tax"])
        for r in trips.filter(F.col("mta_tax") < 0)
        .select("vendorid", "mta_tax")
        .collect()
    }
    got_mta = {
        (r["vendorid"], r["mta_tax"])
        for r in taxi_sql.run_taxi_sql(spark, "negative_mta_sample").collect()
    }
    assert got_mta <= full_mta and len(got_mta) == min(5, len(full_mta))

    full_total = {
        (r["vendorid"], r["total_amount"])
        for r in trips.filter(F.col("total_amount") < 0)
        .select("vendorid", "total_amount")
        .collect()
    }
    got_total = {
        (r["vendorid"], r["total_amount"])
        for r in taxi_sql.run_taxi_sql(spark, "negative_total_sample").collect()
    }
    assert got_total <= full_total and len(got_total) == min(5, len(full_total))


def test_clean_view_equals_etl_transform(spark, trips, clean):
    """The trips_clean SQL view (the INSERT OVERWRITE's SELECT, REF:261-269)
    must equal etl.clean_trips row-for-row -- the declarative form of the
    ETL transform itself."""
    view = spark.sql("SELECT * FROM trips_clean")
    v_schema, v_rows = canon(view)
    c_schema, c_rows = canon(clean)
    assert v_schema == c_schema
    assert v_rows == c_rows and v_rows


def test_sql_surface_covers_whole_reference_workload():
    """Every REF SELECT family is present: 23 raw-table DQ statements + the
    ETL-removed count, and 14 cleaned-table statements + validation."""
    assert len(taxi_sql.TAXI_SQL_RAW) >= 24
    assert len(taxi_sql.TAXI_SQL_CLEAN) >= 14
    # every statement has a DataFrame counterpart resolved by _df_op
    known = (
        set(quality.ALL_CHECKS)
        | set(analysis.ALL_ANALYSES)
        | {
            "peek",
            "removed_row_counts",
            "validate_clean",
            "clean_vendor_counts",
            "tip_percentiles",
        }
    )
    assert set(taxi_sql.ALL_TAXI_SQL) <= known
