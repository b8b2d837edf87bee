"""Replicates the driver's correctness gate: every registry query with an
oracle must match DuckDB exactly (columns, row count, values) at the test SF."""

from __future__ import annotations

import pytest

from big_data_project_spark.registry import REGISTRY
from tests.conftest import assert_matches_oracle

WITH_ORACLE = sorted(n for n, q in REGISTRY.items() if q.oracle is not None)
ROWS_ONLY = sorted(n for n, q in REGISTRY.items() if q.oracle is None)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_match(name, spark, duck, sf_dir):
    q = REGISTRY[name]
    df = q.build(spark, sf_dir)
    assert_matches_oracle(df, duck, q.oracle)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(name, spark, sf_dir):
    q = REGISTRY[name]
    df = q.build(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    # queries()/oracle_sql() key contract
    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)


def test_queries_are_timezone_robust(spark, duck, sf_dir):
    """The grading driver uses a VANILLA SparkSession whose timezone is the
    host JVM default — not the engine factory's pinned UTC. load_table must
    re-pin UTC itself, or every timestamp-rendering query (windows,
    date_trunc, year) silently shifts against the tz-naive DuckDB oracle on
    a non-UTC host."""
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        for name in ("st_tumbling_hourly", "q1_pricing_summary", "ev_retention_cohorts",
                     "q_recursive_spine", "u5_partitioned_udtf",
                     "st_interval_join_outer"):
            q = REGISTRY[name]
            assert_matches_oracle(q.build(spark, sf_dir), duck, q.oracle)
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
