"""Shared fixtures: one SparkSession per test session, a DuckDB connection
with the synthetic tables registered as views, and the oracle comparator that
mirrors the driver's check (row count + schema + order-insensitive values)."""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest

from big_data_project_spark import io
from big_data_project_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="bdps-tests", cpus="4", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in io.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def canonical(pdf: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, normalize dtypes, sort rows — mirrors the
    driver's order-insensitive compare."""
    cols = sorted(pdf.columns)
    out = pdf[cols].copy()
    for c in cols:
        if pd.api.types.is_datetime64_any_dtype(out[c]):
            # ns vs µs precision: floor both engines to µs
            out[c] = out[c].dt.floor("us")
        elif pd.api.types.is_float_dtype(out[c]):
            out[c] = out[c].astype("float64")
        elif pd.api.types.is_integer_dtype(out[c]):
            out[c] = out[c].astype("Int64")
        elif out[c].dtype == object:
            out[c] = out[c].astype("string")
    out = out.sort_values(cols, na_position="last").reset_index(drop=True)
    return out


def assert_matches_oracle(spark_df, duck_con, sql: str):
    got = canonical(spark_df.toPandas())
    want = canonical(duck_con.execute(sql).df())
    assert list(got.columns) == list(want.columns), (
        f"column mismatch: spark={list(got.columns)} duckdb={list(want.columns)}"
    )
    assert len(got) == len(want), f"row count: spark={len(got)} duckdb={len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
