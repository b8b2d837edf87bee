#!/usr/bin/env python
"""Simulate the grading driver's correctness gate end-to-end.

Unlike the pytest gate (which uses the engine's session factory), this runs
the published contract the way the driver does: a VANILLA SparkSession, the
repo imported via sys.path from an arbitrary cwd, every ``queries()`` entry
executed at sf0.01 and compared to ``oracle_sql()`` through DuckDB with
sorted-column / sorted-row value equality. Catches anything that silently
depends on the engine session's conf (UTC timezone, Arrow, shuffle sizing).

Usage: python tools/driver_check.py [--first N | --names a,b,c]
Prints one line per query and a failure summary; exit code 1 on any red.
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--first", type=int, default=None,
                    help="check only the first N registered queries (the "
                    "driver window is 50)")
    ap.add_argument("--names", type=str, default=None)
    args = ap.parse_args()

    import duckdb
    import pandas as pd
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    builder = (
        SparkSession.builder.master("local[8]")
        .appName("driver-check")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
    )
    # big-SF sweeps (sf1+: 6M-row lineitem, 50k-doc LSH chains) need
    # more than the 1g local default; the driver contract itself stays
    # vanilla — this only applies when the env knob is explicitly set
    if os.environ.get("SPARK_GRAFT_DRIVER_MEM"):
        builder = builder.config(
            "spark.driver.memory", os.environ["SPARK_GRAFT_DRIVER_MEM"]
        )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    # smoke: entry()
    n_entry = entrymod.entry(spark).count()
    print(f"entry(): {n_entry} rows")

    duck = duckdb.connect()
    from big_data_project_spark.io import TABLES

    for t in TABLES:
        # driver testdata is one file per table; locally generated big-SF
        # corpora (tools/gen_testdata.py) are Spark part-file directories
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        duck.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    names = list(qs)
    if args.names:
        names = [n for n in names if n in set(args.names.split(","))]
    elif args.first:
        names = names[: args.first]

    from tests.conftest import canonical

    failures: list[str] = []
    for name in names:
        try:
            got = canonical(qs[name](spark, SF_DIR).toPandas())
            if name not in oracles:
                print(f"{name}: rows_only ({len(got)})")
                continue
            want = canonical(duck.execute(oracles[name]).df())
            if list(got.columns) != list(want.columns):
                raise AssertionError(
                    f"schema {list(got.columns)} vs {list(want.columns)}"
                )
            if len(got) != len(want):
                raise AssertionError(f"rows {len(got)} vs {len(want)}")
            pd.testing.assert_frame_equal(
                got, want, check_dtype=False, check_exact=True
            )
            print(f"{name}: ok ({len(got)})")
        except Exception as e:  # noqa: BLE001 - report and continue
            failures.append(name)
            print(f"{name}: FAIL {type(e).__name__}: {str(e)[:160]}")

    print(f"\nchecked {len(names)}, failed {len(failures)}: {failures}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
