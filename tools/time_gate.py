"""Emulate the driver's correctness gate with per-query wall timing.

Runs every registry query in registration order at the given SF dir, compares
against its DuckDB oracle (same canonicalization as tests/conftest.py), and
prints one line per query: name, status, spark_rows, seconds. Used to find
queries that would be slow (or hang) in the driver's per-round gate.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

from big_data_project_spark import io
from big_data_project_spark.registry import REGISTRY
from big_data_project_spark.session import get_spark
from tests.conftest import canonical

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    spark = get_spark(app_name="time-gate", cpus="8", shuffle_partitions=16)
    con = duckdb.connect()
    for t in io.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    results = {}
    t_total = time.time()
    for name, q in REGISTRY.items():
        t0 = time.time()
        status = "ok"
        rows = -1
        try:
            df = q.build(spark, SF_DIR)
            got = canonical(df.toPandas())
            rows = len(got)
            if q.oracle is not None:
                want = canonical(con.execute(q.oracle).df())
                if list(got.columns) != list(want.columns):
                    status = f"SCHEMA got={list(got.columns)} want={list(want.columns)}"
                elif len(got) != len(want):
                    status = f"ROWS got={len(got)} want={len(want)}"
                else:
                    try:
                        pd.testing.assert_frame_equal(
                            got, want, check_dtype=False, check_exact=True
                        )
                    except AssertionError as e:
                        status = "HASH " + str(e).split("\n")[0]
            else:
                status = "rows_only"
        except Exception as e:  # noqa: BLE001 - diagnostic harness
            status = f"ERR {type(e).__name__}: {e}"
        dt = time.time() - t0
        results[name] = {"s": round(dt, 2), "rows": rows, "status": status}
        print(f"{dt:7.2f}s {rows:>8} {name:<32} {status[:120]}", flush=True)
    print(f"TOTAL {time.time() - t_total:.1f}s", flush=True)
    with open("/tmp/time_gate.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
