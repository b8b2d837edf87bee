#!/usr/bin/env python
"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Each query is fully materialized (collect of its — small, aggregated —
result). A warmup pass runs the flagship once so JVM/codegen startup isn't
billed to the first query.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from big_data_project_spark.registry import REGISTRY, headline_queries
from big_data_project_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0

    spark = get_spark(
        app_name="bdps-bench",
        driver_memory=os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"),
    )

    # warmup: JVM + codegen + parquet footer caches
    REGISTRY["q1_pricing_summary"].build(spark, sf_dir).collect()

    timings: dict[str, float] = {}
    for name, q in headline_queries().items():
        t0 = time.perf_counter()
        q.build(spark, sf_dir).collect()
        timings[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(timings.values()), 4)
    line = json.dumps(
        {
            "metric": "headline_queries_total",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "sf": sf,
        }
    )
    print(line)
    # local per-run history so round-over-round per-query regressions are
    # greppable without reconstructing them from the driver's BENCH_r*.json
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_history.jsonl"),
            "a",
        ) as f:
            f.write(line + "\n")
    except OSError:
        pass
    spark.stop()


if __name__ == "__main__":
    main()
