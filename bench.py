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
import statistics
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

    # median of 3 runs per query: a one-off scheduler/GC hiccup on a single
    # run (observed: 0.55s → 1.77s on the same plan) must not read as a
    # plan regression round-over-round.
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    timings: dict[str, float] = {}
    for name, q in headline_queries().items():
        times = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            q.build(spark, sf_dir).collect()
            times.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(times), 4)

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
