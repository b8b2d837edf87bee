#!/usr/bin/env python
"""Per-headliner cost decomposition (optimization r11, guide §1).

For each bench headliner, in one shared session (bench config), measure:

- ``build_s``   — wall time of ``REGISTRY[name].build(spark, sf_dir)``:
  driver-side plan construction (py4j chatter + any eager lineage cuts /
  bounded collects the builder performs).
- ``exec_s``    — wall time of ``.collect()`` on the built frame (min of
  N, after one warmup build+collect of the same query).
- ``jobs``      — number of Spark jobs the build+collect pair triggered
  (from the status tracker), i.e. eager materializations + the final
  action. More jobs = more scheduling floors at scale.

Prints one JSON line per query plus a sorted summary to stderr.

    python tools/profile_headliners.py [names...]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from big_data_project_spark.registry import REGISTRY, headline_queries  # noqa: E402
from big_data_project_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    names = sys.argv[1:] or list(headline_queries())

    spark = get_spark(
        app_name="profile-headliners",
        driver_memory=os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"),
    )
    tracker = spark.sparkContext.statusTracker()

    # warmup: codegen + footers + page cache for every profiled query
    for name in names:
        REGISTRY[name].build(spark, sf_dir).collect()

    rows = []
    for name in names:
        q = REGISTRY[name]
        builds, execs, jobs = [], [], []
        for _ in range(n_runs):
            j0 = len(tracker.getJobIdsForGroup(None) or [])
            t0 = time.perf_counter()
            df = q.build(spark, sf_dir)
            t1 = time.perf_counter()
            df.collect()
            t2 = time.perf_counter()
            j1 = len(tracker.getJobIdsForGroup(None) or [])
            builds.append(t1 - t0)
            execs.append(t2 - t1)
            jobs.append(j1 - j0)
        rec = {
            "name": name,
            "build_s": round(min(builds), 4),
            "exec_s": round(min(execs), 4),
            "total_s": round(min(builds) + min(execs), 4),
            "jobs": max(jobs),
        }
        rows.append(rec)
        print(json.dumps(rec), flush=True)

    rows.sort(key=lambda r: r["total_s"], reverse=True)
    print("\n-- sorted by total (min-of-%d) --" % n_runs, file=sys.stderr)
    for r in rows:
        print(
            f"{r['name']:32s} total {r['total_s']:7.3f}  "
            f"build {r['build_s']:6.3f}  exec {r['exec_s']:6.3f}  "
            f"jobs {r['jobs']}",
            file=sys.stderr,
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
