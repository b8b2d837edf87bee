"""Pin the bench.py CLI surface the driver and the big-SF recipe rely on.

The default mode's JSON contract is what the grading driver records as
BENCH_r{N}.json; --one/--isolate (VERDICT r4 item 5) is the canonical
fresh-JVM mode for big-SF sweeps. One subprocess smoke each at sf0.001
keeps this cheap."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_bench(*args: str) -> str:
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_BENCH_RUNS="1",
        SPARK_GRAFT_DRIVER_MEM="2g",
        SPARK_GRAFT_CPUS="2",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), *args],
        capture_output=True,
        text=True,
        check=True,
        env=env,
        timeout=600,
    )
    return out.stdout.strip().splitlines()[-1]


def test_bench_one_runs_a_single_query_in_a_fresh_jvm(tmp_path):
    rec = json.loads(_run_bench("--one", "q1_pricing_summary"))
    assert set(rec) == {"median", "min"}
    assert rec["median"]["q1_pricing_summary"] > 0
    assert (
        rec["min"]["q1_pricing_summary"] <= rec["median"]["q1_pricing_summary"]
    )


def test_bench_default_json_contract():
    rec = json.loads(_run_bench())
    assert rec["metric"] == "headline_queries_total"
    assert rec["unit"] == "sec"
    assert rec["sf"] == 0.001
    assert rec["value"] > 0 and len(rec["queries"]) >= 26
    # VERDICT r7 #2: every bench record carries its own load context and
    # the per-query cost floor
    assert rec["value_min"] <= rec["value"]
    assert set(rec["queries_min"]) == set(rec["queries"])
    assert len(rec["loadavg"]["start"]) == 3 == len(rec["loadavg"]["end"])
    # round-8 host-noise forensics: co-tenant steal share of the timed
    # section and the page-cache state bracketing it (the host reclaims
    # the guest cache; a cold-start reading must be attributable)
    assert "steal_share" in rec and "cached_gb" in rec
    if rec["steal_share"] is not None:
        assert 0.0 <= rec["steal_share"] <= 1.0
    assert set(rec["cached_gb"]) == {"start", "end"}
    # VERDICT r9 #4: every record labels its cache regime so
    # round-over-round deltas compare like-for-like
    assert rec["regime"] in {"cold-cache", "warm-cache", "unknown"}
    if rec["cached_gb"]["start"] is not None:
        assert rec["regime"] == (
            "cold-cache" if rec["cached_gb"]["start"] < 4.0 else "warm-cache"
        )
    # history line appended (same JSON) — trim it so smoke runs don't
    # accumulate in the canonical record
    hist = os.path.join(REPO, "bench_history.jsonl")
    with open(hist) as fh:
        lines = fh.readlines()
    assert json.loads(lines[-1])["sf"] == 0.001
    with open(hist, "w") as fh:
        fh.writelines(lines[:-1])
