"""Regenerate tests/plan_fingerprints.json — the pinned physical-plan
digests for every bench headliner (VERDICT r8 #1) at sf0.01, plus the
sf1 set for the shuffle-heavy subset (VERDICT r9 #1).

Run after a DELIBERATE plan change:

    python tools/regen_plan_fingerprints.py            # all pins, both SFs
    python tools/regen_plan_fingerprints.py q1_pricing_summary ...

then eyeball the git diff of tests/plan_fingerprints.json: every changed
line is a plan-shape change you are asserting is intentional (a new
exchange, a join algorithm flip, a scan column). The test
tests/test_plan_fingerprints.py fails on any drift — that is the point:
the bench host cannot grade timing (25.0-52.6s spread on identical code,
round 8), so plan regressions must fail CI deterministically instead of
hiding in host noise.

Why two SFs (VERDICT r9 #1): broadcast decisions are size-dependent —
at sf0.01 every dimension auto-broadcasts, so a lost broadcast hint that
only manifests above the 10 MB threshold is invisible to the sf0.01
digests by construction. The sf1 section pins the plans under
at-scale planning inputs (orders/events cross the threshold there).

Digests are pinned at the test-session config (cpus=4,
shuffle_partitions=8 — conftest's get_spark call) against
/root/testdata/sf0.01 (driver testdata, stable across rounds) and
testdata_local/sf1 (regenerate first if wiped:
``python tools/gen_testdata.py --sf 1 --out testdata_local/sf1`` —
deterministic hash-of-id data, fixed file counts, so regenerated inputs
reproduce the same plans).
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

#: pinned inputs (must match tests/test_plan_fingerprints.py)
SF_DIRS = {
    "sf0.01": "/root/testdata/sf0.01",
    "sf1": os.path.join(REPO, "testdata_local", "sf1"),
}
OUT = os.path.join(REPO, "tests", "plan_fingerprints.json")


def main(only: list[str]) -> int:
    import warnings

    from big_data_project_spark import registry as reg
    from big_data_project_spark.plans.fingerprint import (
        EXTRA_PINNED_QUERIES,
        plan_fingerprint,
    )
    from big_data_project_spark.session import get_spark

    if not os.path.exists(os.path.join(SF_DIRS["sf1"], "lineitem.parquet")):
        raise SystemExit(
            f"{SF_DIRS['sf1']} is missing — regenerate it first:\n"
            "  python tools/gen_testdata.py --sf 1 --out testdata_local/sf1"
        )
    spark = get_spark(
        app_name="regen-plan-fingerprints", cpus="4", shuffle_partitions=8
    )
    warnings.simplefilter("ignore", UserWarning)  # fired-guard pins warn
    current: dict[str, dict] = {"sf0.01": {}, "sf1": {}}
    if os.path.exists(OUT):
        with open(OUT) as fh:
            loaded = json.load(fh)
        if "sf0.01" in loaded:  # two-section format
            current.update(loaded)
        else:  # legacy flat format (pre-r10): all pins were sf0.01
            current["sf0.01"] = loaded
    all_names = list(reg.headline_queries()) + list(EXTRA_PINNED_QUERIES)
    pinned_names = {"sf0.01": all_names, "sf1": all_names}
    for sf, names in pinned_names.items():
        for name in names:
            if only and name not in only:
                continue
            spark.catalog.clearCache()
            df = reg.REGISTRY[name].build(spark, SF_DIRS[sf])
            current[sf][name] = plan_fingerprint(df)
            print(f"{sf}/{name}: pinned", flush=True)
        # drop pins for entries that left the pinned set
        current[sf] = {n: v for n, v in current[sf].items() if n in names}
    with open(OUT, "w") as fh:
        json.dump(current, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(
        f"wrote {OUT} ({len(current['sf0.01'])} sf0.01 + "
        f"{len(current['sf1'])} sf1 pins)"
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
