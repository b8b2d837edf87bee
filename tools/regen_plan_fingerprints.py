"""Regenerate tests/plan_fingerprints.json — the pinned physical-plan
digests for every bench headliner (VERDICT r8 #1).

Run after a DELIBERATE plan change:

    python tools/regen_plan_fingerprints.py            # all headliners
    python tools/regen_plan_fingerprints.py q1_pricing_summary ...

then eyeball the git diff of tests/plan_fingerprints.json: every changed
line is a plan-shape change you are asserting is intentional (a new
exchange, a join algorithm flip, a scan column). The test
tests/test_plan_fingerprints.py::test_headliner_plan_fingerprint fails
on any drift — that is the point: the bench host cannot grade timing
(25.0-52.6s spread on identical code, round 8), so plan regressions
must fail CI deterministically instead of hiding in host noise.

Digests are pinned at the driver's sf0.01 testdata and the test-session
config (cpus=4, shuffle_partitions=8 — conftest's get_spark call), so
the test recomputes under identical planning inputs.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

#: pinned inputs (must match tests/test_plan_fingerprints.py)
SF_DIR = "/root/testdata/sf0.01"
OUT = os.path.join(REPO, "tests", "plan_fingerprints.json")


def main(only: list[str]) -> int:
    import warnings

    from big_data_project_spark import registry as reg
    from big_data_project_spark.plans.fingerprint import (
        EXTRA_PINNED_QUERIES,
        plan_fingerprint,
    )
    from big_data_project_spark.session import get_spark

    spark = get_spark(
        app_name="regen-plan-fingerprints", cpus="4", shuffle_partitions=8
    )
    warnings.simplefilter("ignore", UserWarning)  # fired-guard pins warn
    current = {}
    if os.path.exists(OUT):
        with open(OUT) as fh:
            current = json.load(fh)
    names = list(reg.headline_queries()) + list(EXTRA_PINNED_QUERIES)
    todo = [n for n in names if not only or n in only]
    for name in todo:
        df = reg.REGISTRY[name].build(spark, SF_DIR)
        current[name] = plan_fingerprint(df)
        print(f"{name}: pinned", flush=True)
    # drop pins for headliners that no longer exist
    current = {n: v for n, v in current.items() if n in names}
    with open(OUT, "w") as fh:
        json.dump(current, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"wrote {OUT} ({len(current)} headliners)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
