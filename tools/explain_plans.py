#!/usr/bin/env python
"""Dump ``explain("formatted")`` for registry queries to files.

Optimization-round deliverable (guide §1: capture the plan shape —
Exchange count, join strategy, PushedFilters/ReadSchema, codegen spans,
Python-eval nodes — BEFORE and AFTER each change):

    python tools/explain_plans.py --out plans/r11 --suffix _before [names...]

Defaults to every bench headliner at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) under the bench session config, so the captured
plans are the ones the bench times.
"""

from __future__ import annotations

import argparse
import contextlib
import io as _io
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--suffix", default="_before")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from big_data_project_spark.registry import REGISTRY, headline_queries
    from big_data_project_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = args.names or list(headline_queries())
    os.makedirs(os.path.join(REPO, args.out), exist_ok=True)

    spark = get_spark(app_name="explain-plans")
    for name in names:
        df = REGISTRY[name].build(spark, sf_dir)
        buf = _io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(REPO, args.out, f"{name}{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(f"-- {name} @ {sf_dir} --\n")
            f.write(buf.getvalue())
        print(f"wrote {path}", file=sys.stderr)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
