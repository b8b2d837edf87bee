"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``big_data_project_spark``; this module is the thin
driver-facing adapter.
"""

from __future__ import annotations

import functools
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from big_data_project_spark import bootstrap, registry

# Belt 1: any JVM launched after this import forwards the repo root to its
# python worker daemons, so cloudpickled Data-Source/UDTF classes re-import
# cleanly from any cwd.
bootstrap.export_pythonpath()

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-shape pricing summary) on sf0.001."""
    bootstrap.ensure_worker_imports(spark)
    return registry.REGISTRY["q1_pricing_summary"].build(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Each callable first ships the package zip to the session's workers
    (belt 2 — effective even when the JVM pre-dates this process's
    environment), so the contract is cwd-independent.
    """

    def wrap(fn):
        @functools.wraps(fn)
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            bootstrap.ensure_worker_imports(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in registry.queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for every hash-matchable query."""
    return registry.oracle_sql()
