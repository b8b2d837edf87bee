"""Physical-plan introspection helpers — the engine's scale guardrails.

`.explain()` is how you *check* a plan; these helpers make the checks
assertable so plan shape is pinned by tests (tests/test_plans.py) instead of
hoped for: filters must reach the parquet scan, dimension joins must
broadcast, top-k must compile to TakeOrderedAndProject, and shuffle counts
must not regress."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """The executed-plan string (AQE's initial plan before materialization)."""
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    """explain('formatted') output — unlike executedPlan().toString(), scan
    details (PushedFilters/ReadSchema) are NOT line-truncated here."""
    jqe = df._jdf.queryExecution()
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return jqe.explainString(mode)


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters that reached a file-source scan."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df)):
        out.extend(p.strip() for p in m.group(1).split(",") if p.strip())
    return out


def read_schema_columns(df: DataFrame) -> set[str]:
    """Columns actually read from the scan (column-pruning check)."""
    cols: set[str] = set()
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", formatted_plan(df)):
        for field in m.group(1).split(","):
            name = field.split(":")[0].strip()
            if name:
                cols.add(name)
    return cols


def num_shuffles(df: DataFrame) -> int:
    """Count data shuffles only — BroadcastExchange moves a dimension to
    every executor and is NOT a shuffle of the fact table."""
    return len(
        re.findall(
            r"Exchange (hashpartitioning|rangepartitioning|SinglePartition|RoundRobin)",
            physical_plan(df),
        )
    )


def num_broadcast_hints(df: DataFrame) -> int:
    """Count MANDATORY broadcasts (user hints) in the resolved logical plan.
    Distinct from has_broadcast_join: AQE may freely choose a broadcast when
    a side measures small — that is fine at any scale — but a hint forces it
    regardless of size, which an operator over unbounded input must not do."""
    return df._jdf.queryExecution().analyzed().toString().count("ResolvedHint")


def has_broadcast_join(df: DataFrame) -> bool:
    p = physical_plan(df)
    return "BroadcastHashJoin" in p or "BroadcastNestedLoopJoin" in p


def is_take_ordered(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in physical_plan(df)
