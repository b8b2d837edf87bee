"""The plan-fingerprint regression gate (VERDICT r8 #1).

The shared bench host is proven unable to grade timing — twelve
same-code runs of the 32-headliner suite read 25.0-52.6s, uncorrelated
with loadavg or steal (host-capped page cache). The regressions that
matter at 100 TB are PLAN-shape regressions: a lost broadcast, an
unpushed filter, a scan that stopped pruning, an extra shuffle. Those
are visible pre-execution, deterministically — so every bench headliner
pins its physical-plan digest here and any drift fails CI regardless of
host weather.

Pinned inputs: /root/testdata/sf0.01 (driver testdata, stable across
rounds) + the conftest session config (cpus=4, shuffle_partitions=8).
After a DELIBERATE plan change, regenerate with
``python tools/regen_plan_fingerprints.py [names...]`` and review the
json diff — each changed line is a plan change you are asserting is
intentional.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from big_data_project_spark import registry as reg
from big_data_project_spark.plans.fingerprint import (
    EXTRA_PINNED_QUERIES,
    plan_fingerprint,
)

#: the SF the digests were pinned at — NOT the test-session SF_DIR:
#: planning inputs (file sizes for broadcast decisions) must match the
#: regeneration run exactly
FP_SF_DIR = "/root/testdata/sf0.01"

_FP_PATH = os.path.join(os.path.dirname(__file__), "plan_fingerprints.json")
with open(_FP_PATH) as _fh:
    PINNED = json.load(_fh)


def test_every_headliner_is_pinned():
    """Completeness: a new bench headliner (or EXTRA_PINNED_QUERIES
    entry) must ship with a pinned digest (regen tool adds it) —
    otherwise the gate silently thins."""
    assert set(PINNED) == set(reg.headline_queries()) | set(
        EXTRA_PINNED_QUERIES
    )


@pytest.mark.parametrize("name", sorted(PINNED))
def test_headliner_plan_fingerprint(spark, name):
    import warnings

    # earlier suite modules legitimately .cache() tables over the same
    # parquet paths; Spark's CacheManager would rewrite this query's
    # matching scan fragments into InMemoryTableScan and the digest
    # would drift on SESSION state, not plan changes — neutralize it
    spark.catalog.clearCache()
    with warnings.catch_warnings():
        # dd_semantic_capped deliberately fires the hot-cluster guard
        warnings.simplefilter("ignore", UserWarning)
        df = reg.REGISTRY[name].build(spark, FP_SF_DIR)
    got = plan_fingerprint(df)
    want = PINNED[name]
    assert got == want, (
        f"physical plan of {name} drifted from its pinned digest — if "
        "the change is deliberate, regenerate with `python "
        f"tools/regen_plan_fingerprints.py {name}` and review the diff; "
        "look specifically at exchanges (new shuffle?), joins (lost "
        "broadcast?), scans (lost column pruning?), pushed_filters "
        "(lost pushdown?)"
    )


def test_gate_trips_on_lost_broadcast(spark):
    """Deliberate-regression proof: the digest distinguishes a broadcast
    hash join from the sort-merge join the same query degrades to when
    the broadcast is lost — the exact failure mode the gate exists for."""
    li = spark.read.parquet(f"{FP_SF_DIR}/lineitem.parquet").select(
        "l_partkey", "l_extendedprice"
    )
    part = spark.read.parquet(f"{FP_SF_DIR}/part.parquet").select(
        "p_partkey", "p_brand"
    )
    hinted = li.join(
        F.broadcast(part), li.l_partkey == part.p_partkey
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        unhinted = li.join(part, li.l_partkey == part.p_partkey)
        fp_lost = plan_fingerprint(unhinted)
        fp_hinted = plan_fingerprint(hinted)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert fp_hinted["joins"] == ["BroadcastHashJoin Inner"]
    assert fp_lost["joins"] == ["SortMergeJoin Inner"]
    assert fp_lost["exchanges"] > fp_hinted["exchanges"]  # the new shuffles
    assert fp_hinted != fp_lost


def test_gate_trips_on_lost_column_pruning(spark):
    """Deliberate-regression proof: reading extra columns changes the
    scan's ReadSchema digest — a projection that stops pruning fails."""
    pruned = spark.read.parquet(f"{FP_SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    wide = spark.read.parquet(f"{FP_SF_DIR}/lineitem.parquet")
    fp_p, fp_w = plan_fingerprint(pruned), plan_fingerprint(wide)
    assert fp_p["scans"] == [
        "Scan parquet[lineitem.parquet](l_orderkey,l_quantity)"
    ]
    assert fp_p["scans"] != fp_w["scans"]


def test_gate_trips_on_lost_filter_pushdown(spark):
    """Deliberate-regression proof: a predicate that no longer reaches
    the parquet scan (here: hidden behind a non-deterministic wrapper)
    drops out of pushed_filters."""
    li = spark.read.parquet(f"{FP_SF_DIR}/lineitem.parquet")
    pushed = plan_fingerprint(li.where(F.col("l_quantity") > 10))
    blocked = plan_fingerprint(
        li.where((F.col("l_quantity") + F.rand(7) * 0) > 10)
    )
    assert any("GreaterThan(l_quantity" in p for p in pushed["pushed_filters"])
    assert not any(
        "GreaterThan(l_quantity" in p for p in blocked["pushed_filters"]
    )
