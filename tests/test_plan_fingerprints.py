"""The plan-fingerprint regression gate (VERDICT r8 #1; dual-SF r9 #1).

The shared bench host is proven unable to grade timing — twelve
same-code runs of the 32-headliner suite read 25.0-52.6s, uncorrelated
with loadavg or steal (host-capped page cache). The regressions that
matter at 100 TB are PLAN-shape regressions: a lost broadcast, an
unpushed filter, a scan that stopped pruning, an extra shuffle. Those
are visible pre-execution, deterministically — so every bench headliner
pins its physical-plan digest here and any drift fails CI regardless of
host weather.

TWO digest sets (VERDICT r9 #1): broadcast decisions are
size-dependent, and at sf0.01 every dimension auto-broadcasts — a
regression that loses a broadcast only above the 10 MB threshold (the
scale regime the gate exists to protect) is invisible to the sf0.01
pins by construction (proof: test_sf1_pin_catches_broadcast_lost_only_
at_scale). The sf1 section pins the shuffle-heavy subset under at-scale
planning inputs, where orders/events genuinely cross the threshold.

Pinned inputs: /root/testdata/sf0.01 (driver testdata, stable across
rounds) and testdata_local/sf1 (deterministic hash-of-id generation —
the session fixture rebuilds it after the per-round wipe), both under
the conftest session config (cpus=4, shuffle_partitions=8). After a
DELIBERATE plan change, regenerate with
``python tools/regen_plan_fingerprints.py [names...]`` and review the
json diff — each changed line is a plan change you are asserting is
intentional.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

from big_data_project_spark import registry as reg
from big_data_project_spark.plans.fingerprint import (
    EXTRA_PINNED_QUERIES,
    plan_fingerprint,
)

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: the SFs the digests were pinned at — NOT the test-session SF_DIR:
#: planning inputs (file sizes for broadcast decisions) must match the
#: regeneration run exactly
FP_SF_DIRS = {
    "sf0.01": "/root/testdata/sf0.01",
    "sf1": os.path.join(_REPO, "testdata_local", "sf1"),
}

_FP_PATH = os.path.join(os.path.dirname(__file__), "plan_fingerprints.json")
with open(_FP_PATH) as _fh:
    PINNED = json.load(_fh)


@pytest.fixture(scope="session")
def sf1_dir():
    """testdata_local/sf1 — regenerated on demand: the dir is wiped
    between rounds, and gen_testdata.py is a pure function of (sf, seed)
    with fixed per-table file counts, so a rebuild reproduces the exact
    planning inputs (sizes) the digests were pinned against."""
    d = FP_SF_DIRS["sf1"]
    if not os.path.exists(os.path.join(d, "lineitem.parquet")):
        subprocess.run(
            [
                sys.executable,
                os.path.join(_REPO, "tools", "gen_testdata.py"),
                "--sf", "1", "--out", d,
            ],
            check=True,
            cwd=_REPO,
            timeout=900,
        )
    return d


def test_every_headliner_is_pinned():
    """Completeness: a new bench headliner (or EXTRA_PINNED_QUERIES
    entry) must ship with a pinned digest AT BOTH SFs (regen tool adds
    them) — otherwise the gate silently thins."""
    want = set(reg.headline_queries()) | set(EXTRA_PINNED_QUERIES)
    assert set(PINNED["sf0.01"]) == want
    assert set(PINNED["sf1"]) == want


def _check_fingerprint(spark, sf, name, sf_dir):
    import warnings

    # earlier suite modules legitimately .cache() tables over the same
    # parquet paths; Spark's CacheManager would rewrite this query's
    # matching scan fragments into InMemoryTableScan and the digest
    # would drift on SESSION state, not plan changes — neutralize it
    spark.catalog.clearCache()
    with warnings.catch_warnings():
        # dd_semantic_capped deliberately fires the hot-cluster guard
        warnings.simplefilter("ignore", UserWarning)
        df = reg.REGISTRY[name].build(spark, sf_dir)
    got = plan_fingerprint(df)
    want = PINNED[sf][name]
    assert got == want, (
        f"physical plan of {name} at {sf} drifted from its pinned digest "
        "— if the change is deliberate, regenerate with `python "
        f"tools/regen_plan_fingerprints.py {name}` and review the diff; "
        "look specifically at exchanges (new shuffle?), joins (lost "
        "broadcast?), scans (lost column pruning?), pushed_filters "
        "(lost pushdown?)"
    )


@pytest.mark.parametrize("name", sorted(PINNED["sf0.01"]))
def test_headliner_plan_fingerprint(spark, name):
    _check_fingerprint(spark, "sf0.01", name, FP_SF_DIRS["sf0.01"])


@pytest.mark.parametrize("name", sorted(PINNED["sf1"]))
def test_sf1_plan_fingerprint(spark, sf1_dir, name):
    """The at-scale pins: same digests, planning inputs 100× bigger —
    the section where a size-dependent broadcast regression shows."""
    _check_fingerprint(spark, "sf1", name, sf1_dir)


def test_gate_trips_on_lost_broadcast(spark):
    """Deliberate-regression proof: the digest distinguishes a broadcast
    hash join from the sort-merge join the same query degrades to when
    the broadcast is lost — the exact failure mode the gate exists for."""
    sf_dir = FP_SF_DIRS["sf0.01"]
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_partkey", "l_extendedprice"
    )
    part = spark.read.parquet(f"{sf_dir}/part.parquet").select(
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


def test_sf1_pin_catches_broadcast_lost_only_at_scale(spark, sf1_dir):
    """Deliberate-regression proof for the dual-SF design (VERDICT r9
    #1): orders auto-broadcasts at sf0.01 (~0.3 MB) but crosses the
    10 MB threshold at sf1 (~26 MB). Losing an explicit broadcast hint
    on a lineitem⋈orders join therefore leaves the sf0.01 digest
    BYTE-IDENTICAL (that gate is blind to the regression by
    construction) while the sf1 digest flips BroadcastHashJoin →
    SortMergeJoin and trips. This is the scale blind spot the sf1
    section closes."""

    def build(sf_dir, hinted):
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            "l_orderkey", "l_extendedprice"
        )
        o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
            "o_orderkey", "o_orderpriority"
        )
        dim = F.broadcast(o) if hinted else o
        return li.join(dim, li.l_orderkey == o.o_orderkey)

    small = FP_SF_DIRS["sf0.01"]
    fp_small_hinted = plan_fingerprint(build(small, True))
    fp_small_lost = plan_fingerprint(build(small, False))
    # at sf0.01 the auto-broadcast masks the lost hint completely
    assert fp_small_hinted == fp_small_lost
    assert fp_small_lost["joins"] == ["BroadcastHashJoin Inner"]

    fp_big_hinted = plan_fingerprint(build(sf1_dir, True))
    fp_big_lost = plan_fingerprint(build(sf1_dir, False))
    assert fp_big_hinted["joins"] == ["BroadcastHashJoin Inner"]
    assert fp_big_lost["joins"] == ["SortMergeJoin Inner"]
    assert fp_big_hinted != fp_big_lost  # only the sf1 pin catches it


def test_gate_trips_on_lost_column_pruning(spark):
    """Deliberate-regression proof: reading extra columns changes the
    scan's ReadSchema digest — a projection that stops pruning fails."""
    sf_dir = FP_SF_DIRS["sf0.01"]
    pruned = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    wide = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    fp_p, fp_w = plan_fingerprint(pruned), plan_fingerprint(wide)
    assert fp_p["scans"] == [
        "Scan parquet[lineitem.parquet](l_orderkey,l_quantity)"
    ]
    assert fp_p["scans"] != fp_w["scans"]


def test_gate_trips_on_lost_filter_pushdown(spark):
    """Deliberate-regression proof: a predicate that no longer reaches
    the parquet scan (here: hidden behind a non-deterministic wrapper)
    drops out of pushed_filters."""
    sf_dir = FP_SF_DIRS["sf0.01"]
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pushed = plan_fingerprint(li.where(F.col("l_quantity") > 10))
    blocked = plan_fingerprint(
        li.where((F.col("l_quantity") + F.rand(7) * 0) > 10)
    )
    assert any("GreaterThan(l_quantity" in p for p in pushed["pushed_filters"])
    assert not any(
        "GreaterThan(l_quantity" in p for p in blocked["pushed_filters"]
    )
