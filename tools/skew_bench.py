"""Skew-join benchmark on the zipfian sf1 variant (VERDICT r3 item 2).

Runs the adversarial join shape — orders (o_custkey zipfian, the hottest
customer owning ~14% of ALL rows) ⋈ customer — three ways and records
which mechanism handles the hot key:

1. broadcast OFF + AQE skew-join ON  → OptimizeSkewedJoin must split the
   oversized partition (asserted from the final adaptive plan string);
2. manual salted_join (the fallback for skewed joins whose dim cannot be
   broadcast at 100 TB);
3. the default plan (AQE free to broadcast the 150k-row dim — what a real
   run would do).

All three must return IDENTICAL aggregates (salting/splitting are
routing-only). The AQE skew thresholds are lowered to benchmark scale
(the defaults trigger at 256 MB partitions — correct for a cluster,
unreachable at sf1 on a laptop); SCALE.md documents the production knobs.

Appends one JSON line to bench_history.jsonl:
    {"metric": "skew_join_sf1", ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from big_data_project_spark.operators import relational


def agg_plain(orders, customer):
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n"),
            relational.dsum(F.col("o_totalprice"), 2).alias("total"),
        )
    )


def agg_salted(orders, customer):
    j = relational.salted_join(orders, customer, "o_custkey", "c_custkey", salt=16)
    return j.groupBy("c_mktsegment").agg(
        F.count("*").alias("n"),
        relational.dsum(F.col("o_totalprice"), 2).alias("total"),
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "testdata_local/sf1skew"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("skew_bench")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # benchmark-scale skew thresholds (defaults are cluster-scale):
        .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1m")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_custkey", "o_totalprice"
    )
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_mktsegment"
    )
    hot = (
        orders.groupBy("o_custkey").count().orderBy(F.desc("count")).limit(1)
    ).collect()[0]
    n_orders = orders.count()

    results, timings = {}, {}

    def run(tag, df, extra_confs=None):
        for k, v in (extra_confs or {}).items():
            spark.conf.set(k, v)
        t0 = time.time()
        rows = df.collect()
        timings[tag] = round(time.time() - t0, 4)
        results[tag] = sorted((r.c_mktsegment, r.n, r.total) for r in rows)
        plan = df._jdf.queryExecution().executedPlan().toString()
        for k in (extra_confs or {}):
            spark.conf.unset(k)
        return plan

    # 1: shuffle join forced, AQE must skew-split
    plan_aqe = run(
        "aqe_skew_split",
        agg_plain(orders, customer),
        {"spark.sql.autoBroadcastJoinThreshold": "-1"},
    )
    skew_fired = "skew=true" in plan_aqe
    # 2: manual salt (broadcast also off — the 100 TB fallback shape)
    run(
        "salted_join",
        agg_salted(orders, customer),
        {"spark.sql.autoBroadcastJoinThreshold": "-1"},
    )
    # 3: default (AQE free to broadcast the dim)
    plan_default = run("default_broadcast", agg_plain(orders, customer))
    broadcast_used = "BroadcastHashJoin" in plan_default

    assert results["aqe_skew_split"] == results["salted_join"] == results[
        "default_broadcast"
    ], "skew mechanisms changed RESULTS — routing must be value-invisible"

    rec = {
        "metric": "skew_join_sf1",
        "unit": "sec",
        "sf_dir": sf_dir,
        "n_orders": n_orders,
        "hot_key": hot["o_custkey"],
        "hot_key_rows": hot["count"],
        "hot_share": round(hot["count"] / n_orders, 4),
        "timings": timings,
        "aqe_skew_split_fired": skew_fired,
        "default_plan_broadcasts_dim": broadcast_used,
        "results_identical": True,
    }
    line = json.dumps(rec)
    print(line)
    hist = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench_history.jsonl",
    )
    with open(hist, "a") as fh:
        fh.write(line + "\n")


if __name__ == "__main__":
    main()
