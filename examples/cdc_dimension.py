"""Runnable tour of the lakehouse CDC surface — batch MERGE, SCD2
history, and the streaming SCD2 sink, composed the way a dimension
pipeline actually runs.

The reference overwrites flat CSV/JSON on every run
(ai_powered_financial_analysis.py:161, :298); this script shows the
incremental-load equivalents at engine grade: a customer dimension is
seeded, a change feed derived from orders lands on it three ways —

  1. ``maintenance.merge_upsert``          — latest-state MERGE (no history)
  2. ``maintenance.scd2_apply``            — one batch SCD2 apply, full history
  3. ``streaming.scd2_sink_incremental``   — the same apply as a continuous
                                             stream of micro-batches (open
                                             snapshot + append-only closed
                                             dirs, compacted), with a
                                             checkpoint restart mid-feed

and the final history is read back via ``latest_version`` (the "current
dimension" view) plus an as-of filter (the time-travel read). Every
semantics shown here is oracle-verified in the registry
(mt_merge_upsert / mt_scd2_orders) and stream≡fold-pinned in pytest
(test_scd2_sink_stream_equals_sequential_fold).

    python examples/cdc_dimension.py [sf_dir]

Defaults to /root/testdata/sf0.001. Runs offline.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from big_data_project_spark import io, streaming as st
from big_data_project_spark.operators import maintenance as mt
from big_data_project_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="cdc-dimension-example")
    cust = io.load_table(spark, sf_dir, "customer")
    orders = io.load_table(spark, sf_dir, "orders")

    # --- the change feed: per customer-year activity snapshot ------------
    feed = (
        orders.groupBy(
            F.col("o_custkey").alias("cust"),
            F.year("o_orderdate").alias("yr"),
        )
        .agg(F.max("o_orderdate").alias("u_ts"), F.count("*").alias("cnt"))
        .join(cust, F.col("cust") == F.col("c_custkey"))
        .select(
            "cust",
            "u_ts",
            "yr",
            F.when(F.col("cnt") >= 2, F.lit("HIGHVOL"))
            .otherwise(F.col("c_mktsegment"))
            .alias("seg"),
        )
    )
    years = sorted(r.yr for r in feed.select("yr").distinct().collect())
    print(f"change feed: {feed.count()} updates across years {years}")

    # --- 1. latest-state MERGE (history-free) ---------------------------
    target = cust.select(
        F.col("c_custkey").alias("cust"), F.col("c_mktsegment").alias("seg")
    )
    latest_updates = (
        feed.withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("cust").orderBy(F.col("u_ts").desc())
            ),
        )
        .where(F.col("_rn") == 1)
        .select("cust", "seg")
    )
    merged = mt.merge_upsert(target, latest_updates, "cust")
    print(f"merge_upsert: dimension now {merged.count()} rows "
          f"({latest_updates.count()} upserted)")

    # --- 2. one-shot SCD2 apply -----------------------------------------
    current = target.withColumn(
        "valid_from", F.lit("1992-01-01").cast("timestamp")
    ).withColumn("valid_to", F.lit(None).cast("timestamp"))
    hist = mt.scd2_apply(current, feed.select("cust", "u_ts", "seg"),
                         "cust", "u_ts", ["seg"])
    n_closed = hist.where(F.col("valid_to").isNotNull()).count()
    print(f"scd2_apply (one batch): {hist.count()} versions, {n_closed} closed")

    # --- 3. the same apply as a STREAM of per-year micro-batches --------
    work = tempfile.mkdtemp(prefix="bdps_cdc_")
    src, tgt, ckpt = (os.path.join(work, d) for d in ("src", "hist", "ckpt"))
    try:
        batches = [
            feed.where(F.col("yr") == y).select("cust", "u_ts", "seg")
            for y in years
        ]
        batches[0].write.mode("overwrite").parquet(src)
        schema = batches[0].schema
        q = st.scd2_sink_incremental(
            spark.readStream.schema(schema).parquet(src),
            tgt, ckpt, "cust", "u_ts", ["seg"],
        )
        q.processAllAvailable()
        mid = len(batches) // 2
        for b in batches[1:mid]:
            b.write.mode("append").parquet(src)
            q.processAllAvailable()
        q.stop()
        print(f"  stream stopped after year {years[mid - 1]} — restarting "
              "from the checkpoint (crash shape)")
        q2 = st.scd2_sink_incremental(
            spark.readStream.schema(schema).parquet(src),
            tgt, ckpt, "cust", "u_ts", ["seg"],
        )
        for b in batches[mid:]:
            b.write.mode("append").parquet(src)
            q2.processAllAvailable()
        q2.stop()

        k = st.compact_scd2_closed(spark, tgt)
        shist = st.scd2_history(spark, tgt)
        open_now = shist.where(F.col("valid_to").isNull())
        print(f"scd2_sink_incremental ({len(batches)} micro-batches, "
              f"1 restart, closed dirs compacted to base-{k}): "
              f"{shist.count()} versions, {open_now.count()} open")

        # --- read-back: current view + as-of time travel ----------------
        cur_view = mt.latest_version(shist, "cust", "valid_from")
        asof = years[0] + 2
        asof_rows = mt.history_asof(shist, f"{asof}-01-01")
        seg_now = {r.seg for r in cur_view.select("seg").distinct().collect()}
        print(f"latest_version: {cur_view.count()} current rows, "
              f"segments {sorted(seg_now)}")
        print(f"as-of {asof}-01-01: {asof_rows.count()} rows visible")
    finally:
        shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
