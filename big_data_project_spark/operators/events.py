"""Behavioral / event-stream analytics over the events table: funnels,
retention cohorts, transition matrices. The reference has no event
analytics (its events are documents), but an analytics engine serving the
same users needs the classic clickstream trio; all three are pure
Catalyst plans with full DuckDB oracles.

Scale shapes (all keyed by user_id, the natural even-cardinality key):

- funnel            : K sequential "first occurrence after previous step"
                      reductions — K groupBy+join rounds, each shuffling
                      only the users still alive in the funnel (monotone
                      shrinking), never the full event log more than once
                      per step.
- retention_cohorts : two aggregates over one join; the join's build side
                      is one row per user.
- transitions       : one window shuffle (user_id), then a tiny
                      (n_event_types²) aggregate.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def funnel(events: DataFrame, steps: Sequence[str] = ("view", "click", "purchase")) -> DataFrame:
    """Ordered funnel: users who performed each step strictly after their
    (earliest qualifying) previous step. Returns one row per step with the
    surviving-user count.

    Each stage is ``min(ts) after previous stage's ts`` — the textbook
    sequential-funnel reduction. Stage k's input is pre-filtered to one
    event type AND semi-joined to stage k-1's survivors, so per-stage
    shuffle volume shrinks monotonically; no per-user event array is ever
    collected (the collect_list formulation OOMs on power users at scale).
    """
    if not steps:
        raise ValueError("funnel() requires at least one step")
    reached: DataFrame | None = None
    per_step = []
    for i, step in enumerate(steps):
        stage = events.where(F.col("event_type") == step)
        if reached is None:
            cur = stage.groupBy("user_id").agg(F.min("ts").alias("t"))
        else:
            cur = (
                stage.join(reached, "user_id")
                .where(F.col("ts") > F.col("t"))
                .groupBy("user_id")
                .agg(F.min("ts").alias("t"))
            )
        reached = cur
        per_step.append(
            cur.agg(F.count("*").alias("n_users")).select(
                F.lit(f"{i + 1}:{step}").alias("step"), "n_users"
            )
        )
    out = per_step[0]
    for df in per_step[1:]:
        out = out.unionByName(df)
    return out


def retention_cohorts(events: DataFrame) -> DataFrame:
    """Weekly retention matrix: cohort = ISO week of each user's first
    event; one row per (cohort_week, week_offset) with the count of
    distinct users from that cohort active in that week.

    Spark and DuckDB agree on ``date_trunc('week', ...)`` (both truncate
    to Monday), so cohort boundaries are engine-exact. The offset is
    day-difference // 7 on already-truncated weeks — always a whole
    number of weeks, no partial-week rounding ambiguity."""
    firsts = events.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = (
        events.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            F.floor(
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week"))
                / 7
            )
            .cast("long")
            .alias("week_offset"),
        )
        .distinct()
    )
    return activity.groupBy("cohort_week", "week_offset").agg(
        F.count("*").alias("n_users")
    )


def transitions(events: DataFrame) -> DataFrame:
    """Event-type transition counts (first-order Markov matrix): for each
    user's time-ordered event sequence, count (event_type → next type)
    pairs. Tie-broken by event_id so the ordering — and therefore the
    counts — are deterministic across engines and runs."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        events.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .where(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").alias("n"))
    )


def rfm_segments(events: DataFrame) -> DataFrame:
    """RFM segmentation: per-user recency (days since last event, measured
    against the corpus max timestamp), frequency (event count), monetary
    (sum of purchase values, decimal-exact), each cut into quartiles.

    Quartiles use exact percentile THRESHOLDS (one tiny global aggregate,
    broadcast back) rather than a global ntile — ntile needs a total order
    over all users in one partition, which is exactly the
    single-partition-sort anti-pattern at scale. Threshold comparisons
    keep the whole scoring narrow."""
    per_user = events.groupBy("user_id").agg(
        F.max("ts").alias("last_ts"),
        F.count("*").cast("long").alias("frequency"),
        F.sum(
            F.expr(
                "CAST(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END"
                " AS DECIMAL(30,2))"
            )
        )
        .cast("double")
        .alias("monetary"),
    )
    # global max derives from the per-user aggregate — no second scan of
    # the fact table
    gmax = per_user.agg(F.max("last_ts").alias("gmax"))
    rfm = per_user.crossJoin(F.broadcast(gmax)).select(
        "user_id",
        F.datediff("gmax", "last_ts").cast("long").alias("recency_days"),
        "frequency",
        "monetary",
    )
    th = rfm.agg(
        *[
            F.expr(f"percentile({c}, {q})").alias(f"{c}_p{int(q * 100)}")
            for c in ("recency_days", "frequency", "monetary")
            for q in (0.25, 0.5, 0.75)
        ]
    )

    def quartile(c: str, invert: bool) -> F.Column:
        # low recency is GOOD -> invert so 4 is always the best bucket
        score = (
            F.lit(1)
            + (F.col(c) > F.col(f"{c}_p25")).cast("int")
            + (F.col(c) > F.col(f"{c}_p50")).cast("int")
            + (F.col(c) > F.col(f"{c}_p75")).cast("int")
        )
        return (F.lit(5) - score if invert else score).cast("long")

    return rfm.crossJoin(F.broadcast(th)).select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary",
        quartile("recency_days", invert=True).alias("r_score"),
        quartile("frequency", invert=False).alias("f_score"),
        quartile("monetary", invert=False).alias("m_score"),
    )


def last_touch_attribution(events: DataFrame) -> DataFrame:
    """Last-touch revenue attribution: each purchase is credited to the
    user's most recent non-purchase event strictly before it (first
    purchase with no prior touch credits 'none'). One user_id window, then
    a constant-size aggregate by attributed type."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.when(F.col("event_type") != "purchase", F.col("event_type"))
    attributed = events.withColumn(
        "touch", F.last(touch, ignorenulls=True).over(w)
    ).where(F.col("event_type") == "purchase")
    return attributed.groupBy(
        F.coalesce("touch", F.lit("none")).alias("touch_type")
    ).agg(
        F.count("*").alias("n_purchases"),
        F.sum(F.expr("CAST(value AS DECIMAL(30,2))"))
        .cast("double")
        .alias("attributed_value"),
    )


def ohlc_bars(events: DataFrame, unit: str = "hour") -> DataFrame:
    """Time-series resampling to OHLC bars (the financial downsampling the
    reference's domain implies but never ships): per (event_type, bucket)
    open/high/low/close of ``value`` plus volume and an exact decimal
    turnover. Open/close are selected by ``row_number`` over (ts, event_id)
    — a total order, so the bars are deterministic across engines and
    partitionings (``first``/``last`` aggregates are not). One window
    shuffle on (event_type, bucket); the rollup reuses the same
    partitioning."""
    w_a = Window.partitionBy("event_type", "bucket").orderBy("ts", "event_id")
    w_d = Window.partitionBy("event_type", "bucket").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    bucketed = events.select(
        "event_type",
        F.date_trunc(unit, "ts").alias("bucket"),
        "ts",
        "event_id",
        "value",
    )
    ranked = bucketed.select(
        "event_type",
        "bucket",
        "value",
        F.row_number().over(w_a).alias("rn_a"),
        F.row_number().over(w_d).alias("rn_d"),
    )
    return ranked.groupBy("event_type", "bucket").agg(
        F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
        F.count("*").alias("volume"),
        F.sum(F.expr("CAST(value AS DECIMAL(30,2))"))
        .cast("double")
        .alias("turnover"),
    )


def seasonal_profile(events: DataFrame, value: str = "value") -> DataFrame:
    """Calendar-seasonality baseline: mean value per (event_type,
    day-of-week, hour-of-day) cell against the event type's global mean —
    the profile a monitoring stack divides by to de-season a metric
    before anomaly logic (ts_anomaly's rolling z-score catches level
    shifts; this catches "Tuesday 9am is always high").

    Exactness: cell and global means are decimal-exact sums divided by
    counts (the davg pattern), and seasonal_ratio is one double division
    of identical operands on both engines — fully value-hashable. Shape:
    ONE scan of the facts (the per-type global mean rolls up from the
    cells' decimal partials — decimal addition is associative, so the
    rollup equals the direct global sum exactly), then a broadcast-sized
    join back (cells per type ≤ 7×24)."""
    cells = (
        events.groupBy(
            "event_type",
            F.dayofweek("ts").cast("int").alias("dow"),
            F.hour("ts").cast("int").alias("hour"),
        )
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(F.col(value).cast("decimal(30,2)")).alias("_dsum"),
            F.count(value).cast("long").alias("_nv"),
        )
    )
    glob = cells.groupBy("event_type").agg(
        F.try_divide(
            F.sum("_dsum").cast("double"), F.sum("_nv")
        ).alias("global_mean")
    )
    cells = cells.select(
        "event_type",
        "dow",
        "hour",
        "n_events",
        F.try_divide(F.col("_dsum").cast("double"), F.col("_nv")).alias(
            "mean_value"
        ),
    )
    return cells.join(F.broadcast(glob), "event_type").select(
        "event_type",
        "dow",
        "hour",
        "n_events",
        "mean_value",
        "global_mean",
        (F.col("mean_value") / F.col("global_mean")).alias("seasonal_ratio"),
    )
