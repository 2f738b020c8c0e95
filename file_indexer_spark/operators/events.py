"""Event-stream analytics over the ``events`` table.

Batch formulations of the classic stream shapes — sessionization,
tumbling windows, funnels, top-k, JSON property extraction — over
``events(event_id, ts, user_id, event_type, value, props)``. The
streaming variants (watermarked, incremental) live in
``file_indexer_spark.streaming``; these batch versions are the
oracle-checkable semantics they must agree with.

Scale notes: every operator shuffles once on its natural key
(``user_id`` for sessions/funnels — high-cardinality, uniform;
(window, event_type) for tumbling aggs — partial aggregation makes the
shuffle tiny). Session assignment is the standard gaps-and-islands
window program: lag → new-session flag → running sum; one shuffle, no
self-join, no driver iteration.

Determinism: double sums are rounded (4 dp) identically in Spark and
the DuckDB oracle; window orderings always include ``event_id`` as the
total tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SESSION_GAP_MINUTES = 30


def sessionize(events: DataFrame, gap_minutes: int = SESSION_GAP_MINUTES) -> DataFrame:
    """e1: per-user sessions split at inactivity gaps > ``gap_minutes``.

    gaps-and-islands: a row starts a new session when it is the user's
    first event or follows the previous one by more than the gap; the
    running count of starts numbers the sessions.
    """
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # Interval arithmetic (ts > prev + gap) instead of unix_micros
    # subtraction: works for both TIMESTAMP and TIMESTAMP_NTZ (parquet
    # timestamps without a timezone load as NTZ, which unix_micros
    # rejects) and keeps microsecond precision.
    gap = F.make_interval(mins=F.lit(int(gap_minutes)))
    with_flag = events.withColumn(
        "new_session",
        F.when(
            F.lag("ts").over(order).isNull()
            | (F.col("ts") > F.lag("ts").over(order) + gap),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    running = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    with_session = with_flag.withColumn("session_seq", F.sum("new_session").over(running))
    return (
        with_session.groupBy("user_id", "session_seq")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
            F.countDistinct("event_type").alias("n_event_types"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .orderBy("user_id", "session_seq")
    )


def tumbling_counts(events: DataFrame) -> DataFrame:
    """e2: tumbling 1-hour windows per event type — the batch rendition
    of a streaming windowed aggregation (partial agg → tiny shuffle)."""
    return (
        events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("window_start"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .orderBy("window_start", "event_type")
    )


def funnel(events: DataFrame) -> DataFrame:
    """e3: strict-order view → click → purchase conversion funnel.

    One aggregation per user computes the earliest timestamp of each
    stage; a stage converts only if it happens strictly after the
    previous one. Single-row output.
    """
    per_user = events.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_purchase"),
    )
    clicked = F.col("t_view").isNotNull() & (F.col("t_click") > F.col("t_view"))
    purchased = clicked & F.col("t_purchase").isNotNull() & (F.col("t_purchase") > F.col("t_click"))
    return per_user.agg(
        F.count("*").alias("n_users"),
        F.sum(F.when(F.col("t_view").isNotNull(), 1).otherwise(0)).cast("long").alias("n_viewed"),
        F.sum(F.when(clicked, 1).otherwise(0)).cast("long").alias("n_clicked_after_view"),
        F.sum(F.when(purchased, 1).otherwise(0)).cast("long").alias("n_purchased_after_click"),
    )


def top_users(events: DataFrame, k: int = 20) -> DataFrame:
    """e4: top-k users by total event value (TakeOrderedAndProject —
    each partition keeps only k candidates, no full sort)."""
    totals = events.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 4).alias("total_value"),
    )
    return (
        totals.orderBy(F.desc("total_value"), "user_id")
        .limit(k)
        .withColumn(
            "rank",
            F.row_number().over(Window.orderBy(F.desc("total_value"), "user_id")),
        )
        .select("rank", "user_id", "n_events", "total_value")
    )


def props_stats(events: DataFrame) -> DataFrame:
    """e5: semi-structured property extraction — parse ``props`` JSON,
    pull the integer ``k`` field, aggregate per event type. JSON parsing
    happens map-side in the scan projection (JVM ``get_json_object``)."""
    parsed = events.select(
        "event_type",
        F.get_json_object(F.col("props"), "$.k").cast("long").alias("k"),
    )
    return (
        parsed.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("k").alias("n_distinct_k"),
            F.sum("k").cast("long").alias("sum_k"),
            F.round(F.sum("k").cast("double") / F.count("k").cast("double"), 6).alias("avg_k"),
        )
        .orderBy("event_type")
    )


def retention_cohorts(events: DataFrame) -> DataFrame:
    """e6: weekly cohort retention — users grouped by their first active
    week; for each (cohort, week-offset), how many came back.

    Shape: one distinct on (user, week) + one agg for the cohort map +
    one join + one agg. All keys are user_id (high-cardinality uniform)
    or (cohort_week, offset) (tiny) — no skew, no window needed.
    """
    weeks = events.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("week")
    ).distinct()
    cohort = weeks.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        weeks.join(cohort, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (F.datediff("week", "cohort_week") / 7).cast("int").alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").cast("long").alias("active_users"))
        .orderBy("cohort_week", "week_offset")
    )
