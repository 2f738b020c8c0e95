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


def sessionize_skew_safe(
    events: DataFrame, gap_minutes: int = SESSION_GAP_MINUTES
) -> DataFrame:
    """e1 under key skew: identical output to ``sessionize`` but safe
    when one user holds a huge share of the events (a bot/service
    account that would otherwise become a single straggler task).

    Two passes, the standard day-bucket fix:

    1. Sessionize within ``(user_id, day)`` partitions — the giant
       user's events spread across as many tasks as they span days, so
       no single window partition exceeds one day of one user. Each
       local session becomes a FRAGMENT row (start, end, counts,
       distinct-type set, raw value sum).
    2. Re-run gaps-and-islands per user over the FRAGMENTS (≤ sessions
       + days rows per user) and merge boundary fragments whose gap ≤
       the threshold. The fragment-level rule (start > prev_end + gap
       starts a new session) is exactly the event-level rule because
       day buckets partition time: every event of fragment k precedes
       every event of fragment k+1.

    Pass 2's cost is bounded by the SESSION count, not the event count
    — the win is large exactly when sessions are long (the skewed-bot
    case this operator exists for). On a corpus of near-singleton
    sessions (fragments ≈ events) pass 2 is inherently ~full volume;
    two measured refinements that tried to shrink it LOST on the 100×
    sweep (documented in PERFORMANCE.md "e1b refinement experiments"):
    routing only edge-touching USERS to pass 2 (93% of multi-day users
    touch a day edge → routes nearly everything, +60%) and a
    fragment-level scheme merging only the 4% edge fragments with
    day-offset renumbering (its checkpoint + extra joins cost more
    than the saved shuffle, +28%). The simple two-window form below is
    the measured optimum at both 1× and 100×.

    Correctness vs the plain path is pinned by a property test with one
    user holding ~90% of events (tests/test_properties.py), including
    midnight-straddling sessions.
    """
    gap = F.make_interval(mins=F.lit(int(gap_minutes)))
    order = Window.partitionBy("user_id", "day").orderBy("ts", "event_id")
    bucketed = events.withColumn("day", F.date_trunc("day", F.col("ts")))
    with_flag = bucketed.withColumn(
        "new_session",
        F.when(
            F.lag("ts").over(order).isNull()
            | (F.col("ts") > F.lag("ts").over(order) + gap),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    running = Window.partitionBy("user_id", "day").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    fragments = (
        with_flag.withColumn("frag_seq", F.sum("new_session").over(running))
        .groupBy("user_id", "day", "frag_seq")
        .agg(
            F.min("ts").alias("frag_start"),
            F.max("ts").alias("frag_end"),
            F.count("*").alias("n_events"),
            F.collect_set("event_type").alias("type_set"),
            F.sum("value").alias("value_sum"),
        )
    )
    # pass 2: gaps-and-islands over fragments (tiny per user).
    forder = Window.partitionBy("user_id").orderBy("frag_start", "day", "frag_seq")
    merged_flag = fragments.withColumn(
        "new_session",
        F.when(
            F.lag("frag_end").over(forder).isNull()
            | (F.col("frag_start") > F.lag("frag_end").over(forder) + gap),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    frunning = Window.partitionBy("user_id").orderBy("frag_start", "day", "frag_seq").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        merged_flag.withColumn("session_seq", F.sum("new_session").over(frunning))
        .groupBy("user_id", "session_seq")
        .agg(
            F.min("frag_start").alias("session_start"),
            F.max("frag_end").alias("session_end"),
            F.sum("n_events").alias("n_events"),
            F.size(F.array_distinct(F.flatten(F.collect_list("type_set")))).cast("long").alias(
                "n_event_types"
            ),
            F.round(F.sum("value_sum"), 4).alias("total_value"),
        )
        .orderBy("user_id", "session_seq")
    )


def session_stats_skew_safe(
    events: DataFrame, gap_minutes: int = SESSION_GAP_MINUTES
) -> DataFrame:
    """e1c: per-session stats WITHOUT global session numbering — the
    contract change that removes e1b's second full-volume pass.

    e1b must renumber every session per user (``session_seq``), which
    forces its fragment-merge window to visit ALL fragments (≈ events
    on a near-singleton-session corpus — the measured 11.6× tail at
    100×, PERFORMANCE.md). Dropping the ordinal makes ``(user_id,
    session_start)`` the session key, and then a pure TIME predicate
    bounds the merge work:

      * pass 1 (unchanged from e1b): sessionize within ``(user_id,
        day)`` buckets — skew-safe, the giant user spreads over days;
      * a fragment can merge across a midnight iff it is within one
        gap of a day edge: ``frag_end + gap >= day+1d`` (provably the
        LAST fragment of its day — a later same-day fragment would
        have to start after ``frag_end + gap`` yet before midnight)
        or ``frag_start <= day + gap`` (provably the FIRST — an
        earlier fragment's end would have to precede the day start).
        Interior fragments are COMPLETE sessions and are emitted
        directly, no second pass, no join-back, no renumbering;
      * pass 2 runs the e1b fragment merge over only the edge
        candidates (≤ 2 per user-day, independent of session shape),
        then the two legs union.

    Completeness of the routing: a cross-midnight merge ``A.end + gap
    >= B.start`` with A in day d, B in day d+1 forces ``A.end >=
    midnight - gap`` (A routed) and ``B.start <= midnight + gap`` (B
    routed), so no merge partner is ever left in the interior leg;
    same-day fragments are maximally merged by construction and never
    need pass 2. Semantics (strict ``>`` gap rule, stats columns)
    otherwise identical to e1 — pinned by the same DuckDB oracle shape
    and a property test against e1 minus the ordinal.

    100 TB shape: ONE full-volume shuffle (the day-bucketed window +
    fragment agg, skew-bounded), then a shuffle over the ~2/user/day
    edge subset, then a shuffle-free union. This is the default
    skew-safe path; use e1b only when the consumer genuinely needs
    per-user session ordinals.
    """
    gap = F.make_interval(mins=F.lit(int(gap_minutes)))
    order = Window.partitionBy("user_id", "day").orderBy("ts", "event_id")
    bucketed = events.withColumn("day", F.date_trunc("day", F.col("ts")))
    with_flag = bucketed.withColumn(
        "new_session",
        F.when(
            F.lag("ts").over(order).isNull()
            | (F.col("ts") > F.lag("ts").over(order) + gap),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    running = Window.partitionBy("user_id", "day").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # localCheckpoint: both output legs (interior sessions, edge merge)
    # reference the fragment table; without it Spark recomputes the
    # full-volume pass-1 window once per leg (only the scan exchange is
    # reused). Fragments are O(sessions + user-days) rows — cheap to pin.
    fragments = (
        with_flag.withColumn("frag_seq", F.sum("new_session").over(running))
        .groupBy("user_id", "day", "frag_seq")
        .agg(
            F.min("ts").alias("frag_start"),
            F.max("ts").alias("frag_end"),
            F.count("*").alias("n_events"),
            F.collect_set("event_type").alias("type_set"),
            F.sum("value").alias("value_sum"),
        )
        .localCheckpoint(eager=False)
    )
    day_end = F.col("day") + F.make_interval(days=F.lit(1))
    tagged = fragments.withColumn(
        "is_edge",
        (F.col("frag_end") + gap >= day_end)
        | (F.col("frag_start") <= F.col("day") + gap),
    )
    interior = tagged.filter(~F.col("is_edge")).select(
        "user_id",
        F.col("frag_start").alias("session_start"),
        F.col("frag_end").alias("session_end"),
        "n_events",
        F.size("type_set").cast("long").alias("n_event_types"),
        F.round("value_sum", 4).alias("total_value"),
    )
    edge = tagged.filter(F.col("is_edge"))
    forder = Window.partitionBy("user_id").orderBy("frag_start", "day", "frag_seq")
    merged_flag = edge.withColumn(
        "new_session",
        F.when(
            F.lag("frag_end").over(forder).isNull()
            | (F.col("frag_start") > F.lag("frag_end").over(forder) + gap),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    frunning = Window.partitionBy("user_id").orderBy(
        "frag_start", "day", "frag_seq"
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    merged = (
        merged_flag.withColumn("mseq", F.sum("new_session").over(frunning))
        .groupBy("user_id", "mseq")
        .agg(
            F.min("frag_start").alias("session_start"),
            F.max("frag_end").alias("session_end"),
            F.sum("n_events").alias("n_events"),
            F.size(F.array_distinct(F.flatten(F.collect_list("type_set"))))
            .cast("long")
            .alias("n_event_types"),
            F.round(F.sum("value_sum"), 4).alias("total_value"),
        )
        .drop("mseq")
    )
    return interior.unionByName(merged).orderBy("user_id", "session_start")


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


def asof_last_match(
    events: DataFrame, probe_type: str = "purchase", match_type: str = "view"
) -> DataFrame:
    """e7: as-of join — for each ``probe_type`` event, the timestamp of
    the same user's most recent ``match_type`` event at or before it.

    Spark has no ASOF JOIN operator; the scalable formulation is NOT a
    join at all: union both sides, one window per user ordered by
    (ts, side, event_id) with matches sorting before probes on ties,
    and carry the last non-null match timestamp forward. One shuffle on
    user_id (high-cardinality, uniform), zero join, state O(1) per row
    — survives any scale the events table reaches. The DuckDB oracle
    uses its native ASOF LEFT JOIN, making this a genuine cross-engine
    semantics check.
    """
    tagged = events.filter(F.col("event_type").isin(match_type, probe_type)).select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("event_type") == match_type, F.col("ts")).alias("match_ts"),
        F.when(F.col("event_type") == match_type, F.lit(0)).otherwise(F.lit(1)).alias("side"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        tagged.withColumn("last_match_ts", F.last("match_ts", ignorenulls=True).over(w))
        .filter(F.col("side") == 1)
        .select(
            "event_id",
            "user_id",
            F.col("ts").alias("probe_ts"),
            "last_match_ts",
        )
        .orderBy("event_id")
    )


ROLLING_EPOCH = "2024-01-01"


def rolling_daily_value(events: DataFrame, days: int = 7) -> DataFrame:
    """e8: per-event-type daily totals plus a trailing ``days``-day
    rolling sum/count — the batch rendition of a sliding window.

    Two-level shape: the daily pre-aggregate collapses the corpus to
    O(types x days) rows map-side (partial agg), and the RANGE window
    runs over that tiny frame keyed by an integer day index — the
    expensive input never reaches the window operator.
    """
    daily = events.groupBy(
        F.col("event_type"),
        F.to_date("ts").alias("day"),
    ).agg(
        F.count("*").alias("day_events"),
        F.round(F.sum("value"), 4).alias("day_value"),
    )
    indexed = daily.withColumn(
        "day_idx", F.datediff(F.col("day"), F.lit(ROLLING_EPOCH).cast("date"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day_idx")
        .rangeBetween(-(days - 1), Window.currentRow)
    )
    return (
        indexed.select(
            "event_type",
            "day",
            "day_events",
            "day_value",
            F.sum("day_events").over(w).alias("trail_events"),
            F.round(F.sum("day_value").over(w), 4).alias("trail_value"),
        )
        .orderBy("event_type", "day")
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


def preceding_window_counts(
    events: DataFrame,
    probe_type: str = "purchase",
    match_type: str = "view",
    window_seconds: int = 3600,
) -> DataFrame:
    """e9: for each ``probe_type`` event, how many ``match_type`` events
    the same user produced in the strictly-preceding ``window_seconds``
    — interval-join ("events within a trailing window of each probe")
    semantics WITHOUT an inequality join.

    A naive formulation is a theta-join (probe.ts - 1h <= match.ts <
    probe.ts), which Spark can only plan as a nested loop — quadratic at
    scale. The scalable shape: union both event kinds, one RANGE window
    per user over an epoch-microsecond key summing the match flag. One
    shuffle on user_id, value-based frames, zero joins. The epoch key is
    RELATIVE (timestampdiff from a fixed origin) so it is timezone- and
    TIMESTAMP_NTZ-safe; range frames only ever subtract the key, so the
    origin cancels against the oracle's absolute epoch_us.
    """
    us = F.expr("timestampdiff(MICROSECOND, timestamp_ntz'2024-01-01 00:00:00', ts)")
    tagged = events.filter(F.col("event_type").isin(match_type, probe_type)).select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        us.alias("eus"),
        F.when(F.col("event_type") == match_type, F.lit(1)).otherwise(F.lit(0)).alias("is_match"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("eus")
        .rangeBetween(-window_seconds * 1_000_000, -1)
    )
    return (
        tagged.withColumn(
            "n_matches", F.coalesce(F.sum("is_match").over(w), F.lit(0)).cast("long")
        )
        .filter(F.col("event_type") == probe_type)
        .select("event_id", "user_id", F.col("ts").alias("probe_ts"), "n_matches")
        .orderBy("event_id")
    )


def sliding_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    slide_duration: str = "15 minutes",
) -> DataFrame:
    """e10: sliding (hopping) window counts per event type — each event
    lands in window/slide overlapping windows (4 for 1h/15min).

    Uses the SAME ``F.window`` expression as the streaming variant
    (streaming/windows.py), so batch and stream share one windowing
    semantics. The explode is map-side (a Generate of overlap rows);
    partial aggregation keeps the shuffle at O(types x windows).
    """
    return (
        events.groupBy(
            F.window("ts", window_duration, slide_duration).alias("win"), "event_type"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
        .orderBy("window_start", "event_type")
    )


def event_transitions(events: DataFrame) -> DataFrame:
    """e11: first-order transition matrix over each user's event
    sequence — counts and row-normalized probabilities per
    (prev_type, next_type) pair.

    lag() over the per-user sequence (one shuffle on user_id), then a
    hash agg to the O(types^2) matrix; the probability normalization
    windows over that tiny frame, never the event stream.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = events.select(
        F.lag("event_type").over(w).alias("prev_type"),
        F.col("event_type").alias("next_type"),
    ).filter(F.col("prev_type").isNotNull())
    counts = pairs.groupBy("prev_type", "next_type").agg(
        F.count("*").alias("n_transitions")
    )
    per_prev = Window.partitionBy("prev_type")
    return (
        counts.withColumn(
            "transition_p",
            F.round(
                F.col("n_transitions").cast("double")
                / F.sum("n_transitions").over(per_prev).cast("double"),
                6,
            ),
        )
        .orderBy("prev_type", "next_type")
    )


def gap_percentiles(events: DataFrame) -> DataFrame:
    """e12: inter-arrival profile — exact p50/p90/p99 of the
    microsecond gap between a user's consecutive events, per event type
    of the later event. The latency-distribution shape every
    stream-health dashboard needs.

    lag window on user_id produces the gaps map-side after one shuffle;
    the percentile agg groups by the tiny event_type key. At 100 TB
    swap percentile -> percentile_approx (same plan, sketch agg).
    """
    gaps = _event_gaps(events)
    return (
        gaps.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_gaps"),
            F.round(F.expr("percentile(gap_us, 0.5)"), 4).alias("p50_us"),
            F.round(F.expr("percentile(gap_us, 0.9)"), 4).alias("p90_us"),
            F.round(F.expr("percentile(gap_us, 0.99)"), 4).alias("p99_us"),
        )
        .orderBy("event_type")
    )


def _event_gaps(events: DataFrame) -> DataFrame:
    return events.select(
        "event_type",
        F.expr(
            "timestampdiff(MICROSECOND, "
            "lag(ts) over (partition by user_id order by ts, event_id), ts)"
        ).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())


def gap_percentiles_approx(events: DataFrame, accuracy: int = 10000) -> DataFrame:
    """e12a: the 100 TB execution path for e12 — identical gap
    derivation, ``percentile_approx`` sketch agg (single pass,
    mergeable partials, rank error ≤ 1/accuracy) instead of the exact
    per-group percentile sort. Rows-only driver check (sketch output is
    implementation-defined); tolerance vs e12 pinned in pytest."""
    gaps = _event_gaps(events)
    pcts = F.percentile_approx(
        "gap_us", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)), F.lit(accuracy)
    )
    return (
        gaps.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_gaps"),
            pcts.alias("pcts"),
        )
        .select(
            "event_type",
            "n_gaps",
            F.col("pcts")[0].cast("double").alias("p50_us"),
            F.col("pcts")[1].cast("double").alias("p90_us"),
            F.col("pcts")[2].cast("double").alias("p99_us"),
        )
        .orderBy("event_type")
    )


def daily_uniques(events: DataFrame) -> DataFrame:
    """e13: exact distinct users (and sessions-proxy event counts) per
    day — the canonical cardinality rollup.

    Exact COUNT(DISTINCT) is a two-phase aggregate: Spark first
    deduplicates (day, user_id) with map-side partials, then counts per
    day — the shuffle carries one row per distinct pair, which at
    100 TB IS the bottleneck (billions of distinct users × days). e13a
    is the sketch path that caps that shuffle at kilobytes per group.
    """
    return (
        events.groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
        )
        .orderBy("day")
    )


def daily_uniques_approx(events: DataFrame, rsd: float = 0.05) -> DataFrame:
    """e13a: HyperLogLog++ distinct users per day — the 100 TB path.

    ``approx_count_distinct`` keeps one fixed-size HLL sketch per group
    (map-side mergeable, O(kB) regardless of group size), so the
    distinct-count shuffle carries sketches instead of one row per
    distinct (day, user) pair. Standard error ``rsd`` (default 5 %);
    sketch internals are engine-specific, so this registers rows-only —
    pytest pins the relative error against exact e13.
    """
    return (
        events.groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.approx_count_distinct("user_id", rsd).cast("long").alias("n_users_approx"),
        )
        .orderBy("day")
    )


# ----------------------------------------------------------------- e17
DEBOUNCE_GAP_S = 3600  # events closer than this (transitively) collapse


def debounce_events(events: DataFrame, gap_s: int = DEBOUNCE_GAP_S) -> DataFrame:
    """e17: per-(user, event_type) burst collapse — repeated firings
    within ``gap_s`` of the previous event (chained, so a long burst
    collapses however long it runs) reduce to their FIRST event plus
    suppression accounting. The telemetry dedup/throttle rule: retries,
    double-clicks and alert storms become one kept row.

    Same gaps-and-islands program as e1 (lag -> new-burst flag ->
    running sum: one shuffle on the (user, type) key, three window
    passes over it, no joins); the burst reduction is the same hash
    agg. The microsecond key is RELATIVE (timestampdiff from a fixed
    origin — NTZ-safe, e9's idiom); gap and span only ever subtract it,
    so the origin cancels. The kept event is the lexicographic
    (ts, event_id) minimum, so ties are deterministic.
    """
    key = ["user_id", "event_type"]
    w = Window.partitionBy(*key).orderBy("us", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    us = F.expr("timestampdiff(MICROSECOND, timestamp_ntz'2024-01-01 00:00:00', ts)")
    tagged = events.select(
        *key, "event_id", "ts", us.alias("us")
    ).withColumn("prev_us", F.lag("us").over(w))
    flagged = tagged.withColumn(
        "new_burst",
        (
            F.col("prev_us").isNull()
            | ((F.col("us") - F.col("prev_us")) > gap_s * 1_000_000)
        ).cast("int"),
    )
    bursts = flagged.withColumn("burst_seq", F.sum("new_burst").over(run))
    return (
        bursts.groupBy(*key, F.col("burst_seq").cast("long").alias("burst_seq"))
        .agg(
            F.min(F.struct("us", "event_id", "ts")).alias("kept"),
            F.count("*").cast("long").alias("n_events"),
            (F.max("us") - F.min("us")).cast("long").alias("span_us"),
        )
        .select(
            "user_id",
            "event_type",
            "burst_seq",
            F.col("kept.event_id").alias("kept_event_id"),
            F.col("kept.ts").alias("kept_ts"),
            (F.col("n_events") - 1).cast("long").alias("n_suppressed"),
            "span_us",
        )
        .orderBy("user_id", "event_type", "burst_seq")
    )


CLICK_WITHIN_MIN = 2880  # e18: click within 48 h of the first view
PURCHASE_WITHIN_MIN = 10080  # ...purchase within 7 d of the matched click


def deadline_funnel(
    events: DataFrame,
    click_within_min: int = CLICK_WITHIN_MIN,
    purchase_within_min: int = PURCHASE_WITHIN_MIN,
) -> DataFrame:
    """e18: the DEADLINE funnel — view → click within 48 h of the
    first view → purchase within 7 d of the matched click (windows
    sized to the fixture's hours-scale event density; the semantics
    is the attribution-window funnel at any setting). e3 counts
    stage order only; real conversion analytics binds each stage to a
    time budget from the PREVIOUS MATCHED stage (the sequential
    pattern-match shape funnel engines compile).

    Matching is greedy-first and deterministic: the anchor is the
    user's earliest view; the click is the earliest click inside that
    view's window; the purchase the earliest inside that click's
    window. Greedy-first is the standard funnel semantics and makes
    the result a pure function of the event set.

    Scale shape: ONE shuffle (groupBy user) collecting each user's
    per-stage timestamp lists; the greedy match is a map-side
    array_min/filter cascade over those bounded lists (per-user event
    counts — e1's state contract; e1b's salting applies if one user is
    the whole stream). No joins, no second pass, single-row output.
    """
    per_user = events.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.collect_list(F.when(F.col("event_type") == "click", F.col("ts"))).alias(
            "clicks"
        ),
        F.collect_list(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "purchases"
        ),
    )
    staged = per_user.withColumn(
        "t_click",
        F.expr(
            f"array_min(filter(clicks, c -> c > t_view AND "
            f"c <= t_view + INTERVAL {click_within_min} MINUTES))"
        ),
    ).withColumn(
        "t_purchase",
        F.expr(
            f"array_min(filter(purchases, p -> p > t_click AND "
            f"p <= t_click + INTERVAL {purchase_within_min} MINUTES))"
        ),
    )
    return staged.agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum(F.when(F.col("t_view").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_viewed"),
        F.sum(F.when(F.col("t_click").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_clicked_within"),
        F.sum(F.when(F.col("t_purchase").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_purchased_within"),
    )


def linear_attribution(events: DataFrame) -> DataFrame:
    """e19: linear multi-touch attribution — each purchase's value is
    split EQUALLY across the user's views inside the attribution
    window before it (e15's pair set), then rolled up per view. e7
    answers "which single view gets the credit" (last-touch); e19 is
    the allocation model a marketing/curation pipeline actually sums:
    every touch gets value/n, so per-view credit is comparable across
    campaigns.

    Exactness: purchase value enters as e6 fixed-point
    (``ROUND(value * 1e6)``) and each share is ``value_e6 DIV
    n_touches`` — integer division on NONNEGATIVE values, identical in
    Spark and DuckDB (negative values would floor vs truncate
    differently; purchase values are amounts, and the operator
    documents that contract rather than paying a guard on the hot
    path). Remainder micro-units are deliberately dropped, the same
    deterministic-truncation choice as dd18's rank quanta.

    Scale shape for 100 TB: the pair join shuffles both filtered event
    slices once on user_id (e15's plan); the per-purchase touch count
    is a WINDOW over purchase_id (one exchange, no join-back); the
    final per-view rollup is a hash aggregate with map-side combine.
    Skewed users salt exactly as e1b does.
    """
    from file_indexer_spark.streaming.joins import view_purchase_pairs

    purchase_value = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.expr("CAST(ROUND(value * 1000000) AS BIGINT)").alias("value_e6"),
    )
    pairs = view_purchase_pairs(events).join(purchase_value, "purchase_id")
    w = Window.partitionBy("purchase_id")
    shares = pairs.select(
        "view_id",
        "user_id",
        F.expr("value_e6").alias("value_e6"),
        F.count("*").over(w).alias("n_touches"),
    ).select(
        "view_id",
        "user_id",
        F.expr("value_e6 DIV n_touches").alias("share_e6"),
    )
    return (
        shares.groupBy("view_id", "user_id")
        .agg(
            F.count("*").cast("long").alias("n_conversions"),
            F.sum("share_e6").cast("long").alias("attributed_e6"),
        )
        .orderBy("view_id")
    )


# e20: heavy-hitter threshold (report users with > 1/HH_T of all
# events) and the sketch capacity headroom factor. Capacity 2*HH_T
# satisfies the Misra-Gries guarantee (a key with local count
# > n_p/(C+1) always survives its partition summary; a global
# > n/HH_T hitter exceeds that in at least one partition by
# pigeonhole) with margin. 1500 makes the threshold bite on the
# uniform fixture at sf0.1 (~67 events/user vs threshold 66) while
# remaining deterministic at every factor; on real power-law traffic
# any t works — the guarantee is distribution-free.
HH_T = 1500
HH_CAPACITY = 2 * HH_T


def mg_merge(counters, vc, cap: int):
    """Batched Misra-Gries merge (vectorized — no per-row Python
    loop), THE shared fold of e20's partition sketch and st17's
    per-group streaming state: a batch's exact ``value_counts`` IS an
    MG summary with zero error, and MG summaries merge by adding
    counters and, when more than ``cap`` survive, subtracting the
    (cap+1)-th largest counter from all and dropping non-positives
    (Agarwal et al., "Mergeable Summaries": the total decrement across
    any fold stays <= n/(cap+1), so a key with true count > n/(cap+1)
    always finishes positive — the superset guarantee holds under ANY
    merge order).

    Counter dtype contract: the merge is int64 END TO END — the
    reindex-union form below avoids ``Series.add(fill_value=...)``,
    whose index alignment round-trips through float64 and would cap
    exactness at 2^53 events per fold (the dd18/dd20 BIGINT-contract
    discipline, applied to the sketch)."""
    if counters is None:
        merged = vc.astype("int64")
    else:
        idx = counters.index.union(vc.index)
        merged = counters.reindex(idx, fill_value=0).astype(
            "int64"
        ) + vc.reindex(idx, fill_value=0).astype("int64")
    if len(merged) > cap:
        d = merged.nlargest(cap + 1).iloc[-1]
        merged = merged[merged > d] - d
    return merged


def heavy_hitters_verify(
    events: DataFrame, candidates: DataFrame, n_total: int, t: int = HH_T
) -> DataFrame:
    """The exact second pass shared by e20 and st17: count ONLY the
    candidate superset (broadcast semi-join — the exchange carries
    O(candidates) partials, never O(distinct users)) and keep counts
    above the n/t threshold."""
    threshold = n_total // t
    exact = (
        events.join(F.broadcast(candidates), "user_id", "left_semi")
        .groupBy("user_id")
        .agg(F.count("*").cast("long").alias("n_events"))
        .filter(F.col("n_events") > threshold)
    )
    return exact.select(
        "user_id",
        "n_events",
        F.round(F.col("n_events").cast("double") / n_total, 6).alias("frequency"),
    ).orderBy(F.desc("n_events"), "user_id")


def heavy_hitters(
    events: DataFrame, t: int = HH_T, capacity: int | None = None
) -> DataFrame:
    """e20: EXACT frequency heavy hitters (users with more than n/t of
    all events) via the two-pass sketch-then-verify pattern — the way
    a 100 TB stream answers this WITHOUT a full-cardinality shuffle:

      * pass 1 (map-side only, no shuffle of raw events): a
        Misra-Gries summary of capacity C = 2t per partition inside
        one Arrow batch stream. MG guarantees a key with local count
        > n_p/C survives its partition's summary, so every GLOBAL
        heavy hitter (> n/t >= sum_p n_p/C) appears in at least one
        partition's candidate set — the union is a SUPERSET of the
        answer, at most C keys per partition;
      * pass 2: exact counts for the candidate set only — the
        aggregate's shuffle carries <= C x partitions partial rows
        instead of O(distinct users).

    The candidate superset property makes the two-pass result EXACTLY
    equal to the naive global groupBy (which is what the oracle runs),
    so this is a full hash gate, not a bounds companion — the sketch
    buys the plan shape, not an approximation.

    A plain ``groupBy(user_id)`` shuffles O(distinct users) rows; at
    100 TB with billions of users that is the dominant exchange. Here
    the exchange is O(candidates): bounded by construction.
    """
    import pandas as pd

    cap = capacity if capacity is not None else max(HH_CAPACITY, 2 * t)
    if cap < t:  # the superset guarantee needs cap + 1 > t
        raise ValueError(f"capacity {cap} too small for threshold 1/{t}")
    n_total = events.count()

    def _mg_partition(batches):
        import numpy as np

        counters = None
        for pdf in batches:
            counters = mg_merge(counters, pdf["user_id"].value_counts(), cap)
        # the empty branch must be an explicitly int64 array too — an
        # object-dtype [] only coerces through pyarrow by accident
        yield pd.DataFrame(
            {
                "user_id": (
                    counters.index.to_numpy(dtype="int64")
                    if counters is not None
                    else np.array([], dtype="int64")
                )
            }
        )

    candidates = (
        events.select("user_id")
        .mapInPandas(_mg_partition, "user_id long")
        .distinct()
    )
    return heavy_hitters_verify(events, candidates, n_total, t)


# e21: recency half-life. The decay law is QUANTIZED to quarter
# half-lives so the weight needs no pow(): age maps to an integer
# quarter count q, and 0.5^(q/4) = (exact power of two for q DIV 4)
# x (one of four sqrt-composed constants for q % 4). sqrt is
# IEEE-754 correctly rounded on BOTH engines (mx3's precedent —
# pow() is NOT, and a 1-ulp pow difference at a ROUND(x*1e6)
# half-way boundary would flip w_e6 by one micro-unit; ADVICE r10),
# so every per-row weight is bit-identical across engines BEFORE
# the micro-unit quantization.  Weights quantize to integer
# micro-units per row before aggregation, so the per-user sums are
# exact integers. e6 quanta leave the weighted-value sum (e8 units)
# ~1e18/5e16 BIGINT headroom at 100x; past that, raise the sum
# dtype to DECIMAL(38,0) (t14's rule).
DECAY_HALF_LIFE_DAYS = 7

# 2^-21 * 1e6 ~= 0.477 rounds to 0 micro-units, and the fractional
# factor only shrinks it — so >= 21 whole half-lives is weight 0
# without touching shiftleft overflow territory.
_DECAY_ZERO_HALF_LIVES = 21

# w_e6 from the quarter count q: CASE q%4 gives the sqrt-composed
# fractional factor; division by the exact power of two 1<<(q DIV 4)
# is exact; x1e6 and ROUND act on bit-identical doubles.
_DECAY_W_E6 = (
    "CASE WHEN q_qhl DIV 4 >= {zero} THEN CAST(0 AS BIGINT) "
    "ELSE CAST(ROUND("
    "(CASE q_qhl % 4 WHEN 0 THEN CAST(1.0 AS DOUBLE) "
    "WHEN 1 THEN sqrt(sqrt(0.5)) "
    "WHEN 2 THEN sqrt(0.5) "
    "ELSE sqrt(0.5) * sqrt(sqrt(0.5)) END) "
    "/ CAST(shiftleft(CAST(1 AS BIGINT), CAST(q_qhl DIV 4 AS INT)) AS DOUBLE) "
    "* 1000000) AS BIGINT) END"
)


def decayed_engagement(
    events: DataFrame, half_life_days: int = DECAY_HALF_LIFE_DAYS, k: int = 20
) -> DataFrame:
    """e21: exponential time-decay scoring — each event weighs
    2^(-q/4) where q is its age in WHOLE QUARTER half-lives, measured
    back from the corpus's max event time (a deterministic anchor; a
    production run anchors on the batch watermark). The recency-
    weighted engagement feature every ranking/feature-store pipeline
    computes, and the decayed counterpart of e4's raw top-users.

    The quarter-half-life staircase is the determinism contract: the
    weight decomposes into an exact power of two times a sqrt-composed
    fractional factor, both bit-identical across engines (see
    _DECAY_W_E6) — continuous 0.5^(age/hl) would ride on pow(), which
    is not correctly rounded and can flip a micro-unit at a ROUND
    half-way boundary.

    Scale shape: one 1-row max-ts broadcast, one map-side weight
    expression, one user-key hash aggregate with map-side combine,
    TakeOrderedAndProject top-k. Scan-bound.
    """
    anchor = events.agg(F.max("ts").alias("anchor_ts"))
    hl_us = half_life_days * 86_400_000_000
    weighted = events.join(F.broadcast(anchor)).select(
        "user_id",
        # timestampdiff is the NTZ-safe age idiom (see
        # preceding_window_counts); both engines produce the same
        # integer microseconds, and *4 DIV hl_us keeps the quarter
        # count in pure BIGINT arithmetic
        F.expr(
            "(timestampdiff(MICROSECOND, ts, anchor_ts) * 4)"
            f" DIV {hl_us}"
        ).alias("q_qhl"),
        F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("value_e2"),
    ).select(
        "user_id",
        F.expr(_DECAY_W_E6.format(zero=_DECAY_ZERO_HALF_LIVES)).alias("w_e6"),
        "value_e2",
    )
    scored = weighted.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum("w_e6").cast("long").alias("decayed_count_e6"),
        F.sum(F.expr("w_e6 * value_e2")).cast("long").alias("decayed_value_e8"),
    )
    w = Window.orderBy(F.desc("decayed_value_e8"), "user_id")
    return (
        scored.orderBy(F.desc("decayed_value_e8"), "user_id")
        .limit(k)
        .select(
            F.row_number().over(w).cast("int").alias("rank"),
            "user_id",
            "n_events",
            "decayed_count_e6",
            "decayed_value_e8",
        )
        .orderBy("rank")
    )
