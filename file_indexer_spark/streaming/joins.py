"""Watermarked STREAM-STREAM interval join — the attribution shape
(every view within the window preceding a purchase, per user), the one
streaming operator class the package didn't yet cover (st1-st8 are
stateful aggregations/dedup; this is two-sided join state).

One definition runs as a batch interval join (e15) and as a
stream-stream join (st9): Spark requires event-time watermarks on BOTH
sides plus a time-range predicate between their event-time columns —
that pair is what bounds the join state. Each side retains rows only
until the other side's watermark proves no future match can arrive
(view state lives ~watermark + join window), so state is
O(rate × window), not O(stream length).

Inner-join emission needs no watermark flush: a pair emits in the
micro-batch where its second side arrives (append mode), late rows
beyond the watermark are dropped — the standard trade, pinned in
tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ATTRIBUTION_GAP_MINUTES = 60


def view_purchase_pairs(
    events: DataFrame,
    max_gap_minutes: int = ATTRIBUTION_GAP_MINUTES,
    watermark_delay: str = "2 hours",
) -> DataFrame:
    """All (purchase, view) pairs of one user with the view inside the
    ``max_gap_minutes`` window before (or at) the purchase. Batch: a
    plain self-join with a range predicate (DuckDB-oracle-gated as
    e15). Streaming: the same plan compiles to a watermarked
    stream-stream join whose state both watermarks bound."""
    views = events.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("view_user"),
        F.col("ts").alias("view_ts"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    if events.isStreaming:
        views = views.withWatermark("view_ts", watermark_delay)
        purchases = purchases.withWatermark("purchase_ts", watermark_delay)
    gap = F.make_interval(mins=F.lit(int(max_gap_minutes)))
    cond = (
        (F.col("view_user") == F.col("user_id"))
        & (F.col("view_ts") <= F.col("purchase_ts"))
        & (F.col("view_ts") >= F.col("purchase_ts") - gap)
    )
    return purchases.join(views, cond).select(
        "purchase_id", "user_id", "purchase_ts", "view_id", "view_ts"
    )


def view_purchase_pairs_outer(
    events: DataFrame,
    max_gap_minutes: int = ATTRIBUTION_GAP_MINUTES,
    watermark_delay: str = "2 hours",
) -> DataFrame:
    """LEFT OUTER variant: every purchase emits, with NULL view columns
    when no view preceded it inside the window — the unattributed-
    conversion report.

    Streaming semantics are the interesting part: an unmatched
    purchase CANNOT emit when it arrives (a matching view might still
    come, late), so the engine holds it and emits the NULL row only
    once the view-side watermark proves the window closed — outer
    results trail the watermark, exactly like append-mode aggregation
    finalization. The st10 gate pushes the watermark past every real
    event with sentinel arrivals of BOTH types (both sides' watermarks
    must advance — the join's effective watermark is their min) and
    then hash-matches the batch LEFT JOIN oracle.
    """
    views = events.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("view_user"),
        F.col("ts").alias("view_ts"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    if events.isStreaming:
        views = views.withWatermark("view_ts", watermark_delay)
        purchases = purchases.withWatermark("purchase_ts", watermark_delay)
    gap = F.make_interval(mins=F.lit(int(max_gap_minutes)))
    cond = (
        (F.col("view_user") == F.col("user_id"))
        & (F.col("view_ts") <= F.col("purchase_ts"))
        & (F.col("view_ts") >= F.col("purchase_ts") - gap)
    )
    return purchases.join(views, cond, "left_outer").select(
        "purchase_id", "user_id", "purchase_ts", "view_id", "view_ts"
    )
