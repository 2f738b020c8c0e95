"""Custom stateful streaming operator: continuous sessionization via
``applyInPandasWithState``.

The batch gaps-and-islands sessionizer (operators/events.py e1) needs
the whole history per user; a stream can't re-window the past, so this
keeps per-user state — (current session number, its running aggregates,
last-seen timestamp) — and emits the updated session row whenever a
micro-batch touches it. State is O(users), not O(events); a production
deployment adds a timeout (GroupStateTimeout) to finalize and drop idle
users' state.

Semantics contract (pinned by tests/test_streaming.py): when events
arrive in timestamp order, the LAST emitted row per (user_id,
session_seq) equals the batch sessionizer's row exactly.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from file_indexer_spark.operators.events import SESSION_GAP_MINUTES

SESSION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("session_seq", T.LongType(), False),
        T.StructField("session_start", T.TimestampType(), True),
        T.StructField("session_end", T.TimestampType(), True),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("total_value", T.DoubleType(), True),
    ]
)

# (session_seq, session_start_us, last_ts_us, n_events, total_value)
SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("session_seq", T.LongType(), False),
        T.StructField("start_us", T.LongType(), False),
        T.StructField("last_us", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("total_value", T.DoubleType(), False),
    ]
)

_GAP_US = SESSION_GAP_MINUTES * 60 * 1_000_000


def _sessionize_group(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        seq, start_us, last_us, n_events, total_value = state.get
    else:
        seq, start_us, last_us, n_events, total_value = 0, 0, None, 0, 0.0

    touched: dict[int, Any] = {}
    for pdf in batches:
        pdf = pdf.sort_values(["ts", "event_id"])
        for ts, value in zip(pdf["ts"], pdf["value"]):
            ts_us = int(ts.value // 1_000)  # pandas ns -> us
            if last_us is None or ts_us - last_us > _GAP_US:
                seq += 1
                start_us = ts_us
                n_events = 0
                total_value = 0.0
            last_us = ts_us
            n_events += 1
            total_value += float(value)
            touched[seq] = (start_us, last_us, n_events, total_value)

    state.update((seq, start_us, last_us if last_us is not None else 0, n_events, total_value))
    if touched:
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(touched),
                "session_seq": list(touched),
                "session_start": [pd.Timestamp(v[0], unit="us") for v in touched.values()],
                "session_end": [pd.Timestamp(v[1], unit="us") for v in touched.values()],
                "n_events": [v[2] for v in touched.values()],
                "total_value": [round(v[3], 4) for v in touched.values()],
            }
        )


def sessionize_stream(events: DataFrame) -> DataFrame:
    """Streaming sessionization: one state row per user, updated rows
    emitted per micro-batch (output mode ``update``)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _sessionize_group,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def session_window_sessions(
    events: DataFrame,
    gap: str | None = None,
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """Native ``F.session_window`` sessionization — ONE definition that
    runs both as a batch aggregation and as a stateful streaming query
    (watermarked; state = open sessions only, merged/closed by the
    engine as the watermark advances — the built-in alternative to the
    ``applyInPandasWithState`` sessionizer above, with the split rule
    the native API defines: a new session starts when the gap to the
    previous event is >= ``gap``, vs the strict > of ``ev.sessionize``).

    No COUNT(DISTINCT): streaming aggregations reject exact distincts
    (unbounded per-group state); e1 keeps that column on the batch
    path, st6 shows the sketch alternative.
    """
    from pyspark.sql import functions as F

    from file_indexer_spark.operators.events import SESSION_GAP_MINUTES

    # default derives from the SAME constant every other sessionizer
    # (e1/e1b/st3) and the e14/st8 oracle use — changing it moves all
    # of them together
    gap = gap or f"{SESSION_GAP_MINUTES} minutes"
    src = events.withWatermark("ts", watermark_delay) if events.isStreaming else events
    return (
        src.groupBy("user_id", F.session_window("ts", gap).alias("sw"))
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select("user_id", "session_start", "session_end", "n_events", "total_value")
    )


# ---------------------------------------------------------------- st14
# Streaming rendition of e17 (operators/events.py debounce_events):
# per-(user, type) burst collapse with O(keys) state. The update-mode
# changelog re-emits a burst row whenever a micro-batch extends it;
# the final state (last emission per burst) equals the batch operator,
# which is what the gate hash-checks against e17's own oracle.
from file_indexer_spark.operators.events import DEBOUNCE_GAP_S  # noqa: E402

_DEBOUNCE_GAP_US = DEBOUNCE_GAP_S * 1_000_000

DEBOUNCE_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("burst_seq", T.LongType(), False),
        T.StructField("kept_event_id", T.LongType(), False),
        T.StructField("kept_ts", T.TimestampType(), True),
        T.StructField("n_suppressed", T.LongType(), False),
        T.StructField("span_us", T.LongType(), False),
    ]
)

# (burst_seq, kept_event_id, kept_us, last_us, n_events)
DEBOUNCE_STATE_SCHEMA = T.StructType(
    [
        T.StructField("burst_seq", T.LongType(), False),
        T.StructField("kept_event_id", T.LongType(), False),
        T.StructField("kept_us", T.LongType(), False),
        T.StructField("last_us", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
    ]
)


def _debounce_group(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    user_id, event_type = key
    if state.exists:
        seq, kept_id, kept_us, last_us, n_events = state.get
    else:
        seq, kept_id, kept_us, last_us, n_events = 0, 0, 0, None, 0

    touched: dict[int, Any] = {}
    for pdf in batches:
        # (ts, event_id) order = the batch operator's tie-break; ties
        # never span micro-batches under the chronological-halves
        # arrival contract (events are in order w.r.t. the split key)
        pdf = pdf.sort_values(["ts", "event_id"])
        for ts, eid in zip(pdf["ts"], pdf["event_id"]):
            us = int(ts.value // 1_000)  # pandas ns -> us
            if last_us is None or us - last_us > _DEBOUNCE_GAP_US:
                seq += 1
                kept_id = int(eid)
                kept_us = us
                n_events = 0
            last_us = us
            n_events += 1
            touched[seq] = (kept_id, kept_us, n_events, last_us - kept_us)
    state.update(
        (seq, kept_id, kept_us, last_us if last_us is not None else 0, n_events)
    )
    if touched:
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(touched),
                "event_type": [event_type] * len(touched),
                "burst_seq": list(touched),
                "kept_event_id": [v[0] for v in touched.values()],
                "kept_ts": [pd.Timestamp(v[1], unit="us") for v in touched.values()],
                "n_suppressed": [v[2] - 1 for v in touched.values()],
                "span_us": [v[3] for v in touched.values()],
            }
        )


def debounce_stream(events: DataFrame) -> DataFrame:
    """st14: continuous per-(user, type) burst collapse — e17 with
    O(keys) state instead of whole-history windows. A burst spanning
    micro-batches keeps its FIRST batch's kept event and extends its
    span/suppression counts (the case greedy per-batch dedup gets
    wrong); output mode ``update`` re-emits the amended burst row."""
    return events.groupBy("user_id", "event_type").applyInPandasWithState(
        _debounce_group,
        outputStructType=DEBOUNCE_OUTPUT_SCHEMA,
        stateStructType=DEBOUNCE_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------- st15
# Streaming rendition of e18 (operators/events.py deadline_funnel):
# per-user greedy funnel matching with O(users) state. Events are
# processed in event-time order (the chronological arrival contract +
# an in-batch sort), so the greedy first-qualifying match is identical
# to the batch operator's array_min-over-window form; the update-mode
# changelog re-emits a user's stage row whenever a micro-batch
# advances it, and the final state equals batch e18 — which is what
# the gate hash-checks against e18's own DuckDB oracle.
from file_indexer_spark.operators.events import (  # noqa: E402
    CLICK_WITHIN_MIN,
    PURCHASE_WITHIN_MIN,
)

_CLICK_WITHIN_US = CLICK_WITHIN_MIN * 60 * 1_000_000
_PURCHASE_WITHIN_US = PURCHASE_WITHIN_MIN * 60 * 1_000_000

FUNNEL_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("t_view", T.TimestampType(), True),
        T.StructField("t_click", T.TimestampType(), True),
        T.StructField("t_purchase", T.TimestampType(), True),
    ]
)

# (t_view_us, t_click_us, t_purchase_us, t_hwm_us) — all nullable.
# t_hwm_us is the per-user high-water mark of consumed event time: the
# funnel transitions are only equal to batch e18 under the
# chronological-arrival contract (each micro-batch's events for a user
# are no older than everything already consumed), so the operator
# ENFORCES that contract — a batch whose earliest event precedes the
# stored high-water mark raises instead of silently diverging.
FUNNEL_STATE_SCHEMA = T.StructType(
    [
        T.StructField("t_view_us", T.LongType(), True),
        T.StructField("t_click_us", T.LongType(), True),
        T.StructField("t_purchase_us", T.LongType(), True),
        T.StructField("t_hwm_us", T.LongType(), True),
    ]
)


def _funnel_group(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        tv, tc, tp, hwm = state.get
    else:
        tv = tc = tp = hwm = None

    saw_rows = False
    # Concatenate the group's Arrow chunks and sort ONCE — Spark gives
    # no intra-batch row-order guarantee, so the fold must not depend
    # on arrival order within a micro-batch.  The (ts, event_id)
    # tie-break matches the batch operator: an equal-ts purchase with
    # a smaller event_id than the click lands BEFORE t_click is set
    # and is skipped — the batch form excludes it too (strict
    # p > t_click).
    chunks = list(batches)
    pdf = (
        pd.concat(chunks, ignore_index=True) if len(chunks) > 1
        else (chunks[0] if chunks else None)
    )
    if pdf is not None and len(pdf):
        pdf = pdf.sort_values(["ts", "event_id"])
        saw_rows = True
        # The chronological contract is CROSS-batch only: the batch's
        # earliest event must not precede the hwm consumed by PRIOR
        # micro-batches.  (Checking per row would spuriously reject a
        # wholly-newer but internally-unsorted batch — ADVICE r10.)
        first_us = int(pdf["ts"].iloc[0].value // 1_000)
        if hwm is not None and first_us < hwm:
            raise ValueError(
                "st15: chronological-arrival contract violated for "
                f"user {user_id}: event at {first_us}us arrived after "
                f"the consumed high-water mark {hwm}us; feed this "
                "operator a per-user time-ordered source or use batch "
                "e18"
            )
        last_us = int(pdf["ts"].iloc[-1].value // 1_000)
        hwm = last_us if hwm is None else max(hwm, last_us)
        for ts, et in zip(pdf["ts"], pdf["event_type"]):
            us = int(ts.value // 1_000)
            if et == "view":
                if tv is None:
                    tv = us
            elif et == "click":
                if (
                    tc is None
                    and tv is not None
                    and us > tv
                    and us <= tv + _CLICK_WITHIN_US
                ):
                    tc = us
            elif et == "purchase":
                if (
                    tp is None
                    and tc is not None
                    and us > tc
                    and us <= tc + _PURCHASE_WITHIN_US
                ):
                    tp = us
    state.update((tv, tc, tp, hwm))
    if saw_rows:
        def _ts(us):
            return pd.Timestamp(us, unit="us") if us is not None else pd.NaT

        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "t_view": [_ts(tv)],
                "t_click": [_ts(tc)],
                "t_purchase": [_ts(tp)],
            }
        )


def funnel_stream(events: DataFrame) -> DataFrame:
    """st15: continuous per-user deadline-funnel matching — e18 with
    O(users) state instead of whole-history collect_list aggregates.
    A stage whose deadline-qualifying event arrives in a LATER
    micro-batch than its anchor still matches (the case per-batch
    funnel computation gets wrong); output mode ``update`` re-emits
    the user's amended stage row.

    Equality with batch e18 holds under the chronological-arrival
    contract, which the state handler now ENFORCES via a per-user
    consumed-time high-water mark (``t_hwm_us``): an event arriving in
    a later micro-batch with an earlier timestamp than anything
    already consumed raises, rather than being silently ignored."""
    return events.groupBy("user_id").applyInPandasWithState(
        _funnel_group,
        outputStructType=FUNNEL_OUTPUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
