"""Streaming heavy hitters — e20's Misra-Gries sketch maintained as
BOUNDED streaming state (st17).

The batch operator (``operators.events.heavy_hitters``) folds one MG
summary per scan partition and exact-verifies the merged candidate
superset; the stream keeps the SAME summaries alive across
micro-batches instead:

  * events route to ``N_GROUPS`` salt groups (``user_id % N_GROUPS``)
    — a user's events all land in one group, so the group's MG summary
    sees the user's FULL stream prefix;
  * each group's state is one MG summary of capacity ``cap``, folded
    per trigger with :func:`operators.events.mg_merge` — THE shared
    merge (the ct6/st16 shared-function discipline), so stream and
    batch cannot diverge.  State is O(N_GROUPS x cap) forever;
  * the superset guarantee needs no arrival contract: MG's survival
    bound (true count > n_g/(cap+1) ⇒ the key finishes positive) holds
    under ANY merge order, and a global hitter with count > n/t has
    count > n_g/t within its own group (n_g <= n), so with cap + 1 > t
    it survives its group's summary;
  * every trigger re-emits the group's CURRENT candidate set tagged
    with a monotone ``seq`` (update mode), PLUS one NULL-user sentinel
    row so the trigger's seq is observable even when the summary is
    empty; the drain keeps each group's final seq — candidates evicted
    mid-stream drop out, late recoveries stay in;
  * the exact verify then runs over the landed corpus with
    :func:`operators.events.heavy_hitters_verify` — identical to e20's
    pass 2, so the final result equals the batch two-pass and the gate
    hashes against e20's oracle VERBATIM.

At 100 TB: the sketch rides the ingestion stream with constant state
while the landed event log sits in parquet; the verify is one
candidate-restricted scan per reporting period, never an O(distinct
users) shuffle.

Counter dtype contract: the MG counters stay int64 end to end — the
state arrays are long, :func:`operators.events.mg_merge` merges via an
int64-preserving reindex-union, and the state round-trip below rebuilds
the pandas Series with explicit int64 arrays (never float64), so the
counts are exact at ANY event volume, not merely below 2^53.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from file_indexer_spark.operators.events import HH_CAPACITY, HH_T, mg_merge

N_GROUPS = 8

# user_id is nullable: each trigger emits one NULL-user sentinel row
# alongside the candidates so its seq is observable in the log even
# when the MG summary is empty (otherwise max(seq) would resolve to an
# earlier trigger and resurrect mid-stream-evicted candidates).
HH_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("grp", T.LongType(), False),
        T.StructField("seq", T.LongType(), False),
        T.StructField("user_id", T.LongType(), True),
    ]
)

# (seq, keys, counts): the group's MG summary + the trigger counter.
HH_STATE_SCHEMA = T.StructType(
    [
        T.StructField("seq", T.LongType(), True),
        T.StructField("keys", T.ArrayType(T.LongType()), True),
        T.StructField("counts", T.ArrayType(T.LongType()), True),
    ]
)


def _make_hh_group(cap: int):
    def _hh_group(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (grp,) = key
        if state.exists:
            seq, keys, counts = state.get
            counters = pd.Series(
                np.asarray(counts, dtype="int64"),
                index=np.asarray(keys, dtype="int64"),
            )
        else:
            seq, counters = 0, None
        for pdf in batches:
            counters = mg_merge(counters, pdf["user_id"].value_counts(), cap)
        seq += 1
        if counters is None:
            counters = pd.Series(
                np.array([], dtype="int64"),
                index=np.array([], dtype="int64"),
            )
        state.update(
            (
                seq,
                [int(k) for k in counters.index],
                [int(c) for c in counters],
            )
        )
        # candidates + one NULL-user sentinel: every trigger's seq is
        # observable in the log (pandas nullable Int64 -> Arrow long)
        yield pd.DataFrame(
            {
                "grp": [int(grp)] * (len(counters) + 1),
                "seq": [seq] * (len(counters) + 1),
                "user_id": pd.array(
                    list(counters.index) + [None], dtype="Int64"
                ),
            }
        )

    return _hh_group


def heavy_hitter_candidates_stream(
    events: DataFrame, t: int = HH_T, capacity: int | None = None
) -> DataFrame:
    """st17: the continuously-maintained candidate supersets — one MG
    summary per salt group, re-emitted per trigger (update mode)."""
    cap = capacity if capacity is not None else max(HH_CAPACITY, 2 * t)
    if cap < t:  # the superset guarantee needs cap + 1 > t
        raise ValueError(f"capacity {cap} too small for threshold 1/{t}")
    keyed = events.select(
        (F.col("user_id") % N_GROUPS).alias("grp"), "user_id"
    )
    return keyed.groupBy("grp").applyInPandasWithState(
        _make_hh_group(cap),
        outputStructType=HH_OUTPUT_SCHEMA,
        stateStructType=HH_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def final_candidates(emissions: DataFrame) -> DataFrame:
    """The drained sink's FINAL candidate set: each group's last
    emitted seq (mid-stream evictions drop out, recoveries stay).
    The sentinel rows make every trigger's seq present in the log, so
    max(seq) is always the LAST trigger even when its summary emptied;
    they are dropped here by the NULL filter."""
    from pyspark.sql import Window

    w = Window.partitionBy("grp")
    return (
        emissions.withColumn("max_seq", F.max("seq").over(w))
        .filter(F.col("seq") == F.col("max_seq"))
        .filter(F.col("user_id").isNotNull())
        .select("user_id")
        .distinct()
    )
