"""Writer-side constraint enforcement (w19) — the validate-and-
quarantine gate a 100 TB ingest runs in front of every MERGE.

The reference DECLARES its constraints (``files`` DDL: path/filename/
modification_datetime/file_size NOT NULL, PRIMARY KEY (path,
filename) — ``file_indexer/indexer.py:91-101``) and lets embedded
DuckDB reject violating batches transactionally. A distributed writer
cannot afford reject-the-batch semantics: one malformed row in a
billion-row ingest must not fail the job NOR silently vanish. The
Spark-first contract is classify-and-route: every input row lands
EXACTLY ONCE, either in the table or in a quarantine sink with a
reason — the reject-handling pattern constraint-checking writers
(Delta CHECK constraints, DLT expectations) expose.

Classification is one pass, one window:
  * row-level reasons first, covering EVERY declared NOT NULL column
    (``null_key``: a NULL primary-key column; ``null_size`` /
    ``null_mtime``: the other two NOT NULL columns of the DDL —
    NULL ``file_size`` or ``modification_datetime``;
    ``negative_size``: the BIGINT NOT NULL size is semantically
    non-negative);
  * then ``duplicate_key``: among the row-level-CLEAN rows of each
    (path, filename) group, a running count in a deterministic total
    order (file_size, checksum NULLS FIRST, modification_datetime)
    keeps the first and quarantines the rest — the best valid row
    wins, and a bad row can never shadow a clean one.

Scale shape: the row-level reasons are map-side expressions; the
duplicate rule is ONE hash-partitioned window on the PK (the same
key the MERGE itself shuffles on, so a co-partitioned writer reuses
the exchange); the quarantine branch is a filter, not a second scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

REASON_NULL_KEY = "null_key"
REASON_NULL_SIZE = "null_size"
REASON_NULL_MTIME = "null_mtime"
REASON_NEGATIVE_SIZE = "negative_size"
REASON_DUPLICATE_KEY = "duplicate_key"


def classify_files(df: DataFrame) -> DataFrame:
    """Append a ``reason`` column: NULL = accepted, else one of
    null_key / null_size / null_mtime / negative_size / duplicate_key
    (priority in that order — every NOT NULL column the reference DDL
    declares gets its own arm; a bare ``file_size < 0`` predicate is
    NULL for NULL input and would let a NULL size sail through).
    Single pass: one map-side CASE + one PK window."""
    row_reason = (
        F.when(
            F.col("path").isNull() | F.col("filename").isNull(),
            F.lit(REASON_NULL_KEY),
        )
        .when(F.col("file_size").isNull(), F.lit(REASON_NULL_SIZE))
        .when(F.col("modification_datetime").isNull(), F.lit(REASON_NULL_MTIME))
        .when(F.col("file_size") < 0, F.lit(REASON_NEGATIVE_SIZE))
    )
    w = (
        Window.partitionBy("path", "filename")
        .orderBy(
            F.col("file_size").asc(),
            F.col("checksum").asc_nulls_first(),
            F.col("modification_datetime").asc(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    clean_seq = F.sum(
        F.when(row_reason.isNull(), F.lit(1)).otherwise(F.lit(0))
    ).over(w)
    return df.withColumn(
        "reason",
        F.coalesce(
            row_reason,
            F.when(clean_seq > 1, F.lit(REASON_DUPLICATE_KEY)),
        ),
    )


def split_valid(classified: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(accepted rows without the reason column, quarantined rows
    with it) — together a partition of the input, exactly once."""
    accepted = classified.filter(F.col("reason").isNull()).drop("reason")
    quarantined = classified.filter(F.col("reason").isNotNull())
    return accepted, quarantined


def arbitrate_incoming(
    stored: DataFrame, incoming: DataFrame
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """st18's CROSS-BATCH duplicate-key arbitration: a PK may arrive
    clean in two different micro-batches, so within-batch
    classification alone under-enforces the PK constraint.  Among the
    stored row (the earlier batches' winner, if any) and the incoming
    batch's clean rows of each PK, the best row in the SAME
    deterministic total order the batch window uses — (file_size,
    checksum NULLS FIRST, modification_datetime), stored winning full
    ties — is kept; because the order is total and arrival-independent,
    the stream's final state equals the one-shot batch classification
    no matter how the feed is split (which is what lets the gate share
    w19's oracle verbatim).

    Returns ``(winners_new, displaced_stored, losing_new)``:
      * winners_new — incoming rows that won their PK (to upsert; the
        upsert's PK match evicts the displaced stored row from the
        table);
      * displaced_stored — stored rows an incoming row beat (must move
        to quarantine as duplicate_key, or the row-exactly-once
        accounting breaks);
      * losing_new — incoming rows that lost (straight to quarantine).

    ``stored`` should be pre-restricted to the incoming PKs (a semi
    join — at 100 TB the bucketed table prunes this to the touched
    pk_buckets, the same exchange the MERGE itself rides).
    """
    tagged = stored.withColumn("__origin", F.lit(0)).unionByName(
        incoming.withColumn("__origin", F.lit(1))
    )
    w = Window.partitionBy("path", "filename").orderBy(
        F.col("file_size").asc(),
        F.col("checksum").asc_nulls_first(),
        F.col("modification_datetime").asc(),
        F.col("__origin").asc(),
    )
    # localCheckpoint: the three outputs below are filters of this ONE
    # frame, and callers union them back together (the quarantine
    # write). Without the cut, that union contains two structurally
    # identical window subtrees over the same scan, and Spark's
    # exchange reuse conflates them — measured on 4.1: the second
    # leg's rows silently vanish. The cut also executes the window
    # once instead of three times.
    ranked = tagged.withColumn(
        "__rn", F.row_number().over(w)
    ).localCheckpoint(eager=False)
    winners_new = (
        ranked.filter((F.col("__rn") == 1) & (F.col("__origin") == 1))
        .drop("__origin", "__rn")
    )
    displaced_stored = (
        ranked.filter((F.col("__rn") > 1) & (F.col("__origin") == 0))
        .drop("__origin", "__rn")
    )
    losing_new = (
        ranked.filter((F.col("__rn") > 1) & (F.col("__origin") == 1))
        .drop("__origin", "__rn")
    )
    return winners_new, displaced_stored, losing_new
