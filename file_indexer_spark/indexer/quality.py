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
