"""Continuous index maintenance: a stream of scan batches MERGEd into
the ``files`` table via foreachBatch.

The batch engine's ``update_index`` (reference D1) is the moral
equivalent of change-data capture: re-run it and unchanged files are
skipped by the mtime+size check. This module makes that continuous —
scan snapshots land as files in a directory, Structured Streaming turns
each into a micro-batch, and ``foreachBatch`` applies the exact same
merge (so batch and streaming semantics cannot drift; reference
SURVEY.md §2.9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from file_indexer_spark.indexer.files_table import FilesTable
from file_indexer_spark.indexer.two_phase import update_index

SCAN_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType(), True),
        T.StructField("filename", T.StringType(), True),
        T.StructField("modification_datetime", T.TimestampType(), True),
        T.StructField("file_size", T.LongType(), True),
    ]
)


def read_scan_stream(
    spark: SparkSession, source_dir: str, max_files_per_trigger: int | None = 1
) -> DataFrame:
    reader = spark.readStream.format("parquet").schema(SCAN_STREAM_SCHEMA)
    if max_files_per_trigger:
        # one scan snapshot per micro-batch: a batch must not contain two
        # versions of the same (path, filename) or the merge sees a
        # duplicate PK
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(source_dir)


def stream_index(
    spark: SparkSession,
    scan_stream: DataFrame,
    table: FilesTable,
    checkpoint_dir: str,
    **index_kwargs,
):
    """MERGE each micro-batch of scanned file metadata into ``table``.

    foreachBatch hands us a plain batch DataFrame, so the incremental
    merge is literally ``update_index`` with ``scanned=`` injected —
    identical change detection, checksum eligibility and reuse counting.
    Runs with availableNow (drain-and-stop); pass a processingTime
    trigger for a long-lived indexer.
    """

    def merge_batch(batch: DataFrame, _batch_id: int) -> None:
        if batch.isEmpty():
            return
        # a micro-batch may span several scan snapshots and thus carry
        # two versions of one (path, filename); keep only the newest —
        # the merge's anti-join would otherwise insert BOTH rows and
        # permanently duplicate the primary key
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        w = Window.partitionBy("path", "filename").orderBy(
            F.desc("modification_datetime"), F.desc("file_size")
        )
        latest = (
            batch.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        update_index(spark, table, root="<stream>", scanned=latest, **index_kwargs)

    query = (
        scan_stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return query
