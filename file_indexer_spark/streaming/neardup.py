"""Streaming NEAR-dup dedup at ingestion (st13) — the production shape
the whole incremental family points at.

st4/st7 dedup a document stream by EXACT content hash (Spark's
``dropDuplicates`` state store); near-dup detection needs shingle
signatures and an LSH index, which no built-in stateful operator
maintains. The scalable composition is the one a 100 TB ingest
pipeline actually runs, and it is exactly the two batch maintenance
operators this repo already gates, driven from ``foreachBatch``:

  * the STATE is the materialized corpus LSH index
    (:func:`~file_indexer_spark.operators.dedup.lsh_index_tables`:
    the narrow (doc_id, band, digest) band table + the (doc_id,
    shingles) verification sets) plus the dd7 cluster ASSIGNMENT —
    all parquet, append-only for the index, versioned per batch for
    the assignment;
  * each micro-batch PROBES the stored band index (dd12,
    ``incremental_lsh_pairs`` — O(batch x matched buckets), never
    O(corpus)), REFRESHES only the touched clusters (dd13,
    ``incremental_cluster_refresh``), appends its own signature rows
    to the index, and logs its at-ingestion keep/drop decisions;
  * a document is DROPPED at ingestion when it lands non-canonical in
    the refreshed assignment (its cluster label — always a smaller,
    i.e. earlier, doc_id under chronological ingest — is the copy the
    corpus keeps).

Exactness: dd12's probe emits exactly the full-corpus dd3 pairs with
>= 1 side in the batch, and dd13's refresh provably equals dd7
recomputed from scratch after each batch (see their docstrings), so by
induction over micro-batches the final stored assignment equals dd7 on
the whole ingested corpus — the registry gate runs a 3-arrival stream
and hash-checks the final state against dd7's own DuckDB oracle,
verbatim. Note this is strictly STRONGER than greedy drop-on-arrival
(which no oracle could pin): when a later arrival merges two clusters
that were distinct at ingestion time, the refresh re-labels the loser's
members — the decision LOG keeps the at-ingestion verdicts, the
assignment table keeps the corpus truth.

State at scale: the band index is O(corpus x bands) narrow rows
(append-only parquet, bucketed by (band, digest) on a real lake so the
probe join is co-located); the assignment is O(corpus) narrow rows,
rewritten per batch only in its touched-cluster slice plus an anti-join
passthrough — at 100 TB the passthrough copy is the next thing to
replace with a MERGE-capable table format (the FilesTable manifest
pattern), which changes the write, not the algebra.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from file_indexer_spark.operators import dedup as dd

DOCS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
    ]
)


def read_docs_stream(
    spark: SparkSession, src: str, max_files_per_trigger: int = 1
) -> DataFrame:
    return (
        spark.readStream.format("parquet")
        .schema(DOCS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(src)
    )


def _assign_versions(state_dir: str) -> list[int]:
    root = os.path.join(state_dir, "assign")
    if not os.path.isdir(root):
        return []
    return sorted(
        int(n[1:]) for n in os.listdir(root) if n.startswith("v") and n[1:].isdigit()
    )


def _assign_path(state_dir: str, version: int) -> str:
    return os.path.join(state_dir, "assign", f"v{version}")


def ingest_batch(
    spark: SparkSession, batch: DataFrame, state_dir: str, version: int
) -> None:
    """Fold ONE document micro-batch into the near-dup state at
    ``state_dir``: probe (dd12) → refresh (dd13) → append signatures →
    log decisions. First batch bootstraps the state with the batch
    dd3 → dd7 pipeline. Idempotent per version: a replayed micro-batch
    (foreachBatch's at-least-once contract) that finds its own
    assignment version already present is skipped."""
    versions = _assign_versions(state_dir)
    # monotone replay guard: foreachBatch batch ids strictly increase,
    # so any committed version >= this one means this batch already
    # folded (robust to later maintenance dropping old version dirs)
    if versions and version <= versions[-1]:
        return  # replayed micro-batch: state already folded
    bands_path = os.path.join(state_dir, "bands")
    sets_path = os.path.join(state_dir, "shingle_sets")
    batch_tables = dd.lsh_index_tables(batch)
    if not versions:
        assign = dd.dedup_clusters(batch, dd.minhash_lsh_pairs(batch))
    else:
        stored = {
            "bands": spark.read.parquet(bands_path),
            "shingle_sets": spark.read.parquet(sets_path),
        }
        old_assign = spark.read.parquet(_assign_path(state_dir, versions[-1]))
        new_pairs = dd.incremental_lsh_pairs(stored, batch)
        assign = dd.incremental_cluster_refresh(old_assign, new_pairs, batch)
    # 1) the refreshed assignment — a fresh version dir (never
    #    overwrite what the refresh is still lazily reading)
    assign.write.mode("overwrite").parquet(_assign_path(state_dir, version))
    # 2) at-ingestion decisions for THIS batch's docs (read back from
    #    the just-written version: no recompute)
    committed = spark.read.parquet(_assign_path(state_dir, version))
    decisions = (
        committed.join(batch.select("doc_id"), "doc_id", "left_semi")
        .select(
            F.lit(version).cast("long").alias("batch_id"),
            "doc_id",
            F.col("is_canonical").alias("accepted"),
            "cluster_id",
        )
    )
    decisions.write.mode("append").parquet(os.path.join(state_dir, "decisions"))
    # 3) append the batch's signature rows to the stored index (only
    #    AFTER the probe consumed the pre-batch index state)
    batch_tables["bands"].write.mode("append").parquet(bands_path)
    batch_tables["shingle_sets"].write.mode("append").parquet(sets_path)


def ingest_neardup_stream(
    spark: SparkSession,
    docs_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
):
    """Run the near-dup ingest over a document stream (availableNow:
    drain-and-stop; pass a processingTime trigger via ``.trigger`` on a
    long-lived pipeline). Each micro-batch runs :func:`ingest_batch`."""

    def fold(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        ingest_batch(spark, batch, state_dir, int(batch_id))

    query = (
        docs_stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return query


def final_assignments(spark: SparkSession, state_dir: str) -> DataFrame:
    """The corpus assignment after the last folded batch — provably
    equal to dd7 recomputed from scratch over everything ingested."""
    versions = _assign_versions(state_dir)
    if not versions:
        raise ValueError(f"no near-dup state at {state_dir}")
    return spark.read.parquet(_assign_path(state_dir, versions[-1]))


def ingest_decisions(spark: SparkSession, state_dir: str) -> DataFrame:
    """The per-batch at-ingestion keep/drop log: (batch_id, doc_id,
    accepted, cluster_id) — what each micro-batch passed downstream.
    ``accepted`` is the verdict AT ingestion time; a later merge can
    demote an accepted doc in the assignment table without rewriting
    history here."""
    return spark.read.parquet(os.path.join(state_dir, "decisions"))
