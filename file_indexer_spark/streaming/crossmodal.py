"""Streaming cross-modal fingerprint ingestion (x4) — the streaming
rendition of the x1/x2/x3 family, closing the symmetry: every
incremental family now has probe/refresh (dd12/dd13, sim12), a batch
append gate (x3), AND a foreachBatch ingest (st13 dedup, sim13 ANN,
x4 cross-modal).

A multimodal corpus is ingested, not decoded once: each arriving batch
carries documents plus their derived media blobs, and the stored
fingerprint STATE — one narrow member table per modality + the text
LSH index — must fold the batch in without ever re-decoding or
re-signing the base corpus:

  * media members (image aHash / audio envelope / whole-video
    fingerprint rows) are PER-ROW PURE: the batch's rows come from the
    batch's blobs alone and are appended;
  * the text members carry corpus-global dd7 cluster labels, so the
    batch probes the stored band index (dd12) and refreshes only the
    touched clusters (dd13) into a fresh version — the
    :func:`~file_indexer_spark.operators.crossmodal.fingerprint_state_append`
    algebra, driven per micro-batch;
  * the duplicate-asset REPORT
    (:func:`~file_indexer_spark.operators.crossmodal.duplicate_assets_from_tables`)
    reads the stored narrow tables and answers mid-ingest — no blob is
    ever touched at report time (x2's property, preserved under
    streaming ingest).

Physical layout: EVERY write is a per-version parquet dir
(``<table>/v{batch}``, mode=overwrite) — a foreachBatch replay
(at-least-once delivery) rewrites its own version dirs byte-for-byte
instead of duplicating rows, and a crash mid-fold re-folds cleanly on
restart whatever subset of dirs had committed. Append-only tables
(media members, LSH index) are read as the union of all committed
versions; the text member table is a full rewrite per batch (labels
can change on merge — the dd13 shape), so only its LATEST version is
read.

Exactness: dd12/dd13's induction argument (see st13) plus per-row-pure
media branches give final state == fingerprint_state recomputed over
everything ingested — the x4 registry gate drains a 3-arrival stream
and hash-checks the final report against x1's full-corpus oracle
VERBATIM.

State at scale: member tables are O(assets) narrow rows; the LSH index
is O(corpus × bands); the per-batch text rewrite's passthrough copy is
the same MERGE-table candidate st13 documents. Version-dir unions are
a manifest concern at 100 TB (compact small versions periodically —
the FilesTable compaction pattern); the algebra is unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from file_indexer_spark.operators import crossmodal as xm
from file_indexer_spark.operators import dedup as dd

DOCS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

# append-only member/index tables: read = union of ALL committed
# versions; text_members is versioned-rewrite: read = LATEST version
_APPEND_TABLES = (
    "image_members",
    "audio_members",
    "video_members",
    "lsh_bands",
    "lsh_shingle_sets",
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


def _committed(state_dir: str, table: str, prefix: str) -> list[int]:
    root = os.path.join(state_dir, table)
    if not os.path.isdir(root):
        return []
    plen = len(prefix)
    return sorted(
        int(n[plen:])
        for n in os.listdir(root)
        if n.startswith(prefix)
        and n[plen:].isdigit()
        and os.path.exists(os.path.join(root, n, "_SUCCESS"))
    )


def _versions(state_dir: str, table: str) -> list[int]:
    return _committed(state_dir, table, "v")


def _compacted_through(state_dir: str, table: str) -> int:
    cs = _committed(state_dir, table, "c")
    return cs[-1] if cs else -1


def _vpath(state_dir: str, table: str, version: int) -> str:
    return os.path.join(state_dir, table, f"v{version}")


def _live_paths(state_dir: str, table: str) -> list[str]:
    """Consistent read set for an append-only table: the newest
    compacted dir (``c{m}`` = versions <= m folded into one) plus every
    committed version above it — sim13's codes protocol."""
    m = _compacted_through(state_dir, table)
    paths = [os.path.join(state_dir, table, f"c{m}")] if m >= 0 else []
    paths += [
        _vpath(state_dir, table, v) for v in _versions(state_dir, table) if v > m
    ]
    return paths


def _read_all(spark: SparkSession, state_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(*_live_paths(state_dir, table))


def compact_state(spark: SparkSession, state_dir: str) -> int:
    """Small-files maintenance for a long-running cross-modal ingest:
    fold each append-only table's live dirs into one compacted dir and
    VACUUM the text member table down to its latest version (older
    text versions are superseded snapshots, retained until now only as
    crash-recovery slack). Serving stays consistent throughout — a
    compaction dir only counts once its _SUCCESS lands and supersedes
    everything at or below its watermark. Returns the new watermark."""
    import shutil

    new_m = -1
    for table in _APPEND_TABLES:
        old_m = _compacted_through(state_dir, table)
        versions = [v for v in _versions(state_dir, table) if v > old_m]
        if not versions:
            new_m = max(new_m, old_m)
            continue
        m = versions[-1]
        new_m = max(new_m, m)
        live = _live_paths(state_dir, table)
        spark.read.parquet(*live).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(state_dir, table, f"c{m}")
        )
        for v in versions:
            shutil.rmtree(_vpath(state_dir, table, v), ignore_errors=True)
        if old_m >= 0:
            shutil.rmtree(
                os.path.join(state_dir, table, f"c{old_m}"), ignore_errors=True
            )
    text_versions = _versions(state_dir, "text_members")
    for v in text_versions[:-1]:
        shutil.rmtree(_vpath(state_dir, "text_members", v), ignore_errors=True)
    return new_m


def ingest_batch(
    spark: SparkSession, batch: DataFrame, state_dir: str, version: int
) -> None:
    """Fold ONE document/media micro-batch into the fingerprint state:
    decode the batch's own blobs into per-modality member rows (pure,
    appended as this batch's version dirs), probe + refresh the text
    clusters through the stored LSH index (dd12 → dd13, consuming only
    versions < this one), and land the batch's own index rows.
    Idempotent per version: the text rewrite commits LAST, so a
    replayed micro-batch whose text version exists is a no-op and a
    crashed fold re-runs cleanly."""
    text_versions = _versions(state_dir, "text_members")
    # monotone replay guard: foreachBatch batch ids strictly increase,
    # so any committed version >= this one means this batch already
    # folded (robust to a later vacuum having dropped the old dir)
    if text_versions and version <= text_versions[-1]:
        return  # replayed micro-batch: already folded
    # media member rows: the batch's blobs only, one version dir each
    xm._image_members(batch).write.mode("overwrite").parquet(
        _vpath(state_dir, "image_members", version)
    )
    xm._audio_members(batch).write.mode("overwrite").parquet(
        _vpath(state_dir, "audio_members", version)
    )
    xm._video_members(batch).write.mode("overwrite").parquet(
        _vpath(state_dir, "video_members", version)
    )
    # text: refresh through the PRE-batch index state (live paths minus
    # this batch's own dir — present only after a crashed half-fold,
    # and then dd12's re-delivery anti-join drops its rows anyway)
    own = _vpath(state_dir, "lsh_bands", version)
    own_sets = _vpath(state_dir, "lsh_shingle_sets", version)
    prior = [p for p in _live_paths(state_dir, "lsh_bands") if p != own]
    prior_sets = [
        p for p in _live_paths(state_dir, "lsh_shingle_sets") if p != own_sets
    ]
    if not prior or not text_versions:
        assign = dd.dedup_clusters(batch, dd.minhash_lsh_pairs(batch))
        text = assign.join(batch.select("doc_id", "n_chars"), "doc_id")
    else:
        index = {
            "bands": spark.read.parquet(*prior),
            "shingle_sets": spark.read.parquet(*prior_sets),
        }
        old_text = spark.read.parquet(
            _vpath(state_dir, "text_members", text_versions[-1])
        )
        pairs = dd.incremental_lsh_pairs(index, batch)
        refreshed = dd.incremental_cluster_refresh(
            old_text.select("doc_id", "cluster_id"), pairs, batch
        )
        chars = old_text.select("doc_id", "n_chars").unionByName(
            batch.select("doc_id", "n_chars")
        )
        text = refreshed.join(chars, "doc_id")
    batch_lsh = dd.lsh_index_tables(batch)
    batch_lsh["bands"].write.mode("overwrite").parquet(
        _vpath(state_dir, "lsh_bands", version)
    )
    batch_lsh["shingle_sets"].write.mode("overwrite").parquet(
        _vpath(state_dir, "lsh_shingle_sets", version)
    )
    # the commit marker: text_members/v{version} lands last
    text.write.mode("overwrite").parquet(
        _vpath(state_dir, "text_members", version)
    )


def ingest_crossmodal_stream(
    spark: SparkSession,
    docs_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
):
    """Run the cross-modal ingest over a document stream (availableNow:
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


def stored_member_tables(
    spark: SparkSession, state_dir: str
) -> dict[str, DataFrame]:
    """The report-ready member tables from the streamed-in state: every
    committed version of the per-row-pure media tables, the LATEST text
    version."""
    text_versions = _versions(state_dir, "text_members")
    if not text_versions:
        raise ValueError(f"no cross-modal state at {state_dir}")
    return {
        "text_members": spark.read.parquet(
            _vpath(state_dir, "text_members", text_versions[-1])
        ),
        "image_members": _read_all(spark, state_dir, "image_members"),
        "audio_members": _read_all(spark, state_dir, "audio_members"),
        "video_members": _read_all(spark, state_dir, "video_members"),
    }


def duplicate_assets_report(
    spark: SparkSession, state_dir: str, min_group_size: int = 2
) -> DataFrame:
    """x1's cross-modal duplicate-asset report over the streamed-in
    state — valid mid-ingest and after drain; never touches a blob."""
    return xm.duplicate_assets_from_tables(
        stored_member_tables(spark, state_dir), min_group_size
    )
