"""Structured Streaming: windowed aggregation agrees with the batch
operator; foreachBatch incremental indexing matches a batch update_index."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from file_indexer_spark.indexer.files_table import FilesTable
from file_indexer_spark.streaming import incremental as inc
from file_indexer_spark.streaming import windows as sw
from file_indexer_spark.tables import events_df


@pytest.fixture()
def events_dir(spark, sf_smoke, tmp_path):
    """Events written as two parquet 'arrivals' (two micro-batches)."""
    src = str(tmp_path / "events_src")
    ev = events_df(spark, sf_smoke)
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.mode("append").parquet(src)
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.mode("append").parquet(src)
    return src


def test_windowed_counts_matches_batch(spark, sf_smoke, events_dir):
    stream = sw.read_events_stream(spark, events_dir)
    assert stream.isStreaming
    sw.run_to_memory_sink(sw.windowed_counts(stream), "win_counts")
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    batch = sw.windowed_counts(events_df(spark, sf_smoke))
    want = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in batch.collect()
    }
    assert got == want
    assert len(want) > 0


def test_stream_index_matches_batch_merge(spark, tmp_path):
    scans = str(tmp_path / "scans")
    os.makedirs(scans)
    rows1 = [("/a", "f1", "2024-01-01 00:00:00", 10), ("/a", "f2", "2024-01-01 00:00:00", 20)]
    rows2 = [
        ("/a", "f2", "2024-02-01 00:00:00", 25),  # changed
        ("/b", "f3", "2024-01-15 00:00:00", 30),  # new
    ]
    mk = lambda rows: spark.createDataFrame(
        [(p, f, m, s) for p, f, m, s in rows], "path string, filename string, mtime string, file_size long"
    ).select(
        "path", "filename", F.col("mtime").cast("timestamp").alias("modification_datetime"), "file_size"
    )
    mk(rows1).coalesce(1).write.mode("append").parquet(scans)
    mk(rows2).coalesce(1).write.mode("append").parquet(scans)

    table = FilesTable(spark, str(tmp_path / "files_tbl"))
    inc.stream_index(
        spark,
        inc.read_scan_stream(spark, scans),
        table,
        checkpoint_dir=str(tmp_path / "ckpt"),
        max_checksum_size=-1,  # metadata-only: scanned paths don't exist on disk
    )
    got = {(r["path"], r["filename"]): r["file_size"] for r in table.read().collect()}
    assert got == {("/a", "f1"): 10, ("/a", "f2"): 25, ("/b", "f3"): 30}


def test_stateful_sessionization_matches_batch(spark, sf_smoke, tmp_path):
    """applyInPandasWithState sessionizer: last emitted row per session
    equals the batch gaps-and-islands sessionizer."""
    from file_indexer_spark.operators import events as ev
    from file_indexer_spark.streaming import sessions as ss

    src = str(tmp_path / "events_chrono")
    all_events = events_df(spark, sf_smoke)
    median = all_events.approxQuantile("event_id", [0.5], 0.0)[0]
    # two chronological arrivals (event_id order == ts order in testdata)
    all_events.filter(F.col("event_id") <= median).coalesce(1).write.mode("append").parquet(src)
    all_events.filter(F.col("event_id") > median).coalesce(1).write.mode("append").parquet(src)

    stream = sw.read_events_stream(spark, src, max_files_per_trigger=1)
    out = ss.sessionize_stream(stream)
    query = (
        out.writeStream.format("memory")
        .queryName("stateful_sessions")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()

    emitted = spark.sql("SELECT * FROM stateful_sessions").collect()
    # a session may be emitted in several batches; n_events only grows,
    # so the max-n_events row per key is the final state
    final = {}
    for r in emitted:
        key = (r["user_id"], r["session_seq"])
        if key not in final or r["n_events"] > final[key]["n_events"]:
            final[key] = r
    got = {
        k: (v["session_start"], v["session_end"], v["n_events"], v["total_value"])
        for k, v in final.items()
    }
    want = {
        (r["user_id"], r["session_seq"]): (
            r["session_start"], r["session_end"], r["n_events"], r["total_value"],
        )
        for r in ev.sessionize(all_events).collect()
    }
    assert got == want
