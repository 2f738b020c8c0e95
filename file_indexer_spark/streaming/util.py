"""Shared streaming test/drain plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame


def run_to_memory_sink(
    stream_df: DataFrame, table_name: str, output_mode: str = "append"
):
    """Drain everything currently available into an in-memory table and
    stop — the deterministic harness every streaming gate uses (ONE
    definition; the per-module helpers delegate here so sink behavior
    can't drift between gates). Returns the finished query."""
    query = (
        stream_df.writeStream.format("memory")
        .queryName(table_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return query
