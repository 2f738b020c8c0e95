"""file_indexer_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of ``krzysbaranski/file-indexer``.

The reference (/root/reference) is a file-metadata indexing + deduplication
system over embedded DuckDB. This engine re-expresses its data model
(one ``files`` fact table), its ~25 query shapes (search, duplicate
detection, stats/histograms/timelines), and its procedural dataflow
(scan → two-phase checksum → merge → cleanup) as idiomatic Spark
DataFrame programs designed for 100 TB scale, and extends it with
LLM-training-data pipeline operators (near-dup detection, similarity
search, text analysis, multimodal plumbing).

Layout:
    session.py    SparkSession factory tuned for the workload
    tables.py     test-table catalog + canonical ``files`` derivation
    operators/    query operators (search, duplicates, stats, dedup,
                  similarity, text, events)
    functions/    reusable column expressions (extension parse, size
                  bands, shingles, vector math)
    indexer/      the write path: filesystem scan, two-phase checksum,
                  upsert/merge, cleanup (anti-join deletion detection)
    streaming/    structured-streaming incremental indexing
    plans/        plan-inspection helpers (pushdown / join assertions)
"""

__version__ = "0.1.0"
