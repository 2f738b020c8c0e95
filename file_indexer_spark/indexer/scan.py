"""Distributed filesystem scan (reference S1-S4, D6/D7 accounting).

The reference walks the tree with a single-process generator
(file_indexer/indexer.py:184-220) and stats files in batches of 1000
(:281-289). Here BOTH stages are distributed: directory discovery is an
iterative BFS of DataFrame expansions (each level's subdirectory listing
runs on executors; the driver never holds the directory list), and the
stat stage is an Arrow-batched mapInPandas over the directory frame.

Filter semantics (reference _should_process_file, indexer.py:112-156):
skip symlinks and non-regular files; empty files are INDEXED but not
checksummed (that's checksum eligibility, not scan filtering). Skips
and errors are not silently dropped: every entry carries a ``kind``
(file / symlink / special / error) so the counters the reference keeps
in-memory (indexer.py:79-87, 343-351) fall out of one aggregation.

For 100 TB / billions of files the same shape holds: parallelize the
directory list (or a manifest of prefixes for object stores), let each
task list+stat its slice, and never materialize file entries on the
driver.
"""

from __future__ import annotations

import os
from collections.abc import Iterator
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SCAN_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType(), False),
        T.StructField("filename", T.StringType(), False),
        T.StructField("modification_datetime", T.TimestampType(), False),
        T.StructField("file_size", T.LongType(), False),
    ]
)

# raw scan rows: regular files plus skip/error records (D6/D7)
RAW_SCAN_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType(), False),
        T.StructField("filename", T.StringType(), True),
        T.StructField("modification_datetime", T.TimestampType(), True),
        T.StructField("file_size", T.LongType(), True),
        T.StructField("kind", T.StringType(), False),
    ]
)

KIND_FILE = "file"
KIND_SYMLINK = "symlink"
KIND_SPECIAL = "special"
KIND_ERROR = "error"


MAX_TREE_DEPTH = 256  # runaway-symlink/cycle backstop


def _list_subdirs(dirs: "pd.DataFrame"):
    """One BFS expansion step, executor-side: dir → immediate child
    dirs (symlinked dirs are not descended, matching the reference)."""
    out = []
    for d in dirs["dir"]:
        try:
            with os.scandir(d) as entries:
                for e in entries:
                    try:
                        if e.is_dir(follow_symlinks=False) and not e.is_symlink():
                            out.append(e.path)
                    except OSError:
                        continue
        except OSError:
            continue
    return out


def _dirs_df(spark: SparkSession, root: str, recursive: bool) -> DataFrame:
    """Distributed directory discovery: iterative BFS where each level
    is a mapInPandas expansion of the previous level's DataFrame. The
    driver never materializes the directory list — it only checks each
    level's count — so billions of files / millions of directories cost
    O(depth) small jobs, not driver memory. (Replaces the round-1
    driver-side os.walk; the same shape works against an object-store
    prefix manifest.)"""
    import pandas as pd  # noqa: F401  (executor-side type only)

    root = os.path.abspath(root)
    level = spark.createDataFrame([(root,)], "dir string")
    if not recursive:
        return level
    levels = [level]
    width = max(2, spark.sparkContext.defaultParallelism)

    def expand(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame({"dir": _list_subdirs(pdf)})

    for _ in range(MAX_TREE_DEPTH):
        # repartition each level: mapInPandas is a narrow transform, so
        # without the shuffle the whole BFS would stay in the seed's
        # single partition and each level's listing would run serially.
        # localCheckpoint (not cache) so the materialized level is GC'd
        # with the DataFrame instead of pinning executor storage.
        level = (
            level.repartition(width)
            .mapInPandas(expand, schema="dir string")
            .localCheckpoint(eager=False)
        )
        if level.isEmpty():
            break
        levels.append(level)
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out


def _stat_entries(dirs: Iterator[str]):
    """Executor task: stat every entry in each directory, tagging skips
    and errors instead of dropping them (reference indexer.py:343-351
    counts permission errors; :112-156 skips symlinks/special files)."""
    for d in dirs:
        try:
            entries = os.scandir(d)
        except OSError:
            yield (d, None, None, None, KIND_ERROR)
            continue
        with entries:
            for entry in entries:
                try:
                    if entry.is_symlink():
                        yield (d, entry.name, None, None, KIND_SYMLINK)
                        continue
                    if entry.is_dir(follow_symlinks=False):
                        continue  # recursion is the dir list's job
                    if not entry.is_file(follow_symlinks=False):
                        yield (d, entry.name, None, None, KIND_SPECIAL)
                        continue
                    st = entry.stat(follow_symlinks=False)
                except OSError:
                    yield (d, entry.name, None, None, KIND_ERROR)
                    continue
                yield (
                    d,
                    entry.name,
                    datetime.fromtimestamp(st.st_mtime, tz=timezone.utc).replace(tzinfo=None),
                    int(st.st_size),
                    KIND_FILE,
                )


def scan_raw(
    spark: SparkSession,
    root: str,
    recursive: bool = True,
    parallelism: int | None = None,
) -> DataFrame:
    """All scan records including skips/errors (RAW_SCAN_SCHEMA).

    Fully distributed: directory discovery is an iterative DataFrame
    expansion (no driver-side walk) and the stat stage is an
    Arrow-batched mapInPandas over the directory DataFrame (no
    row-at-a-time Python-RDD pickling)."""
    import pandas as pd  # noqa: F401

    dirs = _dirs_df(spark, root, recursive)
    n = parallelism or spark.sparkContext.defaultParallelism * 2
    cols = [f.name for f in RAW_SCAN_SCHEMA.fields]

    def stat_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            rows = list(_stat_entries(iter(pdf["dir"])))
            yield pd.DataFrame(rows, columns=cols)

    raw = dirs.repartition(n).mapInPandas(
        stat_batches,
        schema="path string, filename string, modification_datetime timestamp, "
        "file_size long, kind string",
    )
    return raw


def scan_directory(
    spark: SparkSession,
    root: str,
    recursive: bool = True,
    parallelism: int | None = None,
) -> DataFrame:
    """Scan a tree into a (path, filename, modification_datetime,
    file_size) DataFrame of regular files. mtimes are naive-UTC,
    matching the engine's UTC session timezone (SURVEY §7)."""
    raw = scan_raw(spark, root, recursive, parallelism)
    return raw.filter(F.col("kind") == KIND_FILE).drop("kind")


def scan_with_counters(
    spark: SparkSession,
    root: str,
    recursive: bool = True,
    parallelism: int | None = None,
) -> tuple[DataFrame, dict[str, int]]:
    """(files DataFrame, skip/error counters) — D7's session counters
    computed distributedly from the tagged scan, one extra aggregation
    over the materialized raw scan instead of mutable in-memory state.
    localCheckpoint (not cache): the stored partitions are released when
    the DataFrame is garbage-collected, so repeated incremental runs in
    one session don't pin executor storage."""
    raw = scan_raw(spark, root, recursive, parallelism).localCheckpoint(eager=False)
    counts = {r["kind"]: r["n"] for r in raw.groupBy("kind").agg(F.count("*").alias("n")).collect()}
    files = raw.filter(F.col("kind") == KIND_FILE).drop("kind")
    counters = {
        "symlinks_skipped": counts.get(KIND_SYMLINK, 0),
        "special_files_skipped": counts.get(KIND_SPECIAL, 0),
        "scan_errors": counts.get(KIND_ERROR, 0),
        "files_found": counts.get(KIND_FILE, 0),
    }
    return files, counters
