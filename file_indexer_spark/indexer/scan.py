"""Distributed filesystem scan (reference S1-S4, D6/D7 accounting).

The reference walks the tree with a single-process generator
(file_indexer/indexer.py:184-220) and stats files in batches of 1000
(:281-289). Here the DIRECTORY list is discovered on the driver (cheap:
one os.walk touching only dirents), then fanned out so executors stat
the files of each directory in parallel — the stat() syscalls, not the
walk, are the I/O cost at scale.

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


def _list_dirs(root: str, recursive: bool) -> list[str]:
    """Directory inventory only — O(#dirs) driver work, no file stats."""
    root = os.path.abspath(root)
    if not recursive:
        return [root]
    out = []
    for dirpath, dirnames, _ in os.walk(root):
        # don't descend through symlinked dirs (reference skips symlinks)
        dirnames[:] = [d for d in dirnames if not os.path.islink(os.path.join(dirpath, d))]
        out.append(dirpath)
    return out


def _stat_dir(dirs: Iterator[str]):
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
    """All scan records including skips/errors (RAW_SCAN_SCHEMA)."""
    dirs = _list_dirs(root, recursive)
    if not dirs:
        return spark.createDataFrame([], RAW_SCAN_SCHEMA)
    n = parallelism or min(len(dirs), spark.sparkContext.defaultParallelism * 2)
    rdd = spark.sparkContext.parallelize(dirs, n).mapPartitions(_stat_dir)
    return spark.createDataFrame(rdd, RAW_SCAN_SCHEMA)


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
    over the cached raw scan instead of mutable in-memory state."""
    raw = scan_raw(spark, root, recursive, parallelism).cache()
    counts = {r["kind"]: r["n"] for r in raw.groupBy("kind").agg(F.count("*").alias("n")).collect()}
    files = raw.filter(F.col("kind") == KIND_FILE).drop("kind")
    counters = {
        "symlinks_skipped": counts.get(KIND_SYMLINK, 0),
        "special_files_skipped": counts.get(KIND_SPECIAL, 0),
        "scan_errors": counts.get(KIND_ERROR, 0),
        "files_found": counts.get(KIND_FILE, 0),
    }
    return files, counters
