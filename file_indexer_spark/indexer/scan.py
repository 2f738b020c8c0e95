"""Distributed filesystem scan (reference S1-S4).

The reference walks the tree with a single-process generator
(file_indexer/indexer.py:184-220) and stats files in batches of 1000
(:281-289). Here the DIRECTORY list is discovered on the driver (cheap:
one os.walk touching only dirents), then fanned out so executors stat
the files of each directory in parallel — the stat() syscalls, not the
walk, are the I/O cost at scale.

Filter semantics (reference _should_process_file, indexer.py:112-156):
skip symlinks and non-regular files; empty files are INDEXED but not
checksummed (that's checksum eligibility, not scan filtering).

For 100 TB / billions of files the same shape holds: parallelize the
directory list (or a manifest of prefixes for object stores), let each
task list+stat its slice, and never materialize the tree on the driver.
"""

from __future__ import annotations

import os
from collections.abc import Iterator
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

SCAN_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType(), False),
        T.StructField("filename", T.StringType(), False),
        T.StructField("modification_datetime", T.TimestampType(), False),
        T.StructField("file_size", T.LongType(), False),
    ]
)


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
    """Executor task: stat every regular file in each directory."""
    for d in dirs:
        try:
            entries = os.scandir(d)
        except OSError:
            continue
        with entries:
            for entry in entries:
                try:
                    if entry.is_symlink() or not entry.is_file(follow_symlinks=False):
                        continue
                    st = entry.stat(follow_symlinks=False)
                except OSError:
                    continue  # permission errors are counted, not fatal (D6)
                yield (
                    d,
                    entry.name,
                    datetime.fromtimestamp(st.st_mtime, tz=timezone.utc).replace(tzinfo=None),
                    int(st.st_size),
                )


def scan_directory(
    spark: SparkSession,
    root: str,
    recursive: bool = True,
    parallelism: int | None = None,
) -> DataFrame:
    """Scan a tree into a (path, filename, modification_datetime,
    file_size) DataFrame. mtimes are naive-UTC, matching the engine's
    UTC session timezone (SURVEY §7 timezone risk)."""
    dirs = _list_dirs(root, recursive)
    if not dirs:
        return spark.createDataFrame([], SCAN_SCHEMA)
    n = parallelism or min(len(dirs), spark.sparkContext.defaultParallelism * 2)
    rdd = spark.sparkContext.parallelize(dirs, n).mapPartitions(_stat_dir)
    return spark.createDataFrame(rdd, SCAN_SCHEMA)
