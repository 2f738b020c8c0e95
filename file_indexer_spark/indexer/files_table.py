"""Parquet-backed ``files`` table with PK upsert/delete (reference
S5-S10).

The reference gets upserts from DuckDB's ``INSERT .. ON CONFLICT``
(file_indexer_go/db/database.go:98-113) and transactional
executemany batches (file_indexer/indexer.py:411-448). On a data lake
the equivalent is Delta/Iceberg ``MERGE INTO``; this container has
plain Parquet, so MERGE is emulated as anti-join + union + atomic
directory swap — the same shape a MERGE executes physically (join on
the PK, rewrite touched files), with the swap standing in for the
transaction log.

Scale: an UNPARTITIONED emulated MERGE rewrites the whole table —
a non-starter at 100 TB. Pass ``buckets=N`` to hash-partition the
table by ``xxhash64(path) % N``: upsert/delete then (a) compute the
buckets its keys touch, (b) read ONLY those partition directories
(partition pruning on the directory layout), and (c) swap only those
directories — I/O proportional to the touched slice, not the table.
Bucketing on ``path`` alone keeps directory-level deletes prunable
too; a pathological single-directory table degenerates to one bucket,
which is exactly the Hive partition-by-prefix trade. The public API
(upsert / delete / overwrite) is storage-agnostic so a Delta backend
can slot in unchanged.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

FILES_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType(), False),
        T.StructField("filename", T.StringType(), False),
        T.StructField("checksum", T.StringType(), True),
        T.StructField("modification_datetime", T.TimestampType(), False),
        T.StructField("file_size", T.LongType(), False),
        T.StructField("indexed_at", T.TimestampType(), True),
    ]
)

PK = ["path", "filename"]
_COLS = [f.name for f in FILES_SCHEMA.fields]
BUCKET_COL = "pk_bucket"


class FilesTable:
    def __init__(self, spark: SparkSession, location: str, buckets: int | None = None):
        self.spark = spark
        self.location = os.path.abspath(location)
        self.buckets = buckets
        self._validate_layout()

    _BUCKET_MARKER = "_buckets"

    def _validate_layout(self) -> None:
        """The bucket count is part of the on-disk layout: a marker file
        records it, and reopening with a different value is rejected —
        a mismatched modulus would prune the wrong partitions and
        silently duplicate or miss primary keys."""
        marker = os.path.join(self.location, self._BUCKET_MARKER)
        disk: int | None = None
        if os.path.isfile(marker):
            with open(marker) as fh:
                disk = int(fh.read().strip())
        elif self.exists():
            disk = None  # pre-existing unbucketed layout
        else:
            return  # fresh table: any configuration is fine
        if disk != self.buckets:
            raise ValueError(
                f"table at {self.location} was written with buckets={disk}; "
                f"reopening with buckets={self.buckets} would corrupt it"
            )

    def _write_marker(self, root: str) -> None:
        if self.buckets:
            with open(os.path.join(root, self._BUCKET_MARKER), "w") as fh:
                fh.write(str(self.buckets))

    def _bucket_expr(self) -> F.Column:
        return F.pmod(F.xxhash64(F.col("path")), F.lit(self.buckets)).cast("int")

    # -- read ---------------------------------------------------------
    def exists(self) -> bool:
        if not os.path.isdir(self.location):
            return False
        for _, _, names in os.walk(self.location):
            if any(n.endswith(".parquet") for n in names):
                return True
        return False

    def _read_raw(self) -> DataFrame:
        """Table including the partition column (bucketed layout)."""
        if not self.exists():
            empty = self.spark.createDataFrame([], FILES_SCHEMA)
            return empty.withColumn(BUCKET_COL, F.lit(None).cast("int")) if self.buckets else empty
        if self.buckets:
            return self.spark.read.parquet(self.location).select(*_COLS, BUCKET_COL)
        return self.spark.read.schema(FILES_SCHEMA).parquet(self.location)

    def read(self) -> DataFrame:
        return self._read_raw().select(*_COLS)

    # -- write --------------------------------------------------------
    def overwrite(self, df: DataFrame) -> None:
        """Full replace via write-to-temp + atomic swap (S10)."""
        tmp = f"{self.location}.tmp-{uuid.uuid4().hex[:8]}"
        writer = df.select(*_COLS)
        if self.buckets:
            writer = writer.withColumn(BUCKET_COL, self._bucket_expr())
            writer.write.mode("overwrite").partitionBy(BUCKET_COL).parquet(tmp)
        else:
            writer.write.mode("overwrite").parquet(tmp)
        self._write_marker(tmp)
        old = f"{self.location}.old-{uuid.uuid4().hex[:8]}"
        if os.path.exists(self.location):
            os.rename(self.location, old)
        os.rename(tmp, self.location)
        if os.path.exists(old):
            shutil.rmtree(old, ignore_errors=True)

    def _swap_partitions(self, out: DataFrame, touched: list[int]) -> None:
        """Rewrite ONLY the touched bucket directories: write the new
        slice to a temp dir, then swap each ``pk_bucket=N`` directory
        into place. Untouched buckets are never read or written."""
        tmp = f"{self.location}.tmp-{uuid.uuid4().hex[:8]}"
        out.withColumn(BUCKET_COL, self._bucket_expr()).write.mode("overwrite").partitionBy(
            BUCKET_COL
        ).parquet(tmp)
        old = f"{self.location}.old-{uuid.uuid4().hex[:8]}"
        os.makedirs(old, exist_ok=True)
        try:
            os.makedirs(self.location, exist_ok=True)
            self._write_marker(self.location)
            for b in touched:
                src = os.path.join(tmp, f"{BUCKET_COL}={b}")
                dst = os.path.join(self.location, f"{BUCKET_COL}={b}")
                # move the live copy ASIDE (recoverable), never delete it
                # before its replacement is in place
                if os.path.exists(dst):
                    os.rename(dst, os.path.join(old, f"{BUCKET_COL}={b}"))
                if os.path.exists(src):
                    os.rename(src, dst)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(old, ignore_errors=True)

    def _touched_buckets(self, keys: DataFrame) -> list[int]:
        rows = keys.select(self._bucket_expr().alias("b")).distinct().collect()
        return [r["b"] for r in rows]

    # Measured on a 500k-row/64-bucket table: a scattered update hitting
    # ~all buckets is SLOWER through per-directory swaps (2.4 s) than one
    # full rewrite (1.6 s) — the pruned path only wins when updates
    # cluster into few buckets (the incremental re-index shape). Past
    # this touched fraction, fall back to the single-rewrite plan.
    _WIDE_TOUCH_FRACTION = 0.5

    def _wide(self, touched: list[int]) -> bool:
        return self.buckets is not None and len(touched) >= self.buckets * self._WIDE_TOUCH_FRACTION

    def upsert(self, updates: DataFrame) -> None:
        """MERGE: update matched PKs, insert the rest (S7/S8).

        Bucketed: touches only the partitions the update keys hash to.
        """
        touched = self._touched_buckets(updates) if self.buckets and self.exists() else []
        if not self.buckets or not self.exists() or self._wide(touched):
            current = self.read()
            kept = current.join(updates.select(*PK), PK, "left_anti")
            self.overwrite(kept.unionByName(updates.select(*_COLS)))
            return
        slice_df = self._read_raw().filter(F.col(BUCKET_COL).isin(touched)).select(*_COLS)
        kept = slice_df.join(updates.select(*PK), PK, "left_anti")
        self._swap_partitions(kept.unionByName(updates.select(*_COLS)), touched)

    def delete(self, keys: DataFrame) -> None:
        """MERGE ... WHEN MATCHED DELETE (S9): anti-join rewrite of the
        touched buckets only (bucketed) or the table (plain)."""
        if not self.exists():
            return
        touched = self._touched_buckets(keys) if self.buckets else []
        if not self.buckets or self._wide(touched):
            current = self.read()
            self.overwrite(current.join(keys.select(*PK).distinct(), PK, "left_anti"))
            return
        slice_df = self._read_raw().filter(F.col(BUCKET_COL).isin(touched)).select(*_COLS)
        self._swap_partitions(
            slice_df.join(keys.select(*PK).distinct(), PK, "left_anti"), touched
        )

    def delete_paths(self, paths: DataFrame) -> None:
        """Directory-level delete (reference indexer.py:1762-1787) —
        prunable because bucketing hashes ``path`` only."""
        if not self.exists():
            return
        touched = self._touched_buckets(paths) if self.buckets else []
        if not self.buckets or self._wide(touched):
            current = self.read()
            self.overwrite(current.join(paths.select("path").distinct(), ["path"], "left_anti"))
            return
        slice_df = self._read_raw().filter(F.col(BUCKET_COL).isin(touched)).select(*_COLS)
        self._swap_partitions(
            slice_df.join(paths.select("path").distinct(), ["path"], "left_anti"), touched
        )

    # -- JSON interchange (S11, reference indexer.go:294-338) ----------
    # default JSON timestamps are millisecond-precision; stat() mtimes
    # carry microseconds — pin a lossless format on both sides
    _JSON_TS = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

    def export_json(self, dest: str) -> None:
        """Whole-index JSON export (newline-delimited, partitioned —
        the distributed analogue of the Go engine's single JSON doc)."""
        self.read().write.mode("overwrite").option("timestampFormat", self._JSON_TS).json(dest)

    def import_json(self, src: str) -> None:
        """Replace the table from a JSON export."""
        df = self.spark.read.schema(FILES_SCHEMA).option("timestampFormat", self._JSON_TS).json(src)
        self.overwrite(df)
