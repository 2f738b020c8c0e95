"""``index_metadata`` K/V side table (reference Go
file_indexer_go/db/database.go:47-50; written at indexer.go:72-77,
read at db/database.go:219-231).

Two columns (key, value), a handful of rows (root_path, indexed
timestamp, schema version) — stored as a single-partition parquet
alongside the files table. Deliberately tiny: reads collect to a dict.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import types as T

META_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType(), False),
        T.StructField("value", T.StringType(), True),
    ]
)

KEY_ROOT_PATH = "root_path"
KEY_INDEXED_AT = "indexed"


class IndexMetadata:
    def __init__(self, spark: SparkSession, location: str):
        self.spark = spark
        self.location = os.path.abspath(location)

    def read_all(self) -> dict[str, str]:
        if not os.path.isdir(self.location):
            return {}
        rows = self.spark.read.schema(META_SCHEMA).parquet(self.location).collect()
        return {r["key"]: r["value"] for r in rows}

    def get(self, key: str) -> str | None:
        return self.read_all().get(key)

    def set_many(self, items: dict[str, str]) -> None:
        """Unique-tmp + move-aside swap (the single-file analogue of
        FilesTable's manifest commit): the live copy is never deleted
        before its replacement is in place, and concurrent writers
        don't share a tmp path."""
        import shutil
        import uuid

        merged = {**self.read_all(), **items}
        df = self.spark.createDataFrame(sorted(merged.items()), META_SCHEMA)
        tmp = f"{self.location}.tmp-{uuid.uuid4().hex[:8]}"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        old = f"{self.location}.old-{uuid.uuid4().hex[:8]}"
        if os.path.exists(self.location):
            os.rename(self.location, old)
        os.rename(tmp, self.location)
        shutil.rmtree(old, ignore_errors=True)

    def set(self, key: str, value: str) -> None:
        self.set_many({key: value})
