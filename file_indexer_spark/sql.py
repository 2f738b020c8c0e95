"""S12: raw-SQL passthrough (reference file_indexer_go/db/database.go:269-317,
CLI flag cmd/cli.go:47).

The Go engine hands arbitrary user SQL to embedded DuckDB; here the
equivalent is temp views + ``spark.sql`` — strictly more powerful
(full Spark SQL, distributed execution) and free. ``register_views``
exposes the whole catalog (the driver's test tables plus the derived
``files`` fact table) so ad-hoc analytics can address any of them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from file_indexer_spark.tables import TABLE_NAMES, events_df, files_df, load_table


def register_views(spark: SparkSession, sf_dir: str, files: DataFrame | None = None) -> None:
    """Register every catalog table plus ``files`` as temp views."""
    for name in TABLE_NAMES:
        df = events_df(spark, sf_dir) if name == "events" else load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
    (files if files is not None else files_df(spark, sf_dir)).createOrReplaceTempView("files")


def run_sql(spark: SparkSession, query: str) -> DataFrame:
    """Execute raw user SQL against the registered views."""
    return spark.sql(query)
