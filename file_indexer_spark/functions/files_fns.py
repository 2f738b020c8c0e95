"""Column expressions shared by the files-table operators.

All JVM-side built-ins (whole-stage codegen) — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

KB = 1024
MB = 1024 * 1024
GB = 1024 * 1024 * 1024


def extension_expr(filename: Column | str = "filename") -> Column:
    """Lowercased text after the LAST dot; '(no extension)' when dotless.

    Canonical semantics = the reference API backend's extractor
    (reference api_backend/file_indexer_api/database.py:495-501:
    LOWER(SUBSTR(...REVERSE...STRPOS...)) == lowercased last-dot
    segment). The reference's Go (first-dot, database.go:237-240) and
    TS (utils.ts:53-56) variants diverge; last-dot is documented as
    canonical per SURVEY §7.
    """
    col = F.col(filename) if isinstance(filename, str) else filename
    return F.when(col.like("%.%"), F.lower(F.substring_index(col, ".", -1))).otherwise(
        F.lit("(no extension)")
    )


def size_band_expr(file_size: Column | str = "file_size") -> Column:
    """5-way size-range label (reference database.py:471-487)."""
    col = F.col(file_size) if isinstance(file_size, str) else file_size
    return (
        F.when(col == 0, "0 bytes")
        .when(col < KB, "< 1KB")
        .when(col < MB, "1KB - 1MB")
        .when(col < GB, "1MB - 1GB")
        .otherwise("> 1GB")
    )


def size_band_order_expr(file_size: Column | str = "file_size") -> Column:
    """Sort key matching the label buckets (reference database.py:479-486)."""
    col = F.col(file_size) if isinstance(file_size, str) else file_size
    return (
        F.when(col == 0, 1).when(col < KB, 2).when(col < MB, 3).when(col < GB, 4).otherwise(5)
    )
