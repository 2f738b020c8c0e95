"""Serving-layer helpers: pagination contracts (reference O6,
api_backend/file_indexer_api/routers.py:74,132-134).

The API backend serves (page, total_count, has_more) triples; here the
same contract over any ordered DataFrame. ``total_count`` costs one
aggregate job (cache the source if serving interactively); the page
itself is a TakeOrderedAndProject — no full materialization.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass
class Page:
    rows: list
    total_count: int
    limit: int
    offset: int
    has_more: bool


def paginate(df: DataFrame, order_by: list[str], limit: int, offset: int = 0) -> Page:
    """Stable page + has_more flag (offset + len(page) < total)."""
    total = df.count()
    page_df = df.orderBy(*order_by)
    if offset:
        page_df = page_df.offset(offset)
    rows = page_df.limit(limit).collect()
    return Page(
        rows=rows,
        total_count=total,
        limit=limit,
        offset=offset,
        has_more=offset + len(rows) < total,
    )
