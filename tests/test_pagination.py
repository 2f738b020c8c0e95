"""Keyset pagination (P7/O4) and streaming group assembly (O5) —
reference file_indexer/indexer.py:1078-1109 and :766-794 semantics."""

from __future__ import annotations

from file_indexer_spark.operators import search as srch
from file_indexer_spark.session import tune_session
from file_indexer_spark.tables import files_df


def _files(spark, sf_smoke):
    tune_session(spark)
    return files_df(spark, sf_smoke)


def test_keyset_pages_cover_table_exactly_once(spark, sf_smoke):
    files = _files(spark, sf_smoke).cache()
    total = files.count()
    seen = []
    for page in srch.keyset_pages(files, page_size=37):
        assert len(page) <= 37
        seen.extend((r["path"], r["filename"]) for r in page)
    assert len(seen) == total
    assert len(set(seen)) == total  # no duplicates across pages
    assert seen == sorted(seen)  # global (path, filename) order


def test_keyset_page_matches_offset_page(spark, sf_smoke):
    files = _files(spark, sf_smoke).cache()
    ordered = files.orderBy("path", "filename").collect()
    cursor = ordered[9]
    page = srch.keyset_page(
        files, after_path=cursor["path"], after_filename=cursor["filename"], limit=5
    ).collect()
    expect = [(r["path"], r["filename"]) for r in ordered[10:15]]
    assert [(r["path"], r["filename"]) for r in page] == expect


def test_keyset_directory_pages_cover_dirs_exactly_once(spark, sf_smoke):
    """Directory keyset variant (reference indexer.py:1329-1361):
    DISTINCT paths, cursor-paged by path > ?, global order, no repeats."""
    files = _files(spark, sf_smoke).cache()
    expect = sorted(r["path"] for r in files.select("path").distinct().collect())
    seen = []
    for page in srch.keyset_directory_pages(files, page_size=7):
        assert len(page) <= 7
        seen.extend(page)
    assert seen == expect
    # a single mid-table page matches the slice of the full ordering
    cursor = expect[4]
    page = [r["path"] for r in srch.keyset_directory_page(files, cursor, limit=3).collect()]
    assert page == expect[5:8]


def test_stream_grouped_duplicates_runs_groups(spark, sf_smoke):
    files = _files(spark, sf_smoke).cache()
    groups = list(srch.stream_grouped_duplicates(files))
    assert groups, "smoke corpus has duplicate checksums"
    for checksum, members in groups:
        assert len(members) >= 2
        assert all(m["checksum"] == checksum for m in members)
    # every group exactly once
    keys = [c for c, _ in groups]
    assert len(keys) == len(set(keys))
