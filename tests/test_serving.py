"""Route-layer parity for the serving surface (reference
api_backend/file_indexer_api/routers.py): the full GET /search/ param
set, POST /search/ and POST /duplicates/ request bodies. The mapping
helpers are framework-free and tested end-to-end here; the fastapi
wiring itself is exercised only when fastapi is installed (TestClient
block at the bottom, import-gated like create_app)."""

from __future__ import annotations

import datetime as dt

import pytest

from file_indexer_spark import serving as sv
from file_indexer_spark.session import tune_session
from file_indexer_spark.tables import files_df


@pytest.fixture(scope="module")
def svc(spark, sf_smoke):
    tune_session(spark)
    return sv.FileIndexService(files_df(spark, sf_smoke))


def test_get_param_surface_forwards_all_filters(svc):
    """GET /search/ must forward checksum/has_checksum/size bounds
    (reference routers.py:85-119), not just patterns+paging."""
    # pick a real checksum from the corpus
    some = svc.search(sv.SearchRequest(has_checksum=True, limit=1)).rows[0]
    req = sv.search_request_from_query(checksum=some["checksum"], limit=10)
    page = svc.search(req)
    assert page.total_count >= 1
    assert all(r["checksum"] == some["checksum"] for r in page.rows)

    req = sv.search_request_from_query(has_checksum=False, limit=5)
    assert all(r["checksum"] is None for r in svc.search(req).rows)

    req = sv.search_request_from_query(min_size=100, max_size=200, limit=2000)
    sizes = [r["file_size"] for r in svc.search(req).rows]
    assert sizes and all(100 <= s <= 200 for s in sizes)

    # GET parity: no modification-bound params exist on the GET surface
    assert req.modified_after is None and req.modified_before is None


def test_post_search_body_full_model(svc):
    """POST /search/ accepts the full SearchRequest model, including
    the reference field names (min_size/max_size) and ISO datetime
    strings for the modification bounds."""
    body = {
        "filename_pattern": "doc_%",
        "min_size": 50,
        "max_size": 5000,
        "modified_after": "2023-01-01T00:00:00",
        "limit": 25,
        "offset": 0,
    }
    req = sv.search_request_from_body(body)
    assert req.min_file_size == 50 and req.max_file_size == 5000
    assert isinstance(req.modified_after, dt.datetime)
    page = svc.search(req)
    out = sv.search_response_dict(page)
    assert set(out) == {"files", "total_count", "has_more"}
    assert len(out["files"]) <= 25
    for f in out["files"]:
        assert 50 <= f["file_size"] <= 5000
        assert f["modification_datetime"] >= dt.datetime(2023, 1, 1)

    with pytest.raises(ValueError):
        sv.search_request_from_body({"limit": 0})
    # unknown body fields are DROPPED (reference pydantic models ignore
    # extras — a stray key must not surface as a 500/TypeError)
    req = sv.search_request_from_body({"no_such_field": 1, "limit": 7})
    assert req.limit == 7


def test_post_duplicates_body_and_response_shape(svc):
    body = {"min_group_size": 2, "limit": 5, "offset": 0}
    resp = svc.duplicates(sv.duplicates_request_from_body(body))
    out = sv.duplicates_response_dict(resp)
    # reference DuplicatesResponse parity (models.py:103-110)
    assert set(out) == {
        "duplicate_groups", "total_groups", "total_duplicate_files",
        "total_wasted_space", "has_more",
    }
    assert len(out["duplicate_groups"]) <= 5
    for g in out["duplicate_groups"]:
        # recursive serialization: nested files must be plain dicts
        assert isinstance(g["files"], list)
        assert all(isinstance(f, dict) for f in g["files"])
        assert g["file_count"] >= 2
    # routers.py:132 — sum of the page groups' file counts
    assert out["total_duplicate_files"] == sum(
        g["file_count"] for g in out["duplicate_groups"]
    )

    with pytest.raises(ValueError):
        sv.duplicates_request_from_body({"min_group_size": 1})
    assert sv.duplicates_request_from_body({"bogus": True}).min_group_size == 2


def test_routes_through_testclient(spark, sf_smoke):
    """Full wiring when fastapi is present (absent in this container —
    the block then skips, exactly like create_app's import gate)."""
    pytest.importorskip("fastapi")
    from fastapi.testclient import TestClient

    app = sv.create_app(files_df(spark, sf_smoke))
    client = TestClient(app)

    r = client.get("/search/", params={"has_checksum": "true", "limit": 3})
    assert r.status_code == 200 and len(r.json()["files"]) <= 3

    r = client.post("/search/", json={"min_size": 100, "limit": 3})
    assert r.status_code == 200
    assert all(f["file_size"] >= 100 for f in r.json()["files"])

    r = client.post("/duplicates/", json={"min_group_size": 2, "limit": 2})
    assert r.status_code == 200 and "total_wasted_space" in r.json()
