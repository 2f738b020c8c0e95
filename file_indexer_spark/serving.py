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


# --------------------------------------------------------------------
# API-backend service contracts (reference api_backend/file_indexer_api:
# routers.py:121-184 duplicates, :28-118 search; models.py:61-100).
# Framework-free: the service layer returns plain dataclasses a FastAPI
# (or any) frontend can serialize 1:1; ``create_app`` wires it up when
# fastapi is installed (not shipped in this container).


@dataclass
class SearchRequest:
    """models.py:24-58 — validated query surface (limit 1..10000,
    models.py:45-47)."""

    filename_pattern: str | None = None
    path_pattern: str | None = None
    checksum: str | None = None
    has_checksum: bool | None = None
    min_file_size: int | None = None
    max_file_size: int | None = None
    modified_after: object | None = None
    modified_before: object | None = None
    limit: int = 100
    offset: int = 0

    def __post_init__(self):
        if not 1 <= self.limit <= 10000:
            raise ValueError("limit must be in 1..10000")
        if self.offset < 0:
            raise ValueError("offset must be >= 0")


@dataclass
class DuplicatesRequest:
    """models.py:61-88 — limit 1..1000, min_group_size >= 2, optional
    size bounds (models.py:69-74)."""

    min_group_size: int = 2
    min_file_size: int | None = None
    max_file_size: int | None = None
    filename_pattern: str | None = None
    path_pattern: str | None = None
    limit: int = 100
    offset: int = 0

    def __post_init__(self):
        if not 1 <= self.limit <= 1000:
            raise ValueError("limit must be in 1..1000")
        if self.min_group_size < 2:
            raise ValueError("min_group_size must be >= 2")
        if self.offset < 0:
            raise ValueError("offset must be >= 0")
        for bound in (self.min_file_size, self.max_file_size):
            if bound is not None and bound < 0:
                raise ValueError("file size bounds must be >= 0")


@dataclass
class DuplicatesResponse:
    """routers.py:121-145 — groups page + aggregate fields."""

    groups: list
    total_groups: int
    total_wasted_space: int
    limit: int
    offset: int
    has_more: bool


API_VERSION = "0.1.0"  # reference main.py:80, routers.py:46


class FileIndexService:
    """Read-side service over a ``files`` DataFrame (cache it for
    interactive serving — immutable snapshots make concurrent reads
    safe, the reference's read-only-connection trick for free)."""

    def __init__(self, files: DataFrame, cache: bool = True, source_path: str | None = None):
        # paginate() runs a count job plus the page job per request;
        # caching the immutable snapshot makes the second and later
        # requests scan memory, not parquet.
        self.files = files.cache() if cache else files
        # reference HealthCheck.database_path (models.py:158) — the
        # backing store's path; None is valid (in-memory snapshot)
        self.source_path = source_path

    def search(self, req: SearchRequest) -> Page:
        from file_indexer_spark.operators.search import search_files

        matches = search_files(
            self.files,
            filename_pattern=req.filename_pattern,
            path_pattern=req.path_pattern,
            checksum=req.checksum,
            has_checksum=req.has_checksum,
            min_file_size=req.min_file_size,
            max_file_size=req.max_file_size,
            modified_after=req.modified_after,
            modified_before=req.modified_before,
        )
        return paginate(matches, ["path", "filename"], req.limit, req.offset)

    def duplicates(self, req: DuplicatesRequest) -> DuplicatesResponse:
        from pyspark.sql import functions as F

        from file_indexer_spark.operators.duplicates import (
            duplicate_groups_nested,
            scope_to_pattern,
        )

        base = scope_to_pattern(
            self.files,
            req.filename_pattern,
            req.path_pattern,
            req.min_file_size,
            req.max_file_size,
        )
        groups = duplicate_groups_nested(base, req.min_group_size).localCheckpoint(eager=False)
        total = groups.count()
        # wasted space over the SAME group set the response describes
        # (min_group_size respected), not all size-2 groups
        wasted = int(
            groups.agg(F.coalesce(F.sum("wasted_space"), F.lit(0)).cast("long")).collect()[0][0]
        )
        page = groups
        if req.offset:
            page = page.offset(req.offset)
        rows = page.limit(req.limit).collect()
        return DuplicatesResponse(
            groups=rows,
            total_groups=total,
            total_wasted_space=wasted,
            limit=req.limit,
            offset=req.offset,
            has_more=req.offset + len(rows) < total,
        )

    def stats(self):
        from file_indexer_spark.operators.stats import database_stats

        return database_stats(self.files).collect()[0].asDict()

    def visualization(self) -> dict:
        """The three chart tables the reference serves in one response
        (routers.py:204-215, database.py:459-550, models.py:147-152):
        size distribution bands, extension top-20, monthly timeline —
        all three are the registered a9/a10/a11 operators."""
        from file_indexer_spark.operators.stats import (
            extension_stats,
            modification_timeline,
            size_histogram,
        )

        return {
            "size_distribution": [
                r.asDict() for r in size_histogram(self.files).collect()
            ],
            "extension_stats": [
                r.asDict() for r in extension_stats(self.files).collect()
            ],
            "modification_timeline": [
                {**r.asDict(), "month": r["month"].isoformat() if r["month"] else None}
                for r in modification_timeline(self.files).collect()
            ],
        }

    def health(self) -> dict:
        """Health contract (reference routers.py:36-57, models.py:155-159):
        status + connectivity + file count. 'Connected' here means the
        snapshot is queryable — the count doubles as the probe."""
        try:
            n = int(self.files.count())
            return {
                "status": "healthy",
                "database_connected": True,
                "database_path": self.source_path,
                "total_files": n,
                "api_version": API_VERSION,
            }
        except Exception:  # noqa: BLE001 - any failure = unhealthy, never raise
            return {
                "status": "unhealthy",
                "database_connected": False,
                "database_path": self.source_path,
                "total_files": 0,
                "api_version": API_VERSION,
            }


# ---- route-layer request/response mapping (framework-free, tested
# ---- without fastapi; create_app below is only the wiring)

def search_request_from_query(
    filename_pattern: str | None = None,
    path_pattern: str | None = None,
    checksum: str | None = None,
    has_checksum: bool | None = None,
    min_size: int | None = None,
    max_size: int | None = None,
    limit: int = 100,
    offset: int = 0,
) -> SearchRequest:
    """GET /search/ param surface (reference routers.py:85-119):
    min_size/max_size map onto the model's file-size bounds; the GET
    route passes no modification bounds (parity — the reference GET
    hardcodes modified_after=None, routers.py:112-113)."""
    return SearchRequest(
        filename_pattern=filename_pattern,
        path_pattern=path_pattern,
        checksum=checksum,
        has_checksum=has_checksum,
        min_file_size=min_size,
        max_file_size=max_size,
        limit=limit,
        offset=offset,
    )


def _known_fields(cls, data: dict) -> dict:
    """Drop unknown body keys — the reference's pydantic models ignore
    extras by default, so a stray field must not surface as a 500."""
    import dataclasses

    names = {f.name for f in dataclasses.fields(cls)}
    return {k: v for k, v in data.items() if k in names}


def search_request_from_body(body: dict) -> SearchRequest:
    """POST /search/ body → SearchRequest (reference routers.py:64-80
    accepts the full model). The reference model's min_size/max_size
    names are accepted as aliases; modified_after/before arrive as
    ISO-8601 strings; unknown fields are dropped (pydantic parity)."""
    import datetime as _dt

    data = dict(body)
    if "min_size" in data:
        data["min_file_size"] = data.pop("min_size")
    if "max_size" in data:
        data["max_file_size"] = data.pop("max_size")
    for key in ("modified_after", "modified_before"):
        if isinstance(data.get(key), str):
            data[key] = _dt.datetime.fromisoformat(data[key])
    return SearchRequest(**_known_fields(SearchRequest, data))


def duplicates_request_from_body(body: dict) -> DuplicatesRequest:
    """POST /duplicates/ body → DuplicatesRequest (routers.py:121-145);
    unknown fields are dropped (pydantic parity)."""
    return DuplicatesRequest(**_known_fields(DuplicatesRequest, dict(body)))


def search_response_dict(page: Page) -> dict:
    return {
        "files": [r.asDict() for r in page.rows],
        "total_count": page.total_count,
        "has_more": page.has_more,
    }


def duplicates_response_dict(resp: DuplicatesResponse) -> dict:
    """Reference DuplicatesResponse parity (models.py:103-110): the
    groups page under the ``duplicate_groups`` key plus
    ``total_duplicate_files`` — the sum of the page groups' file
    counts, exactly the reference's routers.py:132 arithmetic."""
    # recursive=True: each group carries a nested files array of Rows,
    # which a JSON layer cannot serialize un-flattened
    groups = [r.asDict(recursive=True) for r in resp.groups]
    return {
        "duplicate_groups": groups,
        "total_groups": resp.total_groups,
        "total_duplicate_files": sum(g["file_count"] for g in groups),
        "total_wasted_space": resp.total_wasted_space,
        "has_more": resp.has_more,
    }


def create_app(files: DataFrame):  # pragma: no cover - fastapi not shipped
    """FastAPI wiring (reference main.py:77-100) — import-gated; the
    service layer + mapping helpers above are the tested surface."""
    try:
        from fastapi import FastAPI
    except ImportError as exc:
        raise NotImplementedError(
            "fastapi is not installed in this environment; "
            "use FileIndexService directly"
        ) from exc
    app = FastAPI(title="file_indexer_spark")
    svc = FileIndexService(files)

    @app.get("/search/")
    def search(filename_pattern: str | None = None, path_pattern: str | None = None,
               checksum: str | None = None, has_checksum: bool | None = None,
               min_size: int | None = None, max_size: int | None = None,
               limit: int = 100, offset: int = 0):
        req = search_request_from_query(
            filename_pattern=filename_pattern, path_pattern=path_pattern,
            checksum=checksum, has_checksum=has_checksum,
            min_size=min_size, max_size=max_size, limit=limit, offset=offset)
        return search_response_dict(svc.search(req))

    @app.post("/search/")
    def search_post(body: dict):
        return search_response_dict(svc.search(search_request_from_body(body)))

    @app.get("/duplicates/")
    def duplicates(min_group_size: int = 2, limit: int = 100, offset: int = 0):
        resp = svc.duplicates(DuplicatesRequest(min_group_size=min_group_size,
                                                limit=limit, offset=offset))
        return duplicates_response_dict(resp)

    @app.post("/duplicates/")
    def duplicates_post(body: dict):
        resp = svc.duplicates(duplicates_request_from_body(body))
        return duplicates_response_dict(resp)

    @app.get("/stats/")
    def stats():
        return svc.stats()

    # reference serves visualization under the stats router prefix
    # (routers.py:188 prefix="/stats", :204 "/visualization") — register
    # the parity path plus the legacy root alias
    @app.get("/stats/visualization")
    @app.get("/visualization/")
    def visualization():
        return svc.visualization()

    @app.get("/health/")
    def health():
        return svc.health()

    return app
