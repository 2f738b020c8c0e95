"""Query registry: every implemented operator as a (spark, sf_dir) ->
DataFrame callable, paired with an equivalent DuckDB oracle SQL string.

This is the driver contract (see /root/repo/__spark_entry__.py) and the
coverage ledger for SURVEY.md §2 — keys are prefixed with the survey
operator IDs they implement.

Determinism rules (oracle hash-matches are order-insensitive but value-
and schema-sensitive):
  * every LIMIT/top-k query sorts by a TOTAL order first;
  * aggregate outputs are aliased identically in Spark and SQL;
  * DuckDB SUM(BIGINT) returns HUGEINT — oracles cast back to BIGINT
    to match Spark's LongType;
  * no CURRENT_DATE / now() — fixed timestamps only.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from file_indexer_spark.operators import duplicates as dup
from file_indexer_spark.operators import events as ev
from file_indexer_spark.operators import search as srch
from file_indexer_spark.operators import stats as st
from file_indexer_spark.operators import text as tx
from file_indexer_spark.session import tune_session
from file_indexer_spark.tables import events_df, files_df, load_table, with_files_cte

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _files(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    return files_df(spark, sf_dir)


def _table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    tune_session(spark)
    return load_table(spark, sf_dir, name)


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    return events_df(spark, sf_dir)


# ---------------------------------------------------------------- S5/O1

@register(
    "s5_files_scan",
    with_files_cte("SELECT * FROM files ORDER BY path, filename"),
)
def s5_files_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _files(spark, sf_dir).orderBy("path", "filename")


# ---------------------------------------------------------------- P1/P2

@register(
    "p1_search_multidim",
    with_files_cte(
        """
        SELECT * FROM files
        WHERE filename LIKE '%.en'
          AND checksum IS NOT NULL
          AND file_size >= 100 AND file_size <= 450
          AND modification_datetime >= TIMESTAMP '2024-03-01 00:00:00'
        ORDER BY path, filename
        """
    ),
)
def p1_search_multidim(spark: SparkSession, sf_dir: str) -> DataFrame:
    return srch.search_files(
        _files(spark, sf_dir),
        filename_pattern="%.en",
        has_checksum=True,
        min_file_size=100,
        max_file_size=450,
        modified_after="2024-03-01 00:00:00",
    )


@register(
    "p2_search_recency_page",
    with_files_cte(
        """
        SELECT * FROM files
        WHERE path LIKE '/src1%'
        ORDER BY modification_datetime DESC, path, filename
        LIMIT 50 OFFSET 10
        """
    ),
)
def p2_search_recency_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    return srch.search_files(
        _files(spark, sf_dir), path_pattern="/src1%", order_by_recency=True, limit=50, offset=10
    )


@register(
    "p3_search_ilike",
    with_files_cte(
        """
        SELECT * FROM files
        WHERE filename ILIKE '%DOC_1%' OR path ILIKE '%SRC2%'
        ORDER BY filename, path
        """
    ),
)
def p3_search_ilike(spark: SparkSession, sf_dir: str) -> DataFrame:
    files = _files(spark, sf_dir)
    return files.filter(
        F.col("filename").ilike("%DOC_1%") | F.col("path").ilike("%SRC2%")
    ).orderBy("filename", "path")


@register(
    "p5_point_lookup",
    with_files_cte("SELECT * FROM files WHERE path = '/src0' AND filename LIKE 'doc_0.%'"),
)
def p5_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    files = _files(spark, sf_dir)
    return files.filter((F.col("path") == "/src0") & (F.col("filename").like("doc_0.%")))


@register(
    "p7_keyset_page",
    with_files_cte(
        """
        SELECT * FROM files
        WHERE path > '/src2' OR (path = '/src2' AND filename > 'doc_10.en')
        ORDER BY path, filename LIMIT 40
        """
    ),
)
def p7_keyset_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    return srch.keyset_page(
        _files(spark, sf_dir), after_path="/src2", after_filename="doc_10.en", limit=40
    )


@register(
    "p7b_directory_page",
    with_files_cte(
        """
        SELECT DISTINCT path FROM files
        WHERE path > '/src1'
        ORDER BY path LIMIT 40
        """
    ),
)
def p7b_directory_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 directory variant (reference indexer.py:1329-1361): cursor-
    paged DISTINCT directories — the page source for empty-directory
    cleanup."""
    return srch.keyset_directory_page(
        _files(spark, sf_dir), after_path="/src1", limit=40
    )


# P6: batch PK probe. The probe batch is derived from a fixed doc_id set
# (langs vary per scale factor, so literal keys would not be portable)
# plus one key that matches nothing — the inner probe must drop it.
PROBE_DOC_IDS = (0, 7, 42, 99, 123, 456)


@register(
    "p6_batch_probe",
    with_files_cte(
        f"""
        , probe_keys AS (
            SELECT '/' || source AS path,
                   'doc_' || CAST(doc_id AS VARCHAR) || '.' || lang AS filename
            FROM documents WHERE doc_id IN {PROBE_DOC_IDS}
            UNION ALL SELECT '/nowhere', 'doc_x.yy'
        )
        SELECT f.* FROM files f JOIN probe_keys USING (path, filename)
        ORDER BY path, filename
        """
    ),
)
def p6_batch_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bulk point-lookup: reference builds a 1000-pair row-value IN list
    (indexer.py:228-266); here the batch is a DataFrame broadcast-joined
    against the fact table — no literal-size limit, same semantics."""
    files = _files(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id").isin(*PROBE_DOC_IDS))
    keys = docs.select(
        F.concat(F.lit("/"), F.col("source")).alias("path"),
        F.concat(
            F.lit("doc_"), F.col("doc_id").cast("string"), F.lit("."), F.col("lang")
        ).alias("filename"),
    ).unionAll(
        files.sparkSession.createDataFrame(
            [("/nowhere", "doc_x.yy")], "path string, filename string"
        )
    )
    return srch.batch_probe(files, keys).orderBy("path", "filename")


# ---------------------------------------------------------------- J1-J3

@register(
    "j1_duplicate_files",
    with_files_cte(
        """
        SELECT checksum, path, filename, file_size, modification_datetime, indexed_at
        FROM (
            SELECT *, COUNT(*) OVER (PARTITION BY checksum) AS group_count
            FROM files WHERE checksum IS NOT NULL
        ) t
        WHERE group_count > 1
        ORDER BY checksum, path, filename
        """
    ),
)
def j1_duplicate_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dup.duplicate_files(_files(spark, sf_dir)).select(
        "checksum", "path", "filename", "file_size", "modification_datetime", "indexed_at"
    )


@register(
    "j2_duplicate_groups",
    with_files_cte(
        """
        , duplicate_checksums AS (
            SELECT checksum, file_size, COUNT(*) AS file_count
            FROM files
            WHERE checksum IS NOT NULL
            GROUP BY checksum, file_size
            HAVING COUNT(*) >= 2
            ORDER BY file_count DESC, file_size DESC, checksum
            LIMIT 100
        )
        SELECT f.checksum, f.file_size, dc.file_count, f.path, f.filename,
               f.modification_datetime, f.indexed_at
        FROM files f
        JOIN duplicate_checksums dc
          ON f.checksum = dc.checksum AND f.file_size = dc.file_size
        ORDER BY dc.file_count DESC, f.checksum, f.path, f.filename
        """
    ),
)
def j2_duplicate_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dup.duplicate_groups(_files(spark, sf_dir), min_group_size=2, limit=100)


@register(
    "j3_duplicate_groups_pattern",
    with_files_cte(
        """
        , target AS (
            SELECT DISTINCT checksum FROM files
            WHERE checksum IS NOT NULL AND filename LIKE '%.fr'
        ),
        scope AS (
            SELECT f.* FROM files f WHERE f.checksum IN (SELECT checksum FROM target)
        ),
        groups AS (
            SELECT checksum, file_size, COUNT(*) AS file_count
            FROM scope GROUP BY checksum, file_size HAVING COUNT(*) >= 2
        )
        SELECT s.checksum, s.file_size, g.file_count, s.path, s.filename,
               s.modification_datetime, s.indexed_at
        FROM scope s
        JOIN groups g ON s.checksum = g.checksum AND s.file_size = g.file_size
        ORDER BY g.file_count DESC, s.checksum, s.path, s.filename
        """
    ),
)
def j3_duplicate_groups_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dup.duplicate_groups(_files(spark, sf_dir), min_group_size=2, filename_pattern="%.fr")


@register(
    "d5_duplicates_report",
    with_files_cte(
        """
        SELECT checksum, path, filename, file_size, file_count,
               CASE WHEN rn = 1 THEN 'ORIGINAL' ELSE 'DUPLICATE' END AS role,
               CASE WHEN rn = 1 THEN 0 ELSE file_size END AS wasted_space
        FROM (
            SELECT *,
                   COUNT(*) OVER (PARTITION BY checksum) AS file_count,
                   ROW_NUMBER() OVER (PARTITION BY checksum ORDER BY path, filename) AS rn
            FROM files WHERE checksum IS NOT NULL
        ) t
        WHERE file_count > 1
        ORDER BY checksum, path, filename
        """
    ),
)
def d5_duplicates_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dup.duplicates_report(_files(spark, sf_dir))


@register(
    "a12_duplicate_groups_nested",
    with_files_cte(
        """
        SELECT checksum, file_size, COUNT(*) AS file_count,
               to_json(list(struct_pack(path := path, filename := filename)
                            ORDER BY path, filename)) AS files,
               file_size * (COUNT(*) - 1) AS wasted_space
        FROM files
        WHERE checksum IS NOT NULL
        GROUP BY checksum, file_size
        HAVING COUNT(*) >= 2
        ORDER BY file_count DESC, file_size DESC, checksum
        """
    ),
)
def a12_duplicate_groups_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The nested ArrayType(Struct) result stays available via
    # dup.duplicate_groups_nested; the gate-registered variant serializes
    # the sorted array to one deterministic JSON string per group so the
    # driver's canonicalizer can hash it (both engines emit compact
    # [{"path":...,"filename":...}] with identical key order).
    return dup.duplicate_groups_nested(_files(spark, sf_dir)).withColumn(
        "files", F.to_json("files")
    )


@register(
    "a8_duplicate_stats",
    with_files_cte(
        """
        SELECT COALESCE(COUNT(*), 0) AS duplicate_groups,
               CAST(COALESCE(SUM(file_count), 0) AS BIGINT) AS duplicate_files
        FROM (
            SELECT checksum, COUNT(*) AS file_count FROM files
            WHERE checksum IS NOT NULL GROUP BY checksum HAVING COUNT(*) > 1
        ) g
        """
    ),
)
def a8_duplicate_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dup.duplicate_stats(_files(spark, sf_dir))


@register(
    "a13_total_wasted_space",
    with_files_cte(
        """
        SELECT CAST(COALESCE(SUM(file_size * (file_count - 1)), 0) AS BIGINT) AS total_wasted_space
        FROM (
            SELECT checksum, file_size, COUNT(*) AS file_count FROM files
            WHERE checksum IS NOT NULL GROUP BY checksum, file_size HAVING COUNT(*) > 1
        ) g
        """
    ),
)
def a13_total_wasted_space(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dup.total_wasted_space(_files(spark, sf_dir))


# ---------------------------------------------------------------- A1-A11

@register(
    "a1_database_stats",
    with_files_cte(
        """
        , basic AS (
            SELECT COUNT(*) AS total_files,
                   CAST(COALESCE(SUM(file_size), 0) AS BIGINT) AS total_size,
                   COUNT(checksum) AS files_with_checksums,
                   COUNT(*) - COUNT(checksum) AS files_without_checksums,
                   AVG(file_size) AS average_file_size,
                   MAX(file_size) AS largest_file_size,
                   MIN(file_size) AS smallest_file_size,
                   MAX(modification_datetime) AS most_recent_modification,
                   MIN(modification_datetime) AS oldest_modification,
                   COUNT(DISTINCT path) AS unique_directories,
                   COUNT(DISTINCT checksum) AS unique_checksums
            FROM files
        ),
        dups AS (
            SELECT COALESCE(COUNT(*), 0) AS duplicate_groups,
                   CAST(COALESCE(SUM(n), 0) AS BIGINT) AS duplicate_files
            FROM (
                SELECT checksum, COUNT(*) AS n FROM files
                WHERE checksum IS NOT NULL GROUP BY checksum HAVING COUNT(*) > 1
            ) g
        )
        SELECT * FROM basic CROSS JOIN dups
        """
    ),
)
def a1_database_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return st.database_stats(_files(spark, sf_dir))


@register(
    "a9_size_histogram",
    with_files_cte(
        """
        SELECT size_range, sort_order, COUNT(*) AS count,
               CAST(SUM(file_size) AS BIGINT) AS total_size
        FROM (
            SELECT file_size,
                   CASE WHEN file_size = 0 THEN '0 bytes'
                        WHEN file_size < 1024 THEN '< 1KB'
                        WHEN file_size < 1048576 THEN '1KB - 1MB'
                        WHEN file_size < 1073741824 THEN '1MB - 1GB'
                        ELSE '> 1GB' END AS size_range,
                   CASE WHEN file_size = 0 THEN 1
                        WHEN file_size < 1024 THEN 2
                        WHEN file_size < 1048576 THEN 3
                        WHEN file_size < 1073741824 THEN 4
                        ELSE 5 END AS sort_order
            FROM files
        ) sub
        GROUP BY size_range, sort_order
        ORDER BY sort_order
        """
    ),
)
def a9_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return st.size_histogram(_files(spark, sf_dir))


@register(
    "a10_extension_stats",
    with_files_cte(
        """
        SELECT extension, COUNT(*) AS count,
               CAST(SUM(file_size) AS BIGINT) AS total_size,
               AVG(file_size) AS average_size
        FROM (
            SELECT CASE WHEN filename LIKE '%.%'
                        THEN LOWER(regexp_extract(filename, '\\.([^.]*)$', 1))
                        ELSE '(no extension)' END AS extension,
                   file_size
            FROM files
        ) e
        GROUP BY extension
        ORDER BY count DESC, extension
        LIMIT 20
        """
    ),
)
def a10_extension_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return st.extension_stats(_files(spark, sf_dir))


@register(
    "a11_modification_timeline",
    with_files_cte(
        """
        SELECT CAST(DATE_TRUNC('month', modification_datetime) AS TIMESTAMP) AS month,
               COUNT(*) AS count,
               CAST(SUM(file_size) AS BIGINT) AS total_size
        FROM files
        WHERE modification_datetime >=
              CAST(CAST(TIMESTAMP '2025-06-01 00:00:00' AS DATE) - INTERVAL 12 MONTH AS TIMESTAMP)
        GROUP BY 1
        ORDER BY month
        """
    ),
)
def a11_modification_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    return st.modification_timeline(_files(spark, sf_dir))


@register(
    "a7_phase2_work_selection",
    with_files_cte(
        """
        SELECT file_size, COUNT(*) AS file_count,
               CAST(SUM(CASE WHEN checksum IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS files_without_checksum
        FROM files
        WHERE file_size > 0
        GROUP BY file_size
        HAVING COUNT(*) > 1 AND SUM(CASE WHEN checksum IS NULL THEN 1 ELSE 0 END) > 0
        ORDER BY file_size
        """
    ),
)
def a7_phase2_work_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    return st.phase2_work_selection(_files(spark, sf_dir))


@register(
    "a7b_phase2_files_to_hash",
    with_files_cte(
        """
        , sizes AS (
            SELECT file_size FROM files WHERE file_size > 0
            GROUP BY file_size
            HAVING COUNT(*) > 1 AND SUM(CASE WHEN checksum IS NULL THEN 1 ELSE 0 END) > 0
        )
        SELECT path, filename, file_size FROM files
        WHERE checksum IS NULL AND file_size IN (SELECT file_size FROM sizes)
        ORDER BY path, filename
        """
    ),
)
def a7b_phase2_files_to_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return st.phase2_files_to_hash(_files(spark, sf_dir))


# ------------------------------------------------------- LLM pillar: text

_STOP_SQL = ", ".join(f"'{w}'" for w in tx.STOPWORDS)

@register(
    "t1_token_stats",
    """
    SELECT source, lang, COUNT(*) AS n_docs,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
           CAST(SUM(length(text)) AS BIGINT) AS total_chars,
           round(CAST(SUM(len(string_split(text, ' '))) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS avg_doc_tokens
    FROM documents
    GROUP BY source, lang
    ORDER BY source, lang
    """,
)
def t1_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tx.token_stats(_table(spark, sf_dir, "documents"))


@register(
    "t2_quality_scores",
    f"""
    WITH m AS (
        SELECT doc_id, lang,
               CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
               CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS INTEGER) AS n_regex_tokens,
               CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER) AS n_distinct_tokens,
               CAST(list_sum(list_transform(string_split(text, ' '), t -> length(t))) AS BIGINT)
                   AS total_token_chars,
               CAST(len(list_filter(string_split(text, ' '), t -> t IN ({_STOP_SQL}))) AS INTEGER)
                   AS n_stopwords
        FROM documents
    )
    SELECT doc_id, lang, n_tokens, n_regex_tokens, n_distinct_tokens,
           round(CAST(total_token_chars AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) AS avg_token_len,
           round(CAST(n_stopwords AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) AS stopword_ratio,
           round(0.5 * (CAST(n_distinct_tokens AS DOUBLE) / CAST(n_tokens AS DOUBLE))
                 + 0.3 * (1.0 - CAST(n_stopwords AS DOUBLE) / CAST(n_tokens AS DOUBLE))
                 + 0.2 * least(CAST(n_tokens AS DOUBLE) / 300.0, 1.0), 6) AS quality_score,
           (0.5 * (CAST(n_distinct_tokens AS DOUBLE) / CAST(n_tokens AS DOUBLE))
                 + 0.3 * (1.0 - CAST(n_stopwords AS DOUBLE) / CAST(n_tokens AS DOUBLE))
                 + 0.2 * least(CAST(n_tokens AS DOUBLE) / 300.0, 1.0)) < 0.5 AS low_quality
    FROM m
    ORDER BY doc_id
    """,
)
def t2_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tx.quality_scores(_table(spark, sf_dir, "documents"))


@register(
    "t3_language_confusion",
    """
    WITH words AS (
        SELECT doc_id, lang AS actual_lang, unnest(string_split(text, ' ')) AS word
        FROM documents
    ),
    counts AS (
        SELECT actual_lang AS profile_lang, word, COUNT(*) AS profile_count
        FROM words GROUP BY 1, 2
    ),
    profile AS (
        SELECT profile_lang, word, profile_count FROM (
            SELECT *, row_number() OVER (PARTITION BY profile_lang
                        ORDER BY profile_count DESC, word) AS prof_rn
            FROM counts) t
        WHERE prof_rn <= 1000
    ),
    scores AS (
        SELECT w.doc_id, w.actual_lang, p.profile_lang,
               CAST(SUM(p.profile_count) AS BIGINT) AS score
        FROM words w JOIN profile p USING (word)
        GROUP BY 1, 2, 3
    ),
    pred AS (
        SELECT doc_id, actual_lang, profile_lang AS predicted_lang,
               row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, profile_lang) AS rn
        FROM scores
    )
    SELECT actual_lang, predicted_lang, COUNT(*) AS n_docs
    FROM pred WHERE rn = 1
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def t3_language_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tx.language_confusion(_table(spark, sf_dir, "documents"))


@register(
    "t4_fingerprints",
    """
    WITH s AS (
        SELECT doc_id, md5(text) AS content_hash,
               list_distinct(list_transform(
                   range(1, greatest(len(string_split(text, ' ')) - 3, 1) + 1),
                   i -> ('0x' || substring(md5(array_to_string(
                            string_split(text, ' ')[i:i+3], ' ')), 1, 15))::BIGINT
               )) AS hashes
        FROM documents
    )
    SELECT doc_id, content_hash,
           CAST(len(hashes) AS INTEGER) AS n_shingles,
           list_min(hashes) AS min_shingle_hash,
           md5(array_to_string(list_transform(list_sort(hashes)[1:5], h -> h::VARCHAR), '-'))
               AS fingerprint
    FROM s
    ORDER BY doc_id
    """,
)
def t4_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tx.fingerprints(_table(spark, sf_dir, "documents"))


# ----------------------------------------------------- LLM pillar: events

@register(
    "e1_sessionization",
    _E1_ORACLE := f"""
    WITH flagged AS (
        SELECT *,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                            > {ev.SESSION_GAP_MINUTES} * 60 * 1000000
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
        SELECT *,
               CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
        FROM flagged
    )
    SELECT user_id, session_seq,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           COUNT(*) AS n_events,
           CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_event_types,
           round(SUM(value), 4) AS total_value
    FROM sessions
    GROUP BY user_id, session_seq
    ORDER BY user_id, session_seq
    """,
)
def e1_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ev.sessionize(_events(spark, sf_dir))


# e14/st8 share one oracle: the native session_window API's split rule
# (gap >= threshold starts a new session — vs e1's strict >), no
# distinct-type count (streaming aggregations reject exact distincts).
_E14_ORACLE = f"""
    WITH flagged AS (
        SELECT *,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                            >= {ev.SESSION_GAP_MINUTES} * 60 * 1000000
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
        SELECT *,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seq
        FROM flagged
    )
    SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           round(SUM(value), 4) AS total_value
    FROM sessions GROUP BY user_id, seq
    ORDER BY user_id, session_start
    """


@register("e14_session_window", _E14_ORACLE)
def e14_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E14: sessionization via the NATIVE ``F.session_window``
    aggregation — the one-definition-for-batch-and-stream rendition of
    e1 (same operator object runs st8's watermarked stream)."""
    from file_indexer_spark.streaming import sessions as ss

    return ss.session_window_sessions(_events(spark, sf_dir)).orderBy(
        "user_id", "session_start"
    )


@register("st8_session_window_stream", _E14_ORACLE)
def st8_session_window_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST8: e14 as a REAL watermarked stream — the engine's built-in
    stateful session windows (state = open sessions, merged and closed
    as the watermark advances; append mode emits a session exactly once
    when it can no longer grow). Two chronological arrivals split the
    events mid-stream; two far-future sentinel arrivals then push the
    watermark past every real session so append mode flushes them all
    (eviction lands one micro-batch behind the watermark — the same
    measured lag the bounded-dedup test pins). The sentinel user is
    filtered from the result, which the FULL e14 oracle then
    hash-gates."""
    import os

    from file_indexer_spark.streaming import sessions as ss
    from file_indexer_spark.streaming import windows as sw

    tune_session(spark)
    base, tag = _stream_workdir("fis_st8", sf_dir)
    src = os.path.join(base, "src")
    ev2 = _events(spark, sf_dir)
    mid = ev2.agg(F.max("event_id")).first()[0] // 2
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]

    def sentinel(days: int) -> DataFrame:
        return ev2.agg(F.max("ts").alias("mx")).select(
            F.lit(-1).cast("long").alias("event_id"),
            F.expr(f"mx + INTERVAL {days} DAYS").alias("ts"),
            F.lit(-1).cast("long").alias("user_id"),
            F.lit("sentinel").alias("event_type"),
            F.lit(0.0).alias("value"),
            F.lit(None).cast("string").alias("props"),
        )

    _land_arrivals(
        src,
        [
            ev2.filter(F.col("event_id") <= mid).select(*cols),
            ev2.filter(F.col("event_id") > mid).select(*cols),
            sentinel(30),
            sentinel(31),
        ],
    )
    stream = sw.read_events_stream(spark, src, max_files_per_trigger=1)
    sink = f"st8_sink_{tag}"
    from file_indexer_spark.streaming.util import run_to_memory_sink

    run_to_memory_sink(ss.session_window_sessions(stream), sink, output_mode="append")
    return (
        spark.table(sink)
        .filter(F.col("user_id") >= 0)
        .orderBy("user_id", "session_start")
    )


# e15/st9 share one oracle: the interval-join pair set is identical
# whether computed as a batch self-join or a watermarked stream-stream
# join (inner joins emit pairs, never windows, so no flush sentinel).
from file_indexer_spark.streaming.joins import (  # noqa: E402
    ATTRIBUTION_GAP_MINUTES as sj_gap_minutes,
)

_E15_ORACLE = f"""
    SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
           v.event_id AS view_id, v.ts AS view_ts
    FROM events p
    JOIN events v
      ON v.user_id = p.user_id
     AND v.ts <= p.ts
     AND v.ts >= p.ts - INTERVAL {sj_gap_minutes} MINUTE
    WHERE p.event_type = 'purchase' AND v.event_type = 'view'
    ORDER BY purchase_id, view_id
    """


@register("e15_interval_join", _E15_ORACLE)
def e15_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E15: per-user view→purchase attribution — ALL views inside the
    hour before each purchase (the interval-JOIN shape; e7 is the
    as-of LAST-view variant). Batch plan: filtered self-join with a
    range predicate; both sides shuffle once on user_id."""
    from file_indexer_spark.streaming import joins as sjoins

    return sjoins.view_purchase_pairs(_events(spark, sf_dir)).orderBy(
        "purchase_id", "view_id"
    )


@register("st9_interval_join_stream", _E15_ORACLE)
def st9_interval_join_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST9: e15 as a REAL watermarked STREAM-STREAM join — two-sided
    join state (the one stateful-operator class st1-st8 don't cover),
    bounded by the watermark pair + time-range predicate. Two
    chronological arrivals split the events mid-stream, so pairs
    straddling the split must match across micro-batches out of
    retained state; the identical e15 oracle then hash-gates the
    drained sink."""
    import os

    from file_indexer_spark.streaming import joins as sjoins
    from file_indexer_spark.streaming import windows as sw
    from file_indexer_spark.streaming.util import run_to_memory_sink

    tune_session(spark)
    base, tag = _stream_workdir("fis_st9", sf_dir)
    src = os.path.join(base, "src")
    ev2 = _events(spark, sf_dir)
    mid = ev2.agg(F.max("event_id")).first()[0] // 2
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    _land_arrivals(
        src,
        [
            ev2.filter(F.col("event_id") <= mid).select(*cols),
            ev2.filter(F.col("event_id") > mid).select(*cols),
        ],
    )
    stream = sw.read_events_stream(spark, src, max_files_per_trigger=1)
    sink = f"st9_sink_{tag}"
    run_to_memory_sink(sjoins.view_purchase_pairs(stream), sink)
    return spark.table(sink).orderBy("purchase_id", "view_id")


# e15b/st10 share the LEFT OUTER oracle: unattributed purchases emit
# with NULL view columns.
_E15B_ORACLE = f"""
    SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
           v.event_id AS view_id, v.ts AS view_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON v.user_id = p.user_id
     AND v.ts <= p.ts
     AND v.ts >= p.ts - INTERVAL {sj_gap_minutes} MINUTE
    ORDER BY purchase_id, view_id
    """


@register("e15b_interval_join_outer", _E15B_ORACLE)
def e15b_interval_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E15b: the LEFT OUTER attribution — every purchase emits, NULL
    view columns when nothing preceded it in the window (the
    unattributed-conversion report)."""
    from file_indexer_spark.streaming import joins as sjoins

    return sjoins.view_purchase_pairs_outer(_events(spark, sf_dir)).orderBy(
        "purchase_id", "view_id"
    )


@register("st10_interval_join_outer_stream", _E15B_ORACLE)
def st10_interval_join_outer_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST10: e15b as a watermarked STREAM-STREAM OUTER join — the
    delayed-null semantics st9's inner join doesn't exercise: an
    unmatched purchase may only emit its NULL row once the VIEW-side
    watermark proves no late view can still attribute it, so outer
    results trail the watermark like append-mode finalization. Two
    far-future sentinel arrivals carry BOTH event types (the join's
    effective watermark is the min of the two sides'), the sentinel
    user is filtered, and the batch LEFT JOIN oracle hash-gates the
    drained sink."""
    import os

    from file_indexer_spark.streaming import joins as sjoins
    from file_indexer_spark.streaming import windows as sw
    from file_indexer_spark.streaming.util import run_to_memory_sink

    tune_session(spark)
    base, tag = _stream_workdir("fis_st10", sf_dir)
    src = os.path.join(base, "src")
    ev2 = _events(spark, sf_dir)
    mid = ev2.agg(F.max("event_id")).first()[0] // 2
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]

    def sentinel(days: int) -> DataFrame:
        base_row = ev2.agg(F.max("ts").alias("mx"))
        out = None
        for off, etype in ((0, "view"), (1, "purchase")):
            row = base_row.select(
                F.lit(-1 - off).cast("long").alias("event_id"),
                F.expr(f"mx + INTERVAL {days} DAYS").alias("ts"),
                F.lit(-1).cast("long").alias("user_id"),
                F.lit(etype).alias("event_type"),
                F.lit(0.0).alias("value"),
                F.lit(None).cast("string").alias("props"),
            )
            out = row if out is None else out.unionByName(row)
        return out

    _land_arrivals(
        src,
        [
            ev2.filter(F.col("event_id") <= mid).select(*cols),
            ev2.filter(F.col("event_id") > mid).select(*cols),
            sentinel(30),
            sentinel(31),
        ],
    )
    stream = sw.read_events_stream(spark, src, max_files_per_trigger=1)
    sink = f"st10_sink_{tag}"
    run_to_memory_sink(sjoins.view_purchase_pairs_outer(stream), sink)
    return (
        spark.table(sink)
        .filter(F.col("user_id") >= 0)
        .orderBy("purchase_id", "view_id")
    )


@register("e1b_sessionization_skew", _E1_ORACLE)
def e1b_sessionization_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1 skew-safe variant: day-bucketed pre-sessionize + boundary
    fragment merge (``events.sessionize_skew_safe``) — the giant-user
    path. Same semantics, same oracle as e1. Prefer e1c when the
    consumer does not need per-user session ordinals: the ordinal is
    what forces this form's second full-volume pass."""
    return ev.sessionize_skew_safe(_events(spark, sf_dir))


@register(
    "e1c_session_stats",
    f"""
    -- e1's sessions and stats WITHOUT the per-user ordinal: the
    -- session key is (user_id, session_start). Dropping session_seq
    -- is the contract change that lets the skew-safe engine path skip
    -- the full-volume fragment renumbering pass (only midnight-edge
    -- fragments ever merge across day buckets).
    WITH flagged AS (
        SELECT *,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                            > {ev.SESSION_GAP_MINUTES} * 60 * 1000000
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
        SELECT *,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seq
        FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           COUNT(*) AS n_events,
           CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_event_types,
           round(SUM(value), 4) AS total_value
    FROM sessions
    GROUP BY user_id, seq
    ORDER BY user_id, session_start
    """,
)
def e1c_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1c: skew-safe per-session stats with the ordinal-free contract
    — interior day-bucket fragments ARE sessions (emitted with no
    second pass), only midnight-edge fragments take the merge window.
    The e1b 100x tail's structural fix (see events.py docstring and
    PERFORMANCE.md round-6 section)."""
    return ev.session_stats_skew_safe(_events(spark, sf_dir))


@register(
    "e2_tumbling_counts",
    """
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start, event_type,
           COUNT(*) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           round(SUM(value), 4) AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def e2_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ev.tumbling_counts(_events(spark, sf_dir))


@register(
    "e3_funnel",
    """
    WITH per_user AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
               MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
               MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
        FROM events GROUP BY user_id
    )
    SELECT COUNT(*) AS n_users,
           CAST(SUM(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_viewed,
           CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_clicked_after_view,
           CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                         AND t_purchase IS NOT NULL AND t_purchase > t_click
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_purchased_after_click
    FROM per_user
    """,
)
def e3_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ev.funnel(_events(spark, sf_dir))


@register(
    "e4_top_users",
    """
    WITH totals AS (
        SELECT user_id, COUNT(*) AS n_events, round(SUM(value), 4) AS total_value
        FROM events GROUP BY user_id
    )
    SELECT CAST(row_number() OVER (ORDER BY total_value DESC, user_id) AS INTEGER) AS rank,
           user_id, n_events, total_value
    FROM totals
    ORDER BY total_value DESC, user_id
    LIMIT 20
    """,
)
def e4_top_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ev.top_users(_events(spark, sf_dir))


@register(
    "e5_props_stats",
    """
    WITH parsed AS (
        SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        FROM events
    )
    SELECT event_type, COUNT(*) AS n_events,
           CAST(COUNT(DISTINCT k) AS BIGINT) AS n_distinct_k,
           CAST(SUM(k) AS BIGINT) AS sum_k,
           round(CAST(SUM(k) AS DOUBLE) / CAST(COUNT(k) AS DOUBLE), 6) AS avg_k
    FROM parsed
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def e5_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ev.props_stats(_events(spark, sf_dir))


# ------------------------------------------------------ LLM pillar: dedup

from file_indexer_spark.functions import hashing as H  # noqa: E402
from file_indexer_spark.operators import dedup as dd  # noqa: E402

@register(
    "dd1_exact_dedup",
    """
    SELECT content_hash, COUNT(*) AS n_docs, MIN(doc_id) AS keeper_doc_id,
           array_to_string(list_transform(list_sort(list(doc_id)), x -> x::VARCHAR), ',')
               AS doc_ids
    FROM (SELECT doc_id, md5(text) AS content_hash FROM documents) t
    GROUP BY content_hash
    HAVING COUNT(*) > 1
    ORDER BY content_hash
    """,
)
def dd1_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dd.exact_duplicates(_table(spark, sf_dir, "documents"))


@register(
    "dd2_ngram_jaccard",
    f"""
    WITH sets AS (SELECT doc_id, {H.duck_shingle_hashes()} AS shingles FROM documents),
    expl AS (SELECT doc_id, unnest(shingles) AS h FROM sets),
    dfreq AS (SELECT h, COUNT(*) AS df FROM expl GROUP BY h),
    kept AS (SELECT e.doc_id, e.h, d.df FROM expl e JOIN dfreq d USING (h)
             WHERE d.df <= {dd.MAX_DF}),
    sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM kept GROUP BY doc_id),
    pair_gen AS (SELECT doc_id, h FROM kept WHERE df >= 2),
    common AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common_shingles
        FROM pair_gen a JOIN pair_gen b ON a.h = b.h AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
    SELECT doc_a, doc_b, common_shingles, sa.set_size AS n_a, sb.set_size AS n_b,
           round(CAST(common_shingles AS DOUBLE)
                 / CAST(sa.set_size + sb.set_size - common_shingles AS DOUBLE), 6) AS jaccard
    FROM common
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(common_shingles AS DOUBLE)
          / CAST(sa.set_size + sb.set_size - common_shingles AS DOUBLE)
          >= {dd.JACCARD_THRESHOLD}
    ORDER BY doc_a, doc_b
    """,
)
def dd2_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dd.ngram_jaccard_pairs(_table(spark, sf_dir, "documents"))


@register(
    "dd3_minhash_lsh",
    f"""
    WITH sets AS (SELECT doc_id, {H.duck_shingle_hashes()} AS shingles FROM documents),
    sigs AS (SELECT doc_id, shingles, {H.duck_minhash_sig("shingles")} AS sig FROM sets),
    bands AS (SELECT doc_id, j AS band, {H.duck_band_hash("sig", "j")} AS digest
              FROM sigs, range(0, {H.LSH_BANDS}) t(j)),
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             FROM bands a JOIN bands b
               ON a.band = b.band AND a.digest = b.digest AND a.doc_id < b.doc_id),
    verified AS (
        SELECT doc_a, doc_b,
               len(list_intersect(sa.shingles, sb.shingles)) AS inter,
               len(sa.shingles) AS na, len(sb.shingles) AS nb
        FROM cand
        JOIN sets sa ON sa.doc_id = doc_a
        JOIN sets sb ON sb.doc_id = doc_b)
    SELECT doc_a, doc_b,
           round(CAST(inter AS DOUBLE) / CAST(na + nb - inter AS DOUBLE), 6) AS jaccard
    FROM verified
    WHERE CAST(inter AS DOUBLE) / CAST(na + nb - inter AS DOUBLE) >= {dd.JACCARD_THRESHOLD}
    ORDER BY doc_a, doc_b
    """,
)
def dd3_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dd.minhash_lsh_pairs(_table(spark, sf_dir, "documents"))


@register(
    "dd4_simhash",
    f"""
    WITH fp AS (SELECT doc_id, {H.duck_simhash(H.duck_shingle_hashes())} AS simhash
                FROM documents),
    bands AS (SELECT doc_id, simhash, j AS band,
                     (simhash >> (j * {H.SIMHASH_BAND_WIDTH}))
                     & {(1 << H.SIMHASH_BAND_WIDTH) - 1} AS band_value
              FROM fp, range(0, {H.SIMHASH_BANDS}) t(j)),
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                    a.simhash AS sh_a, b.simhash AS sh_b
             FROM bands a JOIN bands b
               ON a.band = b.band AND a.band_value = b.band_value
              AND a.doc_id < b.doc_id)
    SELECT doc_a, doc_b, CAST(bit_count(xor(sh_a, sh_b)) AS INTEGER) AS hamming
    FROM cand
    WHERE bit_count(xor(sh_a, sh_b)) <= {H.HAMMING_MAX}
    ORDER BY doc_a, doc_b
    """,
)
def dd4_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dd.simhash_pairs(_table(spark, sf_dir, "documents"))


# ------------------------------------------------- LLM pillar: similarity

from file_indexer_spark.operators import similarity as sim  # noqa: E402

# DuckDB rendition of the strict left-to-right double fold used by
# operators/similarity.py — list_reduce folds (p1+p2)+p3..., Spark's
# aggregate folds (0.0+p1)+p2...: identical IEEE sums.
_DUCK_DOT = (
    "list_reduce(list_transform(range(1, len({a}) + 1), "
    "i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE), (x, y) -> x + y)"
)
_DUCK_NORMS = f"""
    SELECT vec_id, embedding,
           sqrt({_DUCK_DOT.format(a="embedding", b="embedding")}) AS norm
    FROM embeddings
"""


@register(
    "sim1_cosine_topk",
    f"""
    WITH c AS ({_DUCK_NORMS}),
    q AS (SELECT * FROM c WHERE vec_id < {sim.N_QUERIES}),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               {_DUCK_DOT.format(a="q.embedding", b="c.embedding")} / (q.norm * c.norm)
                   AS cosine
        FROM q, c
        WHERE c.vec_id != q.vec_id),
    ranked AS (
        SELECT query_id, neighbor_id,
               CAST(row_number() OVER (PARTITION BY query_id
                    ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rank,
               cosine
        FROM scored)
    SELECT query_id, neighbor_id, rank, round(cosine, 6) AS cosine
    FROM ranked WHERE rank <= {sim.TOP_K}
    ORDER BY query_id, rank
    """,
)
def sim1_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sim.cosine_topk(_table(spark, sf_dir, "embeddings"))


@register(
    "sim2_ivf_ann",
    f"""
    WITH c AS ({_DUCK_NORMS}),
    cents AS (SELECT c.vec_id AS centroid_id, c.embedding AS c_emb, c.norm AS c_norm
              FROM c
              JOIN (SELECT MIN(vec_id) AS vec_id FROM embeddings GROUP BY label) reps
                ON c.vec_id = reps.vec_id),
    assign AS (
        SELECT vec_id, centroid_id FROM (
            SELECT v.vec_id, cents.centroid_id,
                   row_number() OVER (PARTITION BY v.vec_id ORDER BY
                        {_DUCK_DOT.format(a="v.embedding", b="cents.c_emb")}
                        / (v.norm * cents.c_norm) DESC, cents.centroid_id) AS rn
            FROM c v, cents) t
        WHERE rn = 1),
    q AS (SELECT vec_id AS query_id, embedding AS q_emb, norm AS q_norm
          FROM c WHERE vec_id < {sim.N_QUERIES}),
    probes AS (
        SELECT query_id, q_emb, q_norm, centroid_id FROM (
            SELECT q.query_id, q.q_emb, q.q_norm, cents.centroid_id,
                   row_number() OVER (PARTITION BY q.query_id ORDER BY
                        {_DUCK_DOT.format(a="q.q_emb", b="cents.c_emb")}
                        / (q.q_norm * cents.c_norm) DESC, cents.centroid_id) AS rn
            FROM q, cents) t
        WHERE rn <= {sim.NPROBE}),
    scored AS (
        SELECT p.query_id, c.vec_id AS neighbor_id,
               {_DUCK_DOT.format(a="p.q_emb", b="c.embedding")} / (p.q_norm * c.norm)
                   AS cosine
        FROM probes p
        JOIN assign a ON a.centroid_id = p.centroid_id
        JOIN c ON c.vec_id = a.vec_id
        WHERE c.vec_id != p.query_id),
    ranked AS (
        SELECT query_id, neighbor_id,
               CAST(row_number() OVER (PARTITION BY query_id
                    ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rank,
               cosine
        FROM scored)
    SELECT query_id, neighbor_id, rank, round(cosine, 6) AS cosine
    FROM ranked WHERE rank <= {sim.TOP_K}
    ORDER BY query_id, rank
    """,
)
def sim2_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sim.ivf_topk(_table(spark, sf_dir, "embeddings"))


# rows-only check (no oracle): MLlib LSH hash seeds aren't replicable
# in DuckDB; pytest asserts recall against sim1's exact top-k.
@register("sim3_brp_lsh_ann")
def sim3_brp_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sim.brp_lsh_neighbors(_table(spark, sf_dir, "embeddings"))


_SIM6_K = 160  # > _HIER_THRESHOLD => exercises the two-level path
_SIM6_M = 12  # isqrt(160): coarse centroid count the implementation derives


@register(
    "sim6_hier_ivf_assign",
    f"""
    -- Two-level (coarse-quantizer) IVF assignment: k hash-sampled seed
    -- centroids, sqrt(k) coarse routers; every vector routes to its
    -- nearest coarse cell, then argmax-assigns among that cell's fine
    -- centroids. Deterministic end-to-end (md5 seed order, IEEE fold
    -- dots, smaller-id tie-breaks) => full hash gate on the 100 TB
    -- assignment path.
    WITH c AS ({_DUCK_NORMS}),
    seeds AS (SELECT vec_id FROM embeddings
              ORDER BY md5(vec_id::VARCHAR), vec_id LIMIT {_SIM6_K}),
    cents AS (SELECT c.vec_id AS centroid_id, c.embedding AS c_emb, c.norm AS c_norm
              FROM c JOIN seeds ON c.vec_id = seeds.vec_id),
    coarse AS (SELECT centroid_id AS coarse_id, c_emb AS g_emb, c_norm AS g_norm
               FROM cents ORDER BY md5(centroid_id::VARCHAR), centroid_id LIMIT {_SIM6_M}),
    fine_routed AS (
        SELECT centroid_id, c_emb, c_norm, coarse_id FROM (
            SELECT f.centroid_id, f.c_emb, f.c_norm, g.coarse_id,
                   row_number() OVER (PARTITION BY f.centroid_id ORDER BY
                        {_DUCK_DOT.format(a="f.c_emb", b="g.g_emb")}
                        / (f.c_norm * g.g_norm) DESC, g.coarse_id) AS rn
            FROM cents f, coarse g) t WHERE rn = 1),
    v_routed AS (
        SELECT vec_id, embedding, norm, coarse_id FROM (
            SELECT v.vec_id, v.embedding, v.norm, g.coarse_id,
                   row_number() OVER (PARTITION BY v.vec_id ORDER BY
                        {_DUCK_DOT.format(a="v.embedding", b="g.g_emb")}
                        / (v.norm * g.g_norm) DESC, g.coarse_id) AS rn
            FROM c v, coarse g) t WHERE rn = 1),
    assign AS (
        SELECT vec_id, centroid_id FROM (
            SELECT v.vec_id, f.centroid_id,
                   row_number() OVER (PARTITION BY v.vec_id ORDER BY
                        {_DUCK_DOT.format(a="v.embedding", b="f.c_emb")}
                        / (v.norm * f.c_norm) DESC, f.centroid_id) AS rn
            FROM v_routed v JOIN fine_routed f ON f.coarse_id = v.coarse_id) t
        WHERE rn = 1)
    SELECT vec_id, centroid_id FROM assign ORDER BY vec_id
    """,
)
def sim6_hier_ivf_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SIM6: the parameterized-k IVF build through the two-level coarse
    quantizer (n x 2*sqrt(k) dots instead of n x k — the assignment
    shape that stays linear when k scales with the corpus; see
    similarity.py _hier_scored and BENCH_SCALE_NEARDUP.json)."""
    return (
        sim.ivf_assignments(
            _table(spark, sf_dir, "embeddings"), n_centroids=_SIM6_K
        )
        .orderBy("vec_id")
    )


@register(
    "sim7_quantize",
    """
    -- Symmetric int8 scalar quantization: scale = 127/max|v|, ties
    -- away from zero in both engines, per-vector error audit.
    WITH m AS (
        SELECT vec_id, embedding,
               list_max(list_transform(embedding, x -> abs(x::DOUBLE))) AS max_abs
        FROM embeddings),
    s AS (
        SELECT vec_id, embedding,
               CASE WHEN max_abs > 0 THEN 127.0 / max_abs END AS scale
        FROM m),
    qv AS (
        SELECT vec_id, embedding, scale,
               list_transform(embedding,
                   x -> CAST(round(CASE WHEN scale IS NULL THEN 0.0
                                        ELSE x::DOUBLE * scale END) AS INTEGER)) AS q
        FROM s)
    SELECT vec_id, to_json(q) AS q, round(scale, 6) AS scale,
           round(CASE WHEN scale IS NULL THEN 0.0 ELSE
                 list_max(list_transform(range(1, len(embedding) + 1),
                     i -> abs(embedding[i]::DOUBLE - q[i]::DOUBLE / scale))) END,
                 6) AS max_abs_err
    FROM qv ORDER BY vec_id
    """,
)
def sim7_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SIM7: int8 embedding storage form (4x smaller than float32) —
    all map-side expression work, bit-identical across engines because
    every element op is a pure function of one order-free per-vector
    max.

    The raw ``array<int>`` form stays available via
    ``sim.quantize_embeddings``; the gate-registered variant serializes
    ``q`` to one compact JSON string per vector (``[1,2,3]`` in both
    engines) so the driver's canonicalizer can sort/hash it — the same
    a12 pattern (CORRECTNESS_r05 recorded sim7's raw-array row as a
    canonicalizer TypeError, exactly a12's round-1 failure)."""
    return sim.quantize_embeddings(
        _table(spark, sf_dir, "embeddings")
    ).withColumn("q", F.to_json("q"))


# ------------------------------------------------ LLM pillar: multimodal

from file_indexer_spark.operators import multimodal as mm  # noqa: E402

@register(
    "m1_binary_metadata",
    """
    SELECT source, COUNT(*) AS n_blobs,
           CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           CAST(MAX(octet_length(encode(text))) AS BIGINT) AS max_bytes,
           CAST(COUNT(DISTINCT sha256(text)) AS BIGINT) AS distinct_digests
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
)
def m1_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mm.binary_metadata(_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------- S12 raw SQL

from file_indexer_spark.sql import register_views, run_sql  # noqa: E402

_S12_SQL = """
    SELECT path, COUNT(*) AS n_files,
           CAST(SUM(file_size) AS BIGINT) AS total_size,
           COUNT(checksum) AS with_checksum
    FROM files
    GROUP BY path
    ORDER BY path
"""


@register("s12_raw_sql", with_files_cte(_S12_SQL))
def s12_raw_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw-SQL passthrough: the SAME SQL text a user would type runs via
    spark.sql over the registered views (reference database.go:269-317)."""
    tune_session(spark)
    register_views(spark, sf_dir)
    return run_sql(spark, _S12_SQL)


# Ad-hoc ANALYTICS through the same passthrough: TPC-H-shaped queries
# over the driver's lineitem/orders/customer tables. The SQL text is
# dialect-neutral (identical string runs in Spark and the DuckDB
# oracle). Money math is exact-integer (cents / basis points) so
# aggregate hashes match bit-for-bit regardless of either engine's
# float summation order — the PLANS are the point: q1 is a pure
# partial-agg pipeline (shuffle carries 6 groups); q3 joins the dim
# tables with filters pushed into all three scans, and at scale the
# filtered customer side broadcasts.

_S12B_SQL = """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_price_cents,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS BIGINT) AS sum_disc_price_e4,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
"""


@register("s12b_tpch_pricing", _S12B_SQL)
def s12b_tpch_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape via raw SQL: scan-filter-aggregate on the fact
    table; partial aggregation means the shuffle carries 6 group rows
    per mapper regardless of corpus size."""
    tune_session(spark)
    register_views(spark, sf_dir)
    return run_sql(spark, _S12B_SQL)


_S12C_SQL = """
    SELECT o_orderkey,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_e4,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY o_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue_e4 DESC, o_orderkey
    LIMIT 10
"""


@register("s12c_tpch_top_orders", _S12C_SQL)
def s12c_tpch_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape via raw SQL: selective dim filter (1/5 of
    customers) joins fact tables; Catalyst pushes all three predicates
    into the scans and AQE picks broadcast for the filtered customer
    side; top-10 is TakeOrdered, not a full sort."""
    tune_session(spark)
    register_views(spark, sf_dir)
    return run_sql(spark, _S12C_SQL)


# ------------------------------------------- W1: write-path round-trip

@register(
    "w1_index_roundtrip",
    """
    SELECT 'doc_' || CAST(doc_id AS VARCHAR) || '.txt' AS filename,
           CAST(octet_length(encode(text)) AS BIGINT) AS file_size,
           sha256(text) AS checksum
    FROM documents
    ORDER BY filename
    """,
)
def w1_index_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end write path under the correctness gate: materialize
    every document as a real file, run the full distributed pipeline
    (BFS scan -> stat -> mapInPandas sha256 -> merge into a FilesTable),
    and emit (filename, file_size, checksum) — which the DuckDB oracle
    recomputes independently as octet_length/sha256 of the same text.

    The driver-side collect is bounded test plumbing (it writes the
    fixture tree); the indexing itself is the production path.
    """
    import hashlib
    import os
    import shutil
    import tempfile

    from file_indexer_spark.indexer.files_table import FilesTable
    from file_indexer_spark.indexer.two_phase import update_index

    tune_session(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    base = os.path.join(tempfile.gettempdir(), f"fis_w1_{tag}")
    tree = os.path.join(base, "tree")
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(tree)
    for r in docs:
        with open(os.path.join(tree, f"doc_{r['doc_id']}.txt"), "w", encoding="utf-8") as fh:
            fh.write(r["text"])

    table = FilesTable(spark, os.path.join(base, "files_db"))
    update_index(spark, table, tree, max_checksum_size=0)  # 0 = no size cap
    return table.read().select("filename", "file_size", "checksum").orderBy("filename")


@register(
    "dd5_embedding_neardup",
    f"""
    WITH c AS ({_DUCK_NORMS}),
    cents AS (SELECT c.vec_id AS centroid_id, c.embedding AS c_emb, c.norm AS c_norm
              FROM c
              JOIN (SELECT MIN(vec_id) AS vec_id FROM embeddings GROUP BY label) reps
                ON c.vec_id = reps.vec_id),
    assign AS (
        SELECT vec_id, centroid_id FROM (
            SELECT v.vec_id, cents.centroid_id,
                   row_number() OVER (PARTITION BY v.vec_id ORDER BY
                        {_DUCK_DOT.format(a="v.embedding", b="cents.c_emb")}
                        / (v.norm * cents.c_norm) DESC, cents.centroid_id) AS rn
            FROM c v, cents) t
        WHERE rn = 1),
    vecs AS (SELECT c.vec_id, c.embedding AS emb, c.norm AS nrm, a.centroid_id
             FROM c JOIN assign a ON a.vec_id = c.vec_id),
    pairs AS (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               {_DUCK_DOT.format(a="a.emb", b="b.emb")} / (a.nrm * b.nrm) AS cosine
        FROM vecs a JOIN vecs b
          ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id)
    SELECT vec_a, vec_b, round(cosine, 6) AS cosine
    FROM pairs WHERE cosine >= {sim.NEARDUP_COSINE}
    ORDER BY vec_a, vec_b
    """,
)
def dd5_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sim.embedding_neardup_pairs(_table(spark, sf_dir, "embeddings"))


# rows-only check (no oracle): MLlib MinHashLSH internals aren't
# replicable in DuckDB; pytest asserts pair parity against dd3.
@register("dd6_minhash_lsh_ml")
def dd6_minhash_lsh_ml(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dd.minhash_lsh_ml_pairs(_table(spark, sf_dir, "documents"))


# ------------------------------------------------- ST1/ST2/ST3 streaming

def _stream_workdir(prefix: str, sf_dir: str) -> tuple[str, str]:
    """Fresh per-(query, sf) scratch dir + a tag for memory-sink names."""
    import hashlib
    import os
    import shutil
    import tempfile

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    base = os.path.join(tempfile.gettempdir(), f"{prefix}_{tag}")
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base)
    return base, tag


def _land_arrivals(src: str, dfs) -> None:
    """Write each DataFrame as one parquet 'arrival' file and pin
    strictly increasing mtimes, so the streaming file source (which
    orders files by modification time) replays them in list order —
    deterministic micro-batch sequencing without sleeps."""
    import os

    seen: set[str] = set()
    for i, df in enumerate(dfs):
        df.coalesce(1).write.mode("append").parquet(src)
        new = {p for p in os.listdir(src) if p.endswith(".parquet")} - seen
        t = 1_700_000_000 + i
        for p in new:
            os.utime(os.path.join(src, p), (t, t))
        seen |= new


@register(
    "st1_streaming_windows",
    """
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
           CAST(date_trunc('hour', ts) + INTERVAL 1 HOUR AS TIMESTAMP) AS window_end,
           event_type,
           COUNT(*) AS n_events,
           round(SUM(value), 4) AS total_value
    FROM events
    GROUP BY 1, 2, 3
    ORDER BY 1, 3
    """,
)
def st1_streaming_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST1: watermarked tumbling windows run as a REAL stream (two file
    arrivals -> two micro-batches), drained with availableNow into a
    complete-mode memory sink. Complete mode never evicts, so the final
    state equals the batch aggregation — the DuckDB oracle is the plain
    windowed aggregate. (Append-mode eviction semantics are pinned by
    tests/test_streaming.py.)"""
    import os

    from file_indexer_spark.streaming import windows as sw

    tune_session(spark)
    base, tag = _stream_workdir("fis_st1", sf_dir)
    src = os.path.join(base, "src")
    ev2 = events_df(spark, sf_dir)
    _land_arrivals(
        src,
        [ev2.filter(F.col("event_id") % 2 == 0), ev2.filter(F.col("event_id") % 2 == 1)],
    )
    stream = sw.read_events_stream(spark, src, max_files_per_trigger=1)
    sink = f"st1_sink_{tag}"
    sw.run_to_memory_sink(sw.windowed_counts(stream), sink)
    return spark.table(sink).orderBy("window_start", "event_type")


@register(
    "st2_streaming_index",
    """
    SELECT '/stream' AS path,
           'doc_' || CAST(doc_id AS VARCHAR) || '.txt' AS filename,
           CAST(TIMESTAMP '2024-01-01 00:00:00' + to_seconds(doc_id)
                + CASE WHEN doc_id % 3 = 0 THEN INTERVAL 1 HOUR
                       ELSE INTERVAL 0 SECOND END AS TIMESTAMP)
               AS modification_datetime,
           CAST(octet_length(encode(text)) AS BIGINT) AS file_size
    FROM documents
    ORDER BY filename
    """,
)
def st2_streaming_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST2: continuous index maintenance — scan snapshots stream in as
    micro-batches and foreachBatch applies the SAME merge as batch
    update_index. Arrival 1 carries half the corpus at stale mtimes;
    arrival 2 the full corpus at fresh mtimes, so the merge exercises
    insert + update + unchanged-reuse across batches. The oracle is the
    expected FINAL table state, computed independently from documents.
    """
    import os

    from file_indexer_spark.indexer.files_table import FilesTable
    from file_indexer_spark.streaming import incremental as inc

    tune_session(spark)
    base, _tag = _stream_workdir("fis_st2", sf_dir)
    src = os.path.join(base, "src")

    scan = load_table(spark, sf_dir, "documents").select(
        F.lit("/stream").alias("path"),
        F.concat(F.lit("doc_"), F.col("doc_id").cast("string"), F.lit(".txt")).alias(
            "filename"
        ),
        F.expr(
            "timestamp'2024-01-01 00:00:00' + make_interval(0, 0, 0, 0, 0, 0, doc_id)"
        ).alias("modification_datetime"),
        F.octet_length("text").cast("long").alias("file_size"),
        F.col("doc_id"),
    )
    fresh = scan.withColumn(
        "modification_datetime",
        F.expr(
            "modification_datetime"
            " + if(doc_id % 3 = 0, make_interval(0,0,0,0,1,0,0), make_interval(0,0,0,0,0,0,0))"
        ),
    )
    _land_arrivals(
        src,
        [
            scan.filter(F.col("doc_id") % 2 == 0).drop("doc_id"),
            fresh.drop("doc_id"),
        ],
    )

    table = FilesTable(spark, os.path.join(base, "files_db"))
    inc.stream_index(
        spark,
        inc.read_scan_stream(spark, src, max_files_per_trigger=1),
        table,
        checkpoint_dir=os.path.join(base, "ckpt"),
        max_checksum_size=-1,  # metadata-only: scanned paths aren't real files
    )
    return (
        table.read()
        .select("path", "filename", "modification_datetime", "file_size")
        .orderBy("filename")
    )


@register(
    "st3_stateful_sessions",
    f"""
    WITH flagged AS (
        SELECT *,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                            > {ev.SESSION_GAP_MINUTES} * 60 * 1000000
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
        SELECT *,
               CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
        FROM flagged
    )
    SELECT user_id, session_seq,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           COUNT(*) AS n_events,
           round(SUM(value), 4) AS total_value
    FROM sessions
    GROUP BY user_id, session_seq
    ORDER BY user_id, session_seq
    """,
)
def st3_stateful_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST3: custom stateful operator — applyInPandasWithState keeps one
    state row per user and emits updated session rows per micro-batch.
    Two chronological arrivals split mid-stream, so sessions spanning
    the split are carried across batches by state. The last emit per
    (user, session) — the max-n_events row, since a session's count
    only grows — must equal the batch gaps-and-islands sessionizer (e1
    minus its n_event_types column, which streaming state doesn't keep).
    """
    import os

    from file_indexer_spark.streaming import sessions as ss
    from file_indexer_spark.streaming import windows as sw

    tune_session(spark)
    base, tag = _stream_workdir("fis_st3", sf_dir)
    src = os.path.join(base, "src")
    ev2 = events_df(spark, sf_dir)
    mid = ev2.agg(F.max("event_id")).first()[0] // 2
    # event_id order == ts order in the driver's events testdata, so an
    # event_id split gives chronological arrivals (state semantics need
    # in-order delivery; out-of-order handling is the watermark's job)
    _land_arrivals(
        src, [ev2.filter(F.col("event_id") <= mid), ev2.filter(F.col("event_id") > mid)]
    )
    stream = sw.read_events_stream(spark, src, max_files_per_trigger=1)
    sink = f"st3_sink_{tag}"
    q = (
        ss.sessionize_stream(stream)
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.table(sink)
        .groupBy("user_id", "session_seq")
        .agg(
            F.min("session_start").alias("session_start"),
            F.max("session_end").alias("session_end"),
            F.max("n_events").alias("n_events"),
            F.max_by("total_value", "n_events").alias("total_value"),
        )
        .orderBy("user_id", "session_seq")
    )


# ---------------------------------------------------------- M2/M3/M4

@register(
    "m2_media_decode",
    """
    SELECT doc_id AS media_id,
           'image' AS media_type,
           CASE WHEN doc_id % 11 = 0 OR doc_id % 7 = 0 THEN NULL
                ELSE CAST(4 + doc_id % 13 AS INTEGER) END AS width,
           CASE WHEN doc_id % 11 = 0 OR doc_id % 7 = 0 THEN NULL
                ELSE CAST(3 + doc_id % 7 AS INTEGER) END AS height,
           CASE WHEN doc_id % 11 = 0 OR doc_id % 7 = 0 THEN NULL
                ELSE CAST(1 + doc_id % 4 AS INTEGER) END AS channels,
           CASE WHEN doc_id % 11 = 0 OR doc_id % 7 = 0 THEN NULL
                ELSE CAST(octet_length(encode(text)) AS BIGINT) END AS payload_bytes,
           CASE WHEN doc_id % 11 = 0 THEN 'null content'
                WHEN doc_id % 7 = 0 THEN 'truncated header'
                ELSE NULL END AS decode_error
    FROM documents
    ORDER BY media_id
    """,
)
def m2_media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M2: binary → typed metadata through the real mapInPandas decode
    stage (Arrow batches, error column instead of task failure). The
    blob corpus is derived deterministically from documents, so the
    DuckDB oracle recomputes every decoded field — including both error
    classes — straight from doc_id/text without touching binaries."""
    from file_indexer_spark.operators import multimodal as mm

    media = mm.fake_media_from_docs(_table(spark, sf_dir, "documents"))
    return mm.decode_media(media).orderBy("media_id")


@register(
    "m2b_ppm_decode",
    """
    -- real-codec gate: the engine decodes spec-valid binary PPM (P6)
    -- blobs with a pure-Python parser; the oracle recomputes every
    -- field from the deterministic doc_id derivation.
    SELECT doc_id AS media_id,
           'image' AS media_type,
           CASE WHEN doc_id % 11 = 0 OR doc_id % 7 = 0 OR doc_id % 5 = 0 THEN NULL
                ELSE CAST(1 + doc_id % 8 AS INTEGER) END AS width,
           CASE WHEN doc_id % 11 = 0 OR doc_id % 7 = 0 OR doc_id % 5 = 0 THEN NULL
                ELSE CAST(1 + doc_id % 5 AS INTEGER) END AS height,
           CASE WHEN doc_id % 11 = 0 OR doc_id % 7 = 0 OR doc_id % 5 = 0 THEN NULL
                ELSE CAST(3 AS INTEGER) END AS channels,
           CASE WHEN doc_id % 11 = 0 OR doc_id % 7 = 0 OR doc_id % 5 = 0 THEN NULL
                ELSE CAST((1 + doc_id % 8) * (1 + doc_id % 5) * 3 AS BIGINT)
           END AS payload_bytes,
           CASE WHEN doc_id % 11 = 0 THEN 'null content'
                WHEN doc_id % 7 = 0 THEN 'not a PPM'
                WHEN doc_id % 5 = 0 THEN 'truncated payload'
                ELSE NULL END AS decode_error
    FROM documents
    ORDER BY media_id
    """,
)
def m2b_ppm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M2b: REAL image decode — binary PPM (P6) blobs parsed by the
    pure-Python spec decoder (``multimodal._decode_ppm``) through the
    same mapInPandas/DECODED_SCHEMA contract as m2. Three error classes
    (null blob, wrong magic, truncated raster) are data, not failures."""
    from file_indexer_spark.operators import multimodal as mm

    media = mm.ppm_media_from_docs(_table(spark, sf_dir, "documents"))
    return mm.decode_image_real(media).orderBy("media_id")


# shared by m6 (per-image aHash) and m6b (the duplicate groups over it)
_M6_CTES = """base AS (
        SELECT doc_id, text, length(text) AS L,
               1 + doc_id % 8 AS w, 1 + doc_id % 5 AS h
        FROM documents),
    valid AS (
        SELECT doc_id, w, h, w * h AS n,
               list_transform(range(0, w * h), i ->
                   ascii(substr(text, CAST(((3 * i) % L) + 1 AS BIGINT), 1))
                 + ascii(substr(text, CAST(((3 * i + 1) % L) + 1 AS BIGINT), 1))
                 + ascii(substr(text, CAST(((3 * i + 2) % L) + 1 AS BIGINT), 1))
               ) AS grays
        FROM base
        WHERE doc_id % 11 <> 0 AND doc_id % 7 <> 0 AND doc_id % 5 <> 0),
    tot AS (SELECT *, list_sum(grays) AS total FROM valid),
    hashed AS (
        SELECT doc_id, w, h, n,
               list_sum(list_transform(range(0, least(n, 63)), i ->
                   CASE WHEN grays[CAST(i + 1 AS BIGINT)] * n >= total
                        THEN (1::BIGINT << CAST(i AS INTEGER)) ELSE 0 END)) AS ahash
        FROM tot)"""


@register(
    "m6_image_ahash",
    f"""
    -- Perceptual average-hash from DECODED PPM pixels: grayscale =
    -- integer r+g+b per pixel, bit i set iff gray_i * n >= total
    -- (integer-exact "above mean"), LSB-first in raster order. The
    -- oracle recomputes every bit from the fixture derivation
    -- (raster byte j = text byte j mod len — ASCII-asserted corpus).
    WITH {_M6_CTES}
    SELECT doc_id AS media_id,
           CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
           CAST(n AS INTEGER) AS n_pixels, CAST(ahash AS BIGINT) AS ahash,
           CAST(NULL AS VARCHAR) AS decode_error
    FROM hashed
    UNION ALL
    SELECT doc_id, NULL, NULL, NULL, NULL,
           CASE WHEN doc_id % 11 = 0 THEN 'null content'
                WHEN doc_id % 7 = 0 THEN 'not a PPM'
                ELSE 'truncated payload' END
    FROM documents WHERE doc_id % 11 = 0 OR doc_id % 7 = 0 OR doc_id % 5 = 0
    ORDER BY media_id
    """,
)
def m6_image_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M6 (gate-legacy fingerprint — the API default is the canonical
    ahash64, see m6c): codec-free perceptual image fingerprinting over
    the REAL decoded PPM corpus at native resolution. Integer-exact
    bits, so the approximate-perception operator is still hash-gated."""
    from file_indexer_spark.operators import multimodal as mm

    media = mm.ppm_media_from_docs(_table(spark, sf_dir, "documents"))
    return mm.image_ahash_legacy63(media).orderBy("media_id")


@register(
    "m6b_image_dup_groups",
    f"""
    -- Perceptual duplicate groups: images sharing (w, h, ahash) — the
    -- reference's checksum duplicate-groups shape (J2) on image
    -- content; min media_id is the canonical keeper.
    WITH {_M6_CTES}
    SELECT CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
           CAST(ahash AS BIGINT) AS ahash,
           CAST(COUNT(*) AS BIGINT) AS n_images,
           MIN(doc_id) AS canonical_media_id
    FROM hashed GROUP BY w, h, ahash HAVING COUNT(*) >= 2
    ORDER BY width, height, ahash
    """,
)
def m6b_image_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M6b (gate-legacy grouping — the API default groups on ahash64,
    see m6d): image duplicate groups over the native-resolution aHash
    fingerprints — one hash-shuffle on the (w, h, ahash) key, J2's
    groups shape on perceptual image content."""
    from file_indexer_spark.operators import multimodal as mm

    media = mm.ppm_media_from_docs(_table(spark, sf_dir, "documents"))
    return mm.image_duplicate_groups_legacy63(media)


# shared by m6c (canonical per-image hash) and m6d (the resolution-
# invariant duplicate groups over it).  The oracle recomputes the 8x8
# lattice hash ONCE per document from base geometry: a pixel-replicated
# upscale samples the identical source pixels (((a*s)//8)//s == a//8),
# so both the base row and the scaled-copy row carry the same 64 bits.
_M6C_CTES = """base AS (
        SELECT doc_id, text, length(text) AS L,
               4 + doc_id % 5 AS w0, 4 + doc_id % 3 AS h0,
               2 + doc_id % 2 AS s
        FROM documents),
    pix AS (  -- lattice source-pixel index per grid cell (ty*8+tx)
        SELECT doc_id, text, L, w0, h0, s,
               list_transform(range(0, 64), i ->
                   ((i // 8) * h0 // 8) * w0 + ((i % 8) * w0 // 8)) AS pidx
        FROM base),
    g AS (
        -- greatest(L, 1) mirrors the engine's empty-text guard
        -- (raw or b'\\x00'): substr past an empty text is '' and
        -- ascii('') = 0, exactly the tiled zero byte
        SELECT doc_id, w0, h0, s,
               list_transform(pidx, p ->
                   ascii(substr(text, CAST((3 * p) % greatest(L, 1) + 1 AS BIGINT), 1))
                 + ascii(substr(text, CAST((3 * p + 1) % greatest(L, 1) + 1 AS BIGINT), 1))
                 + ascii(substr(text, CAST((3 * p + 2) % greatest(L, 1) + 1 AS BIGINT), 1))
               ) AS grays
        FROM pix),
    tot AS (SELECT *, list_sum(grays) AS total FROM g),
    hashed AS (  -- two 32-bit words dodge the signed-BIGINT bit-63 cap
        SELECT doc_id, w0, h0, s,
               CAST(list_sum(list_transform(range(0, 32), i ->
                   CASE WHEN grays[CAST(i + 1 AS BIGINT)] * 64 >= total
                        THEN (1::BIGINT << CAST(i AS INTEGER)) ELSE 0 END))
                    AS BIGINT) AS lo,
               CAST(list_sum(list_transform(range(32, 64), i ->
                   CASE WHEN grays[CAST(i + 1 AS BIGINT)] * 64 >= total
                        THEN (1::BIGINT << CAST(i - 32 AS INTEGER)) ELSE 0 END))
                    AS BIGINT) AS hi
        FROM tot),
    fp AS (
        SELECT doc_id * 2 AS media_id, CAST(w0 AS INTEGER) AS width,
               CAST(h0 AS INTEGER) AS height,
               printf('%08x%08x', hi, lo) AS ahash64
        FROM hashed
        UNION ALL
        SELECT doc_id * 2 + 1, CAST(w0 * s AS INTEGER),
               CAST(h0 * s AS INTEGER), printf('%08x%08x', hi, lo)
        FROM hashed)"""


@register(
    "m6c_image_ahash_canonical",
    f"""
    -- Canonical 8x8 aHash: nearest-neighbor lattice pooling (m5's
    -- resize rule) + integer above-mean bits, full 64 bits as a hex
    -- string.  Resolution-invariant BY FLOOR-DIV IDENTITY, so the
    -- oracle computes one hash per doc and both the base and the
    -- pixel-replicated scaled copy carry it.
    WITH {_M6C_CTES}
    SELECT media_id, width, height, ahash64,
           CAST(NULL AS VARCHAR) AS decode_error
    FROM fp ORDER BY media_id
    """,
)
def m6c_image_ahash_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M6c: canonical resolution-invariant perceptual hash — the m5
    fixed-grid pooling composed into m6, 64 full bits as hex (clears
    the 63-pixel signed-long cap the round-5 verdict flagged). Gated on
    the mixed-resolution fixture where every doc ships a base image AND
    a 2x/3x pixel-replicated copy: the pair MUST collide, and does,
    bit-exactly in both engines."""
    from file_indexer_spark.operators import multimodal as mm

    media = mm.ppm_multires_media_from_docs(_table(spark, sf_dir, "documents"))
    return mm.image_ahash_canonical(media).orderBy("media_id")


@register(
    "m6d_image_dup_groups_canonical",
    f"""
    -- Resolution-invariant duplicate groups: key is ahash64 ALONE
    -- (scaled copies land in one group — the fix for m6b's
    -- same-resolution-only grouping).
    WITH {_M6C_CTES}
    SELECT ahash64, CAST(COUNT(*) AS BIGINT) AS n_images,
           MIN(media_id) AS canonical_media_id
    FROM fp GROUP BY ahash64 HAVING COUNT(*) >= 2
    ORDER BY ahash64
    """,
)
def m6d_image_dup_groups_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M6d: m6b's grouping re-gated on the canonical fingerprint —
    every base/scaled pair groups together across resolutions; one
    hash-shuffle on the 16-char key."""
    from file_indexer_spark.operators import multimodal as mm

    media = mm.ppm_multires_media_from_docs(_table(spark, sf_dir, "documents"))
    return mm.image_duplicate_groups_canonical(media)


@register(
    "m3_frame_sampling",
    """
    -- documents.text is pure ASCII in the driver's testdata (asserted:
    -- octet_length(encode(text)) == length(text) at every sf), so
    -- VARCHAR slicing/md5 here equals the engine's byte slicing/md5.
    WITH blobs AS (
        SELECT doc_id AS media_id, text AS payload
        FROM documents
        WHERE doc_id % 11 <> 0 AND doc_id % 7 <> 0
    ),
    nums AS (  -- bounded frame-index domain (DuckDB's generate_series
               -- can't take lateral column args); 4096 frames covers
               -- 128 KB payloads, far above any documents row
        SELECT CAST(range AS BIGINT) AS i FROM range(0, 4096, 2)
    ),
    frames AS (
        SELECT b.media_id, CAST(n.i AS INTEGER) AS frame_index,
               substring(b.payload, CAST(1 + n.i * 32 AS BIGINT), 32) AS frame
        FROM blobs b JOIN nums n ON n.i < length(b.payload) // 32
    )
    SELECT media_id, frame_index,
           md5(frame) AS frame_md5,
           CAST(length(frame) AS BIGINT) AS frame_len
    FROM frames
    ORDER BY media_id, frame_index
    """,
)
def m3_frame_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M3: 1→N frame explosion (every 2nd 32-byte frame of each payload)
    through the mapInPandas sampling stage — partition-local, no shuffle.
    Frames are compared by md5+length so the oracle diff never ships raw
    binaries through the canonicalizer."""
    from file_indexer_spark.operators import multimodal as mm

    media = mm.fake_media_from_docs(_table(spark, sf_dir, "documents"))
    frames = mm.sample_frames(media, frame_size=32, every_k=2)
    return frames.select(
        "media_id",
        "frame_index",
        F.md5("frame").alias("frame_md5"),
        F.octet_length("frame").cast("long").alias("frame_len"),
    ).orderBy("media_id", "frame_index")


@register(
    "m4_media_features",
    """
    -- The featurizer's cross-engine-checkable contract: exact null
    -- classes (null/truncated blobs -> null vector), fixed dimension,
    -- and unit L2 norm (sum of squares rounds to 1.0 at 4 dp for any
    -- non-degenerate float32 unit vector). The chunk-mean VALUES are
    -- pinned by tests/test_multimodal.py and by flowing the embeddings
    -- through the similarity operators.
    SELECT doc_id AS media_id,
           CASE WHEN doc_id % 11 = 0 OR doc_id % 7 = 0 THEN NULL
                ELSE CAST(64 AS INTEGER) END AS dim,
           CASE WHEN doc_id % 11 = 0 OR doc_id % 7 = 0 THEN NULL
                ELSE CAST(1.0 AS DOUBLE) END AS sq_norm
    FROM documents
    ORDER BY media_id
    """,
)
def m4_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from file_indexer_spark.operators import multimodal as mm

    media = mm.fake_media_from_docs(_table(spark, sf_dir, "documents"))
    feats = mm.extract_features(media)
    return feats.select(
        "media_id",
        F.size("embedding").alias("dim"),
        F.round(F.aggregate("embedding", F.lit(0.0), lambda a, x: a + x * x), 4).alias(
            "sq_norm"
        ),
    ).orderBy("media_id")


@register(
    "m5_media_resize",
    """
    -- Nearest-neighbor 2x2 resize of the FAKE_MEDIA_FORMAT corpus,
    -- hash-checked at the pixel level: the oracle re-derives each
    -- sampled pixel straight from documents.text (pure ASCII, so
    -- VARCHAR slicing == byte slicing) and md5s the same 4-pixel
    -- payload the engine re-encodes.
    WITH m AS (
        SELECT doc_id AS media_id,
               4 + doc_id % 13 AS w,
               3 + doc_id % 7  AS h,
               1 + doc_id % 4  AS c,
               text AS t,
               CASE WHEN doc_id % 11 = 0 OR doc_id % 7 = 0 THEN 'undecodable'
                    WHEN length(text) <
                         (4 + doc_id % 13) * (3 + doc_id % 7) * (1 + doc_id % 4)
                         THEN 'payload/geometry mismatch'
                    ELSE NULL END AS resize_error
        FROM documents
    )
    SELECT media_id,
           resize_error,
           CASE WHEN resize_error IS NULL THEN md5(
                    substring(t, ((0 * w + 0) * c) + 1, c)
                 || substring(t, ((0 * w + (w // 2)) * c) + 1, c)
                 || substring(t, (((h // 2) * w + 0) * c) + 1, c)
                 || substring(t, (((h // 2) * w + (w // 2)) * c) + 1, c))
           END AS pixels_md5,
           CASE WHEN resize_error IS NULL THEN CAST(12 + 4 * c AS BIGINT)
           END AS blob_len
    FROM m
    ORDER BY media_id
    """,
)
def m5_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M5: resize stage gate — blobs through the partition-local
    mapInPandas nearest-neighbor downsample, compared by md5 of the
    re-encoded pixel payload (bytes 13.. of the output blob) so the
    pixel-sampling arithmetic itself is oracle-checked, not just the
    error taxonomy."""
    from file_indexer_spark.operators import multimodal as mm

    media = mm.fake_media_from_docs(_table(spark, sf_dir, "documents"))
    resized = mm.resize_media(media, target_width=2, target_height=2)
    return resized.select(
        "media_id",
        "resize_error",
        F.md5(F.expr("substring(content, 13)")).alias("pixels_md5"),
        F.octet_length("content").cast("long").alias("blob_len"),
    ).orderBy("media_id")


# ----------------------------------------- LLM pillar: dedup materialization

_DD7_PAIRS_CTES = f"""
    sets AS (SELECT doc_id, {H.duck_shingle_hashes()} AS shingles FROM documents),
    sigs AS (SELECT doc_id, shingles, {H.duck_minhash_sig("shingles")} AS sig FROM sets),
    bands AS (SELECT doc_id, j AS band, {H.duck_band_hash("sig", "j")} AS digest
              FROM sigs, range(0, {H.LSH_BANDS}) t(j)),
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             FROM bands a JOIN bands b
               ON a.band = b.band AND a.digest = b.digest AND a.doc_id < b.doc_id),
    verified AS (
        SELECT doc_a, doc_b,
               len(list_intersect(sa.shingles, sb.shingles)) AS inter,
               len(sa.shingles) AS na, len(sb.shingles) AS nb
        FROM cand
        JOIN sets sa ON sa.doc_id = doc_a
        JOIN sets sb ON sb.doc_id = doc_b),
    pairs AS (
        SELECT doc_a, doc_b FROM verified
        WHERE CAST(inter AS DOUBLE) / CAST(na + nb - inter AS DOUBLE)
              >= {dd.JACCARD_THRESHOLD})
"""


@register(
    "dd7_dedup_clusters",
    f"""
    -- Connected components over the dd3 near-dup pair graph, computed
    -- exactly by a recursive transitive closure; cluster label = min
    -- reachable doc_id, canonical = the label holder (the doc a
    -- training pipeline keeps).
    WITH RECURSIVE
    {_DD7_PAIRS_CTES},
    edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
              UNION SELECT doc_b, doc_a FROM pairs),
    reach(src, dst) AS (
        SELECT src, dst FROM edges
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
        WHERE e.dst <> r.src
    ),
    labels AS (
        SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
        FROM reach GROUP BY src
    )
    SELECT d.doc_id,
           coalesce(l.cluster_id, d.doc_id) AS cluster_id,
           d.doc_id = coalesce(l.cluster_id, d.doc_id) AS is_canonical
    FROM documents d LEFT JOIN labels l ON l.doc_id = d.doc_id
    ORDER BY d.doc_id
    """,
)
def dd7_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DD7: near-dup pairs → cluster assignment + canonical selection
    (alternating large-star/small-star contraction over the pair
    subgraph, O(log n) rounds; the oracle recomputes components exactly
    via a recursive CTE)."""
    docs = _table(spark, sf_dir, "documents")
    return dd.dedup_clusters(docs, dd.minhash_lsh_pairs(docs))


# ----------------------------------------- LLM pillar: sampling / splits

from file_indexer_spark.operators import sampling as sp  # noqa: E402


@register(
    "sp1_hash_split",
    f"""
    -- Content-stable train/val/test assignment: first hex byte of
    -- md5(doc_id) → [00,10) test, [10,20) val, rest train. Pure
    -- function of the key — identical in any engine (no RNG).
    WITH tagged AS (
        SELECT CASE WHEN substring(md5(doc_id::VARCHAR), 1, 2) < '{sp.TEST_UPPER}' THEN 'test'
                    WHEN substring(md5(doc_id::VARCHAR), 1, 2) < '{sp.VAL_UPPER}' THEN 'val'
                    ELSE 'train' END AS split,
               len(string_split(text, ' ')) AS n_tokens,
               source
        FROM documents)
    SELECT split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
    FROM tagged GROUP BY split ORDER BY split
    """,
)
def sp1_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sp.hash_split(_table(spark, sf_dir, "documents"))


@register(
    "sp2_source_cap",
    """
    -- Cap every source at 20 docs: keep the md5-ordered prefix (a
    -- deterministic unbiased sample), the guard against one crawl
    -- source dominating the training mixture.
    SELECT doc_id, source FROM (
        SELECT doc_id, source,
               row_number() OVER (PARTITION BY source
                                  ORDER BY md5(doc_id::VARCHAR), doc_id) AS rk
        FROM documents) WHERE rk <= 20
    ORDER BY doc_id
    """,
)
def sp2_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sp.source_cap_sample(_table(spark, sf_dir, "documents"), cap=20).orderBy("doc_id")


@register(
    "sp3_sequence_packing",
    f"""
    -- Concat-and-chunk packing plan: 16 independent token streams
    -- (first hex char of md5(doc_id)), each concatenated in doc_id
    -- order and cut into {sp.PACK_BUDGET}-token sequences. Window
    -- cumsum is the whole computation.
    WITH d AS (
        SELECT doc_id,
               substring(md5(doc_id::VARCHAR), 1, 1) AS packer,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents),
    c AS (
        SELECT doc_id, packer, n_tokens,
               CAST(SUM(n_tokens) OVER (PARTITION BY packer ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        FROM d)
    SELECT doc_id, packer, n_tokens,
           CAST((cum - n_tokens) // {sp.PACK_BUDGET} AS BIGINT) AS seq_first,
           CAST((cum - 1) // {sp.PACK_BUDGET} AS BIGINT) AS seq_last,
           CAST((cum - n_tokens) % {sp.PACK_BUDGET} AS BIGINT) AS seq_offset
    FROM c
    ORDER BY doc_id
    """,
)
def sp3_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SP3: the physical layout for GPT-style packed pretraining
    sequences — which fixed-budget sequences each document spans, per
    content-stable packer stream."""
    return sp.sequence_pack(_table(spark, sf_dir, "documents")).orderBy("doc_id")


@register(
    "st4_streaming_dedup",
    """
    -- Final pass-through set of a dedup-at-ingestion stream: exactly
    -- one row per distinct content hash, regardless of how many
    -- arrivals carried the same text.
    SELECT DISTINCT md5(text) AS content_hash
    FROM documents
    ORDER BY content_hash
    """,
)
def st4_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST4: stateful streaming exact-dedup run as a REAL stream — two
    overlapping arrivals (two-thirds of the corpus, then all of it), so
    the dedup state must filter re-arrivals across micro-batches; the
    oracle is the batch distinct-hash set."""
    import os

    from file_indexer_spark.streaming import dedup as sd

    tune_session(spark)
    base, tag = _stream_workdir("fis_st4", sf_dir)
    src = os.path.join(base, "src")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    _land_arrivals(
        src,
        [docs.filter(F.col("doc_id") % 3 != 0), docs],
    )
    stream = sd.read_docs_stream(spark, src, max_files_per_trigger=1)
    sink = f"st4_sink_{tag}"
    sd.run_to_memory_sink(sd.dedup_stream(stream), sink)
    return spark.table(sink).orderBy("content_hash")


@register(
    "e6_retention_cohorts",
    """
    WITH weeks AS (
        SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS TIMESTAMP) AS week
        FROM events),
    cohort AS (SELECT user_id, MIN(week) AS cohort_week FROM weeks GROUP BY user_id)
    SELECT c.cohort_week,
           CAST(date_diff('day', c.cohort_week, w.week) / 7 AS INTEGER) AS week_offset,
           CAST(COUNT(DISTINCT w.user_id) AS BIGINT) AS active_users
    FROM weeks w JOIN cohort c USING (user_id)
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def e6_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E6: weekly cohort retention over the events stream."""
    return ev.retention_cohorts(events_df(spark, sf_dir))


@register(
    "sim4_filtered_ann",
    f"""
    -- Attribute-filtered vector search: the same exact cosine top-k as
    -- sim1 but the CORPUS is restricted by a metadata predicate
    -- (even labels) while the query set stays fixed — the "filtered
    -- ANN" shape every vector store exposes. The filter composes with
    -- the scan (predicate pushdown), not with post-ranking.
    WITH c0 AS ({_DUCK_NORMS}),
    c AS (SELECT c0.* FROM c0 JOIN embeddings e ON e.vec_id = c0.vec_id
          WHERE e.label % 2 = 0),
    q AS (SELECT * FROM c0 WHERE vec_id < {sim.N_QUERIES}),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               {_DUCK_DOT.format(a="q.embedding", b="c.embedding")} / (q.norm * c.norm)
                   AS cosine
        FROM q, c
        WHERE c.vec_id != q.vec_id),
    ranked AS (
        SELECT query_id, neighbor_id,
               CAST(row_number() OVER (PARTITION BY query_id
                    ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rank,
               cosine
        FROM scored)
    SELECT query_id, neighbor_id, rank, round(cosine, 6) AS cosine
    FROM ranked WHERE rank <= {sim.TOP_K}
    ORDER BY query_id, rank
    """,
)
def sim4_filtered_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _table(spark, sf_dir, "embeddings")
    return sim.cosine_topk(
        emb.filter(F.col("label") % 2 == 0),
        queries=emb.filter(F.col("vec_id") < sim.N_QUERIES),
    )


@register(
    "t5_quality_retention",
    f"""
    -- t2's quality filter materialized: per-source doc/token retention
    -- after dropping low-quality docs — the filter-impact review table.
    WITH m AS (
        SELECT doc_id, source,
               CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
               CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER) AS n_distinct_tokens,
               CAST(len(list_filter(string_split(text, ' '), t -> t IN ({_STOP_SQL}))) AS INTEGER)
                   AS n_stopwords
        FROM documents),
    flagged AS (
        SELECT doc_id, source, n_tokens,
               (0.5 * (CAST(n_distinct_tokens AS DOUBLE) / CAST(n_tokens AS DOUBLE))
                + 0.3 * (1.0 - CAST(n_stopwords AS DOUBLE) / CAST(n_tokens AS DOUBLE))
                + 0.2 * least(CAST(n_tokens AS DOUBLE) / 300.0, 1.0)) < 0.5 AS low_quality
        FROM m)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(*) FILTER (NOT low_quality) AS BIGINT) AS n_kept,
           round(CAST(COUNT(*) FILTER (NOT low_quality) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS doc_retention,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(CASE WHEN NOT low_quality THEN n_tokens ELSE 0 END) AS BIGINT)
               AS kept_tokens
    FROM flagged GROUP BY source ORDER BY source
    """,
)
def t5_quality_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tx.quality_retention(_table(spark, sf_dir, "documents"))


@register(
    "w2_two_phase_roundtrip",
    """
    -- Two-phase indexing end-to-end: after phase 1 (metadata only) and
    -- phase 2 (hash ONLY sizes holding >1 file), exactly the
    -- duplicate-size files carry checksums — the reference's ~95%
    -- I/O-avoidance contract, recomputed independently by the oracle.
    WITH docs AS (
        SELECT doc_id, text, octet_length(encode(text)) AS fs FROM documents),
    sizes AS (SELECT fs, COUNT(*) AS n FROM docs GROUP BY fs)
    SELECT 'doc_' || CAST(d.doc_id AS VARCHAR) || '.txt' AS filename,
           CAST(d.fs AS BIGINT) AS file_size,
           CASE WHEN s.n > 1 AND d.fs > 0 THEN sha256(d.text) END AS checksum
    FROM docs d JOIN sizes s ON s.fs = d.fs
    ORDER BY filename
    """,
)
def w2_two_phase_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: the D2 two-phase pipeline under the gate — phase 1 indexes
    metadata with hashing off, phase 2's A7 work selection hashes only
    duplicate-size candidates; the oracle recomputes which files must
    (and must not) have checksums straight from the size histogram."""
    import hashlib
    import os
    import shutil
    import tempfile

    from file_indexer_spark.indexer.files_table import FilesTable
    from file_indexer_spark.indexer.two_phase import two_phase_index

    tune_session(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    base = os.path.join(tempfile.gettempdir(), f"fis_w2_{tag}")
    tree = os.path.join(base, "tree")
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(tree)
    for r in docs:
        with open(os.path.join(tree, f"doc_{r['doc_id']}.txt"), "w", encoding="utf-8") as fh:
            fh.write(r["text"])

    table = FilesTable(spark, os.path.join(base, "files_db"))
    two_phase_index(spark, table, tree)
    return table.read().select("filename", "file_size", "checksum").orderBy("filename")


# ======================================================================
# Corpus-curation extension (SURVEY.md §2.9a, round 3): decontamination,
# PII scrubbing, repetition filtering, chunking, mixture resampling, and
# SemDeDup-style embedding-cluster dedup — the curation passes between
# raw ingestion and packing in a training-data pipeline.

from file_indexer_spark.operators import curation as cu  # noqa: E402


@register(
    "ct1_contamination",
    f"""
    WITH sets AS (
        SELECT doc_id,
               substring(md5(doc_id::VARCHAR), 1, 1) = '{cu.BENCH_HEX}' AS is_bench,
               {H.duck_shingle_hashes()} AS shingles
        FROM documents),
    bench AS (
        SELECT DISTINCT h FROM (
            SELECT unnest(shingles) AS h FROM sets WHERE is_bench) t),
    cand AS (
        SELECT doc_id, unnest(shingles) AS h FROM sets WHERE NOT is_bench)
    SELECT c.doc_id,
           COUNT(*)::BIGINT AS n_shingles,
           COUNT(b.h)::BIGINT AS n_overlap,
           round(COUNT(b.h)::DOUBLE / COUNT(*), 6) AS overlap_frac,
           COUNT(b.h)::DOUBLE / COUNT(*) >= {cu.CONTAMINATION_THRESHOLD} AS contaminated
    FROM cand c LEFT JOIN bench b ON c.h = b.h
    GROUP BY c.doc_id
    ORDER BY c.doc_id
    """,
)
def ct1_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cu.benchmark_contamination(_table(spark, sf_dir, "documents"))


@register(
    "ct2_pii_scrub",
    f"""
    SELECT source,
           COUNT(*)::BIGINT AS n_docs,
           SUM(CASE WHEN len(regexp_extract_all(text, '{cu.EMAIL_PAT}')) > 0
                    THEN 1 ELSE 0 END)::BIGINT AS docs_with_email,
           SUM(CASE WHEN len(regexp_extract_all(text, '{cu.IPV4_PAT}')) > 0
                    THEN 1 ELSE 0 END)::BIGINT AS docs_with_ip,
           SUM(CASE WHEN len(regexp_extract_all(text, '{cu.BLOCKED_PAT}')) > 0
                    THEN 1 ELSE 0 END)::BIGINT AS docs_with_blocked,
           SUM(len(regexp_extract_all(text, '{cu.BLOCKED_PAT}')))::BIGINT
               AS total_blocked_hits,
           SUM(length(text) - length(regexp_replace(text, '{cu.BLOCKED_PAT}', '', 'g')))::BIGINT
               AS total_redacted_chars
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
)
def ct2_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cu.pii_scrub(_table(spark, sf_dir, "documents"))


@register(
    "ct3_repetition_stats",
    f"""
    WITH words AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    tok AS (SELECT doc_id, unnest(ws) AS w FROM words),
    topw AS (
        SELECT doc_id, SUM(c)::BIGINT AS n_tokens, MAX(c)::BIGINT AS top_word_count
        FROM (SELECT doc_id, w, COUNT(*) AS c FROM tok GROUP BY doc_id, w) t
        GROUP BY doc_id),
    bg_list AS (
        SELECT doc_id,
               CASE WHEN len(ws) < 2 THEN []::VARCHAR[]
                    ELSE list_transform(range(1, len(ws)),
                                        i -> array_to_string(ws[i:i+1], ' '))
               END AS gs
        FROM words),
    bgs AS (SELECT doc_id, unnest(gs) AS g FROM bg_list),
    bg AS (
        SELECT doc_id, COUNT(*)::BIGINT AS n_bigrams,
               COUNT(DISTINCT g)::BIGINT AS n_distinct_bigrams
        FROM bgs GROUP BY doc_id)
    SELECT t.doc_id, n_tokens, top_word_count,
           round(top_word_count::DOUBLE / n_tokens, 6) AS top_word_frac,
           n_bigrams, n_distinct_bigrams,
           round(n_distinct_bigrams::DOUBLE / n_bigrams, 6) AS distinct_bigram_frac,
           (top_word_count::DOUBLE / n_tokens > {cu.TOP_WORD_FRAC_MAX}
            OR n_distinct_bigrams::DOUBLE / n_bigrams < {cu.DISTINCT_BIGRAM_FRAC_MIN})
               AS repetitive
    FROM topw t JOIN bg USING (doc_id)
    ORDER BY t.doc_id
    """,
)
def ct3_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cu.repetition_stats(_table(spark, sf_dir, "documents"))


@register(
    "ch1_token_chunking",
    f"""
    WITH words AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    st AS (
        SELECT doc_id, ws, unnest(range(0, len(ws), {cu.CHUNK_STRIDE})) AS start_token
        FROM words),
    ch AS (
        SELECT doc_id, start_token,
               ws[start_token + 1 : start_token + {cu.CHUNK_SIZE}] AS chunk
        FROM st)
    SELECT doc_id,
           (start_token // {cu.CHUNK_STRIDE})::BIGINT AS chunk_idx,
           start_token::BIGINT AS start_token,
           len(chunk)::BIGINT AS n_chunk_tokens,
           md5(array_to_string(chunk, ' ')) AS chunk_hash
    FROM ch
    ORDER BY doc_id, chunk_idx
    """,
)
def ch1_token_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cu.token_chunking(_table(spark, sf_dir, "documents"))


@register(
    "mx1_mixture_resample",
    f"""
    WITH tagged AS (
        SELECT source,
               (CAST(substring(source, 4) AS INT) % 4 + 1)::DOUBLE / 4.0 AS target_rate,
               ('0x' || substring(
                    md5(doc_id::VARCHAR || ':{cu.MIX_SALT}:' || source), 1, 4))::BIGINT
                 < CAST((CAST(substring(source, 4) AS INT) % 4 + 1)::DOUBLE / 4.0 * 65536
                        AS BIGINT) AS keep
        FROM documents)
    SELECT source, target_rate,
           COUNT(*)::BIGINT AS n_docs,
           SUM(CASE WHEN keep THEN 1 ELSE 0 END)::BIGINT AS n_kept,
           round(SUM(CASE WHEN keep THEN 1 ELSE 0 END)::DOUBLE / COUNT(*), 6)
               AS achieved_rate
    FROM tagged
    GROUP BY source, target_rate
    ORDER BY source
    """,
)
def mx1_mixture_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cu.mixture_resample(_table(spark, sf_dir, "documents"))


@register(
    "sd1_semantic_dedup",
    f"""
    WITH c AS ({_DUCK_NORMS}),
    cents AS (SELECT c.vec_id AS centroid_id, c.embedding AS c_emb, c.norm AS c_norm
              FROM c
              JOIN (SELECT MIN(vec_id) AS vec_id FROM embeddings GROUP BY label) reps
                ON c.vec_id = reps.vec_id),
    assign AS (
        SELECT vec_id, centroid_id FROM (
            SELECT v.vec_id, cents.centroid_id,
                   row_number() OVER (PARTITION BY v.vec_id ORDER BY
                        {_DUCK_DOT.format(a="v.embedding", b="cents.c_emb")}
                        / (v.norm * cents.c_norm) DESC, cents.centroid_id) AS rn
            FROM c v, cents) t
        WHERE rn = 1),
    vecs AS (SELECT c.vec_id, c.embedding AS emb, c.norm AS nrm, a.centroid_id
             FROM c JOIN assign a ON a.vec_id = c.vec_id),
    pairs AS (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               {_DUCK_DOT.format(a="a.emb", b="b.emb")} / (a.nrm * b.nrm) AS cosine
        FROM vecs a JOIN vecs b
          ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id),
    dropped AS (
        SELECT DISTINCT vec_b AS vec_id FROM pairs
        WHERE cosine >= {sim.SEMDEDUP_COSINE})
    SELECT a.centroid_id,
           COUNT(*)::BIGINT AS n_vectors,
           COUNT(d.vec_id)::BIGINT AS n_dropped,
           (COUNT(*) - COUNT(d.vec_id))::BIGINT AS n_kept,
           round((COUNT(*) - COUNT(d.vec_id))::DOUBLE / COUNT(*), 6) AS retention
    FROM assign a LEFT JOIN dropped d ON d.vec_id = a.vec_id
    GROUP BY a.centroid_id
    ORDER BY a.centroid_id
    """,
)
def sd1_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sim.semantic_dedup(_table(spark, sf_dir, "embeddings"))


# ----------------------------------------- relational star joins (round 3)

from file_indexer_spark.operators import relational as rel  # noqa: E402

_REV_E4_SQL = """CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS BIGINT)"""


@register(
    "h1_regional_revenue",
    f"""
    SELECT n_name, {_REV_E4_SQL} AS revenue_e4
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue_e4 DESC, n_name
    """,
)
def h1_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape, DataFrame-native: bounded nation x region dim is
    force-broadcast; customer/supplier joins are left to AQE (they
    scale with the corpus); date predicates push into the fact scans."""
    tune_session(spark)
    return rel.regional_revenue(
        _table(spark, sf_dir, "customer"),
        _table(spark, sf_dir, "orders"),
        _table(spark, sf_dir, "lineitem"),
        _table(spark, sf_dir, "supplier"),
        _table(spark, sf_dir, "nation"),
        _table(spark, sf_dir, "region"),
    )


@register(
    "h2_returned_top_customers",
    f"""
    WITH per_customer AS (
        SELECT o_custkey, {_REV_E4_SQL} AS revenue_e4
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
        GROUP BY o_custkey
        ORDER BY revenue_e4 DESC, o_custkey
        LIMIT 20
    )
    SELECT c_custkey, c_name, revenue_e4,
           round(c_acctbal, 2) AS acctbal, n_name AS nation
    FROM per_customer
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    ORDER BY revenue_e4 DESC, c_custkey
    """,
)
def h2_returned_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: per-customer aggregate BEFORE the detail join,
    so the join input is one row per customer, not per lineitem."""
    tune_session(spark)
    return rel.returned_top_customers(
        _table(spark, sf_dir, "customer"),
        _table(spark, sf_dir, "orders"),
        _table(spark, sf_dir, "lineitem"),
        _table(spark, sf_dir, "nation"),
    )


@register(
    "h3_late_order_priorities",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o.o_orderkey AND l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def h3_late_order_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS rewritten as per-order max(l_shipdate)
    pre-aggregation + equi join (commit d930a12; the LeftSemi form
    hash-built the fact side — test_plans.py pins LeftSemi OUT of the
    plan)."""
    tune_session(spark)
    return rel.order_priority_counts(
        _table(spark, sf_dir, "orders"), _table(spark, sf_dir, "lineitem")
    )


@register(
    "h4_pricing_summary",
    """
    WITH l AS (
        SELECT l_returnflag, l_linestatus,
               CAST(round(l_quantity * 100) AS BIGINT) AS qty_e2,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS price_e2,
               CAST(round(l_discount * 100) AS BIGINT) AS disc_pct,
               CAST(round(l_tax * 100) AS BIGINT) AS tax_pct
        FROM lineitem
        WHERE l_shipdate < TIMESTAMP '2001-01-01 00:00:00'
    )
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(qty_e2) AS BIGINT) AS sum_qty_e2,
           CAST(SUM(price_e2) AS BIGINT) AS sum_base_price_e2,
           CAST(SUM(price_e2 * (100 - disc_pct)) AS BIGINT) AS sum_disc_price_e4,
           CAST(SUM(price_e2 * (100 - disc_pct) * (100 + tax_pct)) AS BIGINT)
               AS sum_charge_e6,
           round(CAST(SUM(qty_e2) AS DOUBLE) / COUNT(*) / 100.0, 4) AS avg_qty,
           round(CAST(SUM(price_e2) AS DOUBLE) / COUNT(*) / 100.0, 4) AS avg_price,
           COUNT(*) AS count_order
    FROM l
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def h4_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: one lineitem scan, one 6-group hash agg, every
    measure fixed-point BIGINT so partial-agg order can't drift."""
    tune_session(spark)
    return rel.pricing_summary(_table(spark, sf_dir, "lineitem"))


@register(
    "h5_shipping_priority",
    """
    SELECT o_orderkey, o_orderdate, o_orderpriority,
           CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT)
               AS revenue_e4
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1997-06-30 00:00:00'
      AND l.l_shipdate  > TIMESTAMP '1997-06-30 00:00:00'
    GROUP BY o_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue_e4 DESC, o_orderdate, o_orderkey
    LIMIT 10
    """,
)
def h5_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: segment-filtered customer → orders → lineitem,
    join strategy left to AQE (customer grows with SF — no forced
    broadcast); top-10 is TakeOrderedAndProject over O(orders) rows."""
    tune_session(spark)
    return rel.shipping_priority(
        _table(spark, sf_dir, "customer"),
        _table(spark, sf_dir, "orders"),
        _table(spark, sf_dir, "lineitem"),
    )


# ------------------------------------------------ events round-3 additions


@register(
    "e7_asof_last_view",
    """
    SELECT p.event_id, p.user_id, p.ts AS probe_ts, v.ts AS last_match_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND p.ts >= v.ts
    ORDER BY p.event_id
    """,
)
def e7_asof_last_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (purchase -> latest at-or-before view per user).
    Spark side is the union-and-window formulation (no join, one
    shuffle on user_id); the oracle is DuckDB's native ASOF LEFT JOIN,
    a genuine cross-engine semantics check."""
    return ev.asof_last_match(_events(spark, sf_dir))


@register(
    "e8_rolling_daily_value",
    f"""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               COUNT(*) AS day_events,
               round(SUM(value), 4) AS day_value
        FROM events GROUP BY 1, 2
    ),
    indexed AS (
        SELECT *, CAST(day - DATE '{ev.ROLLING_EPOCH}' AS INTEGER) AS day_idx
        FROM daily
    )
    SELECT event_type, day, day_events, day_value,
           CAST(SUM(day_events) OVER w AS BIGINT) AS trail_events,
           round(SUM(day_value) OVER w, 4) AS trail_value
    FROM indexed
    WINDOW w AS (PARTITION BY event_type ORDER BY day_idx
                 RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
    ORDER BY event_type, day
    """,
)
def e8_rolling_daily_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ev.rolling_daily_value(_events(spark, sf_dir))


# --------------------------------------------------- text round-3 addition


@register(
    "t6_length_percentiles",
    """
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           round(AVG(CAST(n_chars AS DOUBLE)), 4) AS mean_chars,
           round(quantile_cont(n_chars, 0.5), 4) AS p50_chars,
           round(quantile_cont(n_chars, 0.9), 4) AS p90_chars,
           round(quantile_cont(n_chars, 0.99), 4) AS p99_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
)
def t6_length_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentile profile per source (Spark percentile() has the
    same linear-interpolation semantics as DuckDB quantile_cont)."""
    return tx.length_percentiles(_table(spark, sf_dir, "documents"))


@register("t6a_length_percentiles_approx")
def t6a_length_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T6a: single-pass percentile_approx sketch variant — the 100 TB
    execution path for t6. No SQL oracle (sketch output is
    implementation-defined → rows-only driver check); pytest pins each
    approx percentile inside the exact distribution's neighborhood."""
    return tx.length_percentiles_approx(_table(spark, sf_dir, "documents"))


@register(
    "e9_preceding_window_counts",
    """
    WITH tagged AS (
        SELECT event_id, user_id, ts, event_type,
               epoch_us(ts) AS eus,
               CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS is_match
        FROM events WHERE event_type IN ('view', 'purchase')
    ),
    win AS (
        SELECT *,
               SUM(is_match) OVER (PARTITION BY user_id ORDER BY eus
                   RANGE BETWEEN 3600000000 PRECEDING AND 1 PRECEDING) AS v
        FROM tagged
    )
    SELECT event_id, user_id, ts AS probe_ts,
           COALESCE(CAST(v AS BIGINT), 0) AS n_matches
    FROM win WHERE event_type = 'purchase'
    ORDER BY event_id
    """,
)
def e9_preceding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-join semantics (matches within a trailing hour of each
    probe) as a RANGE window over epoch-microseconds — no theta-join,
    no nested loop; one shuffle on user_id."""
    return ev.preceding_window_counts(_events(spark, sf_dir))


@register(
    "w3_cleanup_roundtrip",
    """
    -- Cleanup end-to-end: after deleting one whole subdirectory and
    -- every 7th file of the other, exactly the untouched files remain
    -- indexed. The oracle recomputes the survivor set from documents.
    SELECT 'doc_' || CAST(doc_id AS VARCHAR) || '.txt' AS filename,
           CAST(octet_length(encode(text)) AS BIGINT) AS file_size
    FROM documents
    WHERE doc_id % 2 = 0 AND doc_id % 7 != 0
    ORDER BY filename
    """,
)
def w3_cleanup_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3: the D3/D4 cleanup pipeline under the gate, PROBE mode — no
    rescan; executors stat() DISTINCT directories first (one probe per
    dir; files under a missing dir are stale with zero per-file
    syscalls — the reference's directory-first optimization,
    indexer.py:1129-1205), then stat() only files in surviving dirs.

    Fixture: docs land in sub0 (even doc_id) / sub1 (odd); sub1 is
    rmtree'd wholesale and every 7th file of sub0 unlinked. The
    driver-side collect writes the fixture tree; the cleanup itself is
    the production path.
    """
    import hashlib
    import os
    import shutil
    import tempfile

    from file_indexer_spark.indexer.cleanup import probe_deleted_files
    from file_indexer_spark.indexer.files_table import FilesTable
    from file_indexer_spark.indexer.two_phase import update_index

    tune_session(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    base = os.path.join(tempfile.gettempdir(), f"fis_w3_{tag}")
    tree = os.path.join(base, "tree")
    shutil.rmtree(base, ignore_errors=True)
    for sub in ("sub0", "sub1"):
        os.makedirs(os.path.join(tree, sub))
    for r in docs:
        sub = "sub0" if r["doc_id"] % 2 == 0 else "sub1"
        with open(
            os.path.join(tree, sub, f"doc_{r['doc_id']}.txt"), "w", encoding="utf-8"
        ) as fh:
            fh.write(r["text"])

    table = FilesTable(spark, os.path.join(base, "files_db"))
    update_index(spark, table, tree, max_checksum_size=-1)  # metadata-only

    shutil.rmtree(os.path.join(tree, "sub1"))
    for r in docs:
        if r["doc_id"] % 2 == 0 and r["doc_id"] % 7 == 0:
            os.unlink(os.path.join(tree, "sub0", f"doc_{r['doc_id']}.txt"))

    stale = probe_deleted_files(table)
    table.delete(stale)
    return table.read().select("filename", "file_size").orderBy("filename")


_E10_SQL = """
    -- Sliding windows: each event belongs to the 4 hour-long windows
    -- whose 15-min-aligned starts cover it. time_bucket boundaries
    -- coincide with Spark's epoch-aligned windows (both origins sit on
    -- a 15-minute grid).
    WITH exploded AS (
        SELECT e.*,
               time_bucket(INTERVAL '15 minutes', ts)
                   - k * INTERVAL '15 minutes' AS window_start
        FROM events e, (SELECT UNNEST(generate_series(0, 3)) AS k) ks
    )
    SELECT window_start,
           window_start + INTERVAL '1 hour' AS window_end,
           event_type,
           COUNT(*) AS n_events,
           round(SUM(value), 4) AS total_value
    FROM exploded
    WHERE ts < window_start + INTERVAL '1 hour'
    GROUP BY 1, 2, 3
    ORDER BY 1, 3
"""


@register("e10_sliding_counts", _E10_SQL)
def e10_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping-window aggregation (1 h window, 15 min slide): the
    overlap explode is map-side; partial agg bounds the shuffle at
    O(types x windows)."""
    return ev.sliding_counts(_events(spark, sf_dir))


@register("st5_streaming_sliding", _E10_SQL)
def st5_streaming_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST5: the same sliding windows as a REAL stream (two file
    arrivals -> two micro-batches, availableNow, complete-mode memory
    sink) — one windowing semantics for batch and stream, both checked
    against the same DuckDB oracle."""
    import os

    from file_indexer_spark.streaming import windows as sw

    tune_session(spark)
    base, tag = _stream_workdir("fis_st5", sf_dir)
    src = os.path.join(base, "src")
    ev2 = events_df(spark, sf_dir)
    _land_arrivals(
        src,
        [ev2.filter(F.col("event_id") % 2 == 0), ev2.filter(F.col("event_id") % 2 == 1)],
    )
    stream = sw.read_events_stream(spark, src, max_files_per_trigger=1)
    sink = f"st5_sink_{tag}"
    sw.run_to_memory_sink(
        sw.windowed_counts(stream, slide_duration="15 minutes"), sink
    )
    return spark.table(sink).orderBy("window_start", "event_type")


@register(
    "w4_json_roundtrip",
    with_files_cte("SELECT * FROM files ORDER BY path, filename"),
)
def w4_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4 (S11): whole-index JSON export/import under the gate — the
    distributed analogue of the Go engine's JSON storage mode
    (file_indexer_go/indexer/indexer.go:294-338). The table roundtrips
    parquet -> newline-JSON -> parquet with a lossless microsecond
    timestamp format; the oracle is the plain files derivation, so any
    serialization drift (precision, timezone, nulls) hash-mismatches.
    """
    import hashlib
    import os
    import shutil
    import tempfile

    from file_indexer_spark.indexer.files_table import FilesTable

    tune_session(spark)
    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    base = os.path.join(tempfile.gettempdir(), f"fis_w4_{tag}")
    shutil.rmtree(base, ignore_errors=True)

    src = FilesTable(spark, os.path.join(base, "src_db"))
    src.overwrite(files_df(spark, sf_dir))
    src.export_json(os.path.join(base, "dump.json"))

    dst = FilesTable(spark, os.path.join(base, "dst_db"))
    dst.import_json(os.path.join(base, "dump.json"))
    return dst.read().orderBy("path", "filename")


@register(
    "t7_rollup_token_totals",
    """
    SELECT source, lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(GROUPING(source) * 2 + GROUPING(lang) AS BIGINT) AS gid
    FROM documents
    GROUP BY ROLLUP (source, lang)
    ORDER BY gid, source NULLS FIRST, lang NULLS FIRST
    """,
)
def t7_rollup_token_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-grain totals in one scan (ROLLUP -> Expand + single hash
    agg); grouping_id disambiguates subtotal rows."""
    return tx.rollup_token_totals(_table(spark, sf_dir, "documents"))


@register(
    "t8_lang_pivot",
    f"""
    SELECT source,
           {", ".join(
               f"CAST(SUM(CASE WHEN lang = '{lang}' THEN 1 ELSE 0 END) AS BIGINT) AS n_{lang}"
               for lang in tx.LANGS
           )}
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
)
def t8_lang_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with a PINNED value list (no discovery scan, stable
    schema) — compiles to conditional aggregates in one hash agg."""
    return tx.lang_pivot(_table(spark, sf_dir, "documents"))


@register(
    "e11_event_transitions",
    """
    WITH seq AS (
        SELECT event_type AS next_type,
               lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS prev_type
        FROM events
    ),
    c AS (
        SELECT prev_type, next_type, COUNT(*) AS n_transitions
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY 1, 2
    )
    SELECT prev_type, next_type, n_transitions,
           round(CAST(n_transitions AS DOUBLE)
                 / CAST(SUM(n_transitions) OVER (PARTITION BY prev_type) AS DOUBLE),
                 6) AS transition_p
    FROM c
    ORDER BY prev_type, next_type
    """,
)
def e11_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order event-type transition matrix per user sequence: one
    lag window on user_id, then an O(types^2) agg; normalization
    windows over the matrix, not the stream."""
    return ev.event_transitions(_events(spark, sf_dir))


from file_indexer_spark.operators import inference as inf  # noqa: E402

@register(
    "inf1_classifier_scores",
    f"""
    WITH scored AS (
        SELECT label,
               CAST(ROUND(1.0 / (1.0 + exp(-(
                   list_reduce(
                       list_transform(range(1, {inf.DIM} + 1),
                           i -> (embedding[i]::DOUBLE)
                                * (((i * 37) % 29 - 14)::DOUBLE / 29.0)),
                       (x, y) -> x + y)
                   + {inf.BIAS}))) * 1000000) AS BIGINT) AS s_e6
        FROM embeddings
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_vectors,
           round(CAST(SUM(s_e6) AS DOUBLE) / COUNT(*) / 1000000, 6) AS mean_score,
           CAST(SUM(CASE WHEN s_e6 >= {inf.KEEP_THRESHOLD_E6} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept
    FROM scored
    GROUP BY label
    ORDER BY label
    """,
)
def inf1_classifier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-filter pass: sigmoid(w.x+b) as ONE codegen expression
    over the scan (no UDF, no shuffle before the O(labels) rollup);
    per-row scores snap to integer micro-units before aggregation so
    results can't drift with partial-agg order."""
    return inf.classifier_scores(_table(spark, sf_dir, "embeddings"))


@register(
    "sp4_shard_assignment",
    f"""
    WITH tagged AS (
        SELECT CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
                    % {sp.N_SHARDS} AS BIGINT) AS shard,
               len(string_split(text, ' ')) AS n_tokens,
               source
        FROM documents
    )
    SELECT shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
    FROM tagged
    GROUP BY shard
    ORDER BY shard
    """,
)
def sp4_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-stable export sharding: md5-prefix mod N as a pure key
    function (retry/re-run/growth-stable), with the per-shard balance
    report. Zero shuffles before the O(shards) agg."""
    return sp.shard_assignment(_table(spark, sf_dir, "documents"))


@register(
    "sp6_epoch_shuffle",
    f"""
    -- Deterministic epoch shuffle: md5(seed:doc_id) routes each doc to
    -- an epoch shard; within-shard key order is the read order. No
    -- global row_number — n_shards independent ranks.
    WITH keyed AS (
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               md5('0:' || doc_id::VARCHAR) AS order_key
        FROM documents),
    sharded AS (
        SELECT doc_id, n_tokens, order_key,
               CAST(CAST('0x' || substr(order_key, 1, 8) AS BIGINT)
                    % {sp.EPOCH_SHARDS} AS BIGINT) AS epoch_shard
        FROM keyed)
    SELECT doc_id, epoch_shard,
           CAST(row_number() OVER (PARTITION BY epoch_shard
                ORDER BY order_key, doc_id) AS BIGINT) AS shard_pos,
           n_tokens
    FROM sharded ORDER BY epoch_shard, shard_pos
    """,
)
def sp6_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SP6: the epoch's full read plan — content-stable pseudo-random
    training order, reshuffled by seed, replayed identically across
    retries; sharded so no global single-partition sort exists."""
    return sp.epoch_shuffle(_table(spark, sf_dir, "documents"), seed=0)


@register(
    "w5_incremental_update",
    """
    -- Incremental re-index (D1): after appending one byte to every
    -- 5th document's file and re-running update_index, exactly the
    -- touched files carry new sizes/checksums; untouched rows keep
    -- their phase-1 values (mtime+size change detection skips them).
    SELECT 'doc_' || CAST(doc_id AS VARCHAR) || '.txt' AS filename,
           CAST(octet_length(encode(text))
                + CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END AS BIGINT) AS file_size,
           CASE WHEN doc_id % 5 = 0 THEN sha256(text || 'X')
                ELSE sha256(text) END AS checksum
    FROM documents
    ORDER BY filename
    """,
)
def w5_incremental_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5: the D1 incremental pipeline under the gate — index a tree,
    mutate a deterministic subset (append one byte), re-run
    update_index. The oracle recomputes both populations independently,
    so a missed change (stale size/checksum) hash-mismatches; the
    no-spurious-rehash half of D1 (reuse counters) is pinned by
    tests/test_indexer_write.py, since an unnecessary rehash of
    unchanged content reproduces the same digest."""
    import hashlib
    import os
    import shutil
    import tempfile

    from file_indexer_spark.indexer.files_table import FilesTable
    from file_indexer_spark.indexer.two_phase import update_index

    tune_session(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    base = os.path.join(tempfile.gettempdir(), f"fis_w5_{tag}")
    tree = os.path.join(base, "tree")
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(tree)
    for r in docs:
        with open(os.path.join(tree, f"doc_{r['doc_id']}.txt"), "w", encoding="utf-8") as fh:
            fh.write(r["text"])

    table = FilesTable(spark, os.path.join(base, "files_db"))
    update_index(spark, table, tree, max_checksum_size=0)  # 0 = no size cap

    for r in docs:
        if r["doc_id"] % 5 == 0:
            with open(
                os.path.join(tree, f"doc_{r['doc_id']}.txt"), "a", encoding="utf-8"
            ) as fh:
                fh.write("X")

    update_index(spark, table, tree, max_checksum_size=0)
    return table.read().select("filename", "file_size", "checksum").orderBy("filename")


@register(
    "e12_gap_percentiles",
    """
    WITH gaps AS (
        SELECT event_type,
               epoch_us(ts) - epoch_us(lag(ts) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
        FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_gaps,
           round(quantile_cont(gap_us, 0.5), 4) AS p50_us,
           round(quantile_cont(gap_us, 0.9), 4) AS p90_us,
           round(quantile_cont(gap_us, 0.99), 4) AS p99_us
    FROM gaps
    WHERE gap_us IS NOT NULL
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def e12_gap_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival gap percentiles per event type: one lag window on
    user_id, then an exact percentile agg on the tiny type key."""
    return ev.gap_percentiles(_events(spark, sf_dir))


@register("e12a_gap_percentiles_approx")
def e12a_gap_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E12a: single-pass percentile_approx sketch variant — the 100 TB
    execution path for e12. Rows-only driver check; tolerance vs e12
    pinned in pytest."""
    return ev.gap_percentiles_approx(_events(spark, sf_dir))


@register(
    "ct4_boilerplate_ngrams",
    f"""
    WITH grams AS (
        SELECT doc_id,
               unnest(list_transform(
                   range(1, greatest(len(string_split(text, ' '))
                                     - {cu.BOILERPLATE_N - 1}, 0) + 1),
                   i -> array_to_string(
                       string_split(text, ' ')[i:i + {cu.BOILERPLATE_N - 1}],
                       ' '))) AS gram
        FROM documents
    )
    SELECT gram,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS doc_freq
    FROM grams
    GROUP BY gram
    ORDER BY doc_freq DESC, n_occurrences DESC, gram
    LIMIT {cu.BOILERPLATE_TOP_K}
    """,
)
def ct4_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate mining: map-side n-gram Generate -> one hash agg on
    gram (occurrences + doc frequency) -> top-k. No joins, no skew."""
    return cu.boilerplate_ngrams(_table(spark, sf_dir, "documents"))


@register(
    "t9_cube_token_totals",
    """
    SELECT source, lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(GROUPING(source) * 2 + GROUPING(lang) AS BIGINT) AS gid
    FROM documents
    GROUP BY CUBE (source, lang)
    ORDER BY gid, source NULLS FIRST, lang NULLS FIRST
    """,
)
def t9_cube_token_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full CUBE over (source, lang): all four grains from one Expand +
    single hash agg, incl. the per-lang grain ROLLUP can't emit."""
    return tx.cube_token_totals(_table(spark, sf_dir, "documents"))


# ------------------------------------------------- round-4 additions


@register(
    "sp5_stratified_sample",
    f"""
    -- Rate-based stratified sampling by lang: rate = min(1, target/n),
    -- keep iff first 4 hex digits of md5(doc_id:strat:lang) fall under
    -- floor(rate * 65536). floor() is explicit on both sides: Spark's
    -- double->long cast truncates, DuckDB's rounds.
    WITH strata AS (
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
               least(1.0, {float(sp.STRATUM_TARGET)} / COUNT(*)) AS rate
        FROM documents GROUP BY lang),
    tagged AS (
        SELECT d.lang, s.n_docs, s.rate,
               ('0x' || substring(
                    md5(d.doc_id::VARCHAR || ':{sp.STRAT_SALT}:' || d.lang), 1, 4))::BIGINT
                 < CAST(floor(s.rate * 65536) AS BIGINT) AS keep
        FROM documents d JOIN strata s USING (lang))
    SELECT lang, n_docs,
           round(rate, 6) AS target_rate,
           SUM(CASE WHEN keep THEN 1 ELSE 0 END)::BIGINT AS n_kept,
           round(SUM(CASE WHEN keep THEN 1 ELSE 0 END)::DOUBLE / n_docs, 6)
               AS achieved_rate
    FROM tagged GROUP BY lang, n_docs, rate ORDER BY lang
    """,
)
def sp5_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling accounting: tiny per-lang rate agg broadcast
    back onto a map-side md5-threshold filter — no corpus window."""
    return sp.stratified_sample(_table(spark, sf_dir, "documents"))


@register(
    "dd8_duplicate_spans",
    f"""
    WITH sets AS (SELECT doc_id, {H.duck_shingle_hashes()} AS shingles FROM documents),
    expl AS (SELECT doc_id, unnest(shingles) AS h FROM sets),
    dfreq AS (SELECT h, COUNT(*) AS df FROM expl GROUP BY h),
    per_doc AS (
        SELECT e.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_shingles,
               CAST(SUM(CASE WHEN d.df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared
        FROM expl e JOIN dfreq d USING (h) GROUP BY e.doc_id)
    SELECT doc_id, n_shingles, n_shared,
           round(CAST(n_shared AS DOUBLE) / CAST(n_shingles AS DOUBLE), 6)
               AS shared_fraction,
           (CAST(n_shared AS DOUBLE) / CAST(n_shingles AS DOUBLE))
               >= {dd.DUP_SPAN_FLAG} AS flagged
    FROM per_doc ORDER BY doc_id
    """,
)
def dd8_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc duplicated-span fraction: shingle df via one COUNT window
    on the shingle hash, one agg back on doc_id — no pair generation."""
    return dd.duplicate_spans(_table(spark, sf_dir, "documents"))


@register(
    "ct5_quality_rank_filter",
    f"""
    -- Rank-based per-source quality filter: keep top 75% by rounded
    -- t2 composite score (doc_id tie-break => integer-deterministic
    -- membership; no knife-edge float cutoff comparisons).
    WITH m AS (
        SELECT doc_id, source,
               CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
               CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER) AS n_distinct_tokens,
               CAST(len(list_filter(string_split(text, ' '), t -> t IN ({_STOP_SQL}))) AS INTEGER)
                   AS n_stopwords
        FROM documents),
    scored AS (
        SELECT doc_id, source,
               round(0.5 * (CAST(n_distinct_tokens AS DOUBLE) / CAST(n_tokens AS DOUBLE))
                     + 0.3 * (1.0 - CAST(n_stopwords AS DOUBLE) / CAST(n_tokens AS DOUBLE))
                     + 0.2 * least(CAST(n_tokens AS DOUBLE) / 300.0, 1.0), 6) AS quality_score
        FROM m),
    ranked AS (
        SELECT source, quality_score,
               COUNT(*) OVER (PARTITION BY source) AS n_docs,
               row_number() OVER (PARTITION BY source
                                  ORDER BY quality_score DESC, doc_id) AS rn
        FROM scored)
    SELECT source,
           CAST(MAX(n_docs) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           MIN(quality_score) AS cutoff_score
    FROM ranked
    WHERE rn <= CAST(ceil(n_docs * {cu.KEEP_FRACTION}) AS BIGINT)
    GROUP BY source ORDER BY source
    """,
)
def ct5_quality_rank_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source top-75% quality retention: map-side t2 score, one
    shared window shuffle on source, tiny rollup."""
    return cu.quality_rank_filter(_table(spark, sf_dir, "documents"))


@register(
    "mx2_temperature_mixture",
    f"""
    -- alpha-sampling mixture weights: weight ∝ n_docs^0.5, normalized
    -- over DECIMAL(20,9) (exact, order-free sum), divided as doubles
    -- once per source.
    WITH counts AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM documents GROUP BY source),
    tagged AS (
        SELECT source, n_docs,
               CAST(round(sqrt(CAST(n_docs AS DOUBLE)), 9) AS DECIMAL(20,9)) AS w
        FROM counts)
    SELECT source, n_docs,
           round(CAST(n_docs AS DOUBLE) / CAST(SUM(n_docs) OVER () AS DOUBLE), 6)
               AS base_share,
           round(CAST(w AS DOUBLE) / CAST(SUM(w) OVER () AS DOUBLE), 6) AS temp_weight,
           CAST(floor(round(CAST(w AS DOUBLE) / CAST(SUM(w) OVER () AS DOUBLE), 6)
                      * {cu.MIX_BUDGET}) AS BIGINT) AS target_docs
    FROM tagged ORDER BY source
    """,
)
def mx2_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature mixture weights: one tiny per-source agg + an
    O(sources) window — nothing corpus-sized after the first shuffle."""
    return cu.temperature_mixture(_table(spark, sf_dir, "documents"))


@register(
    "t10_distinctive_terms",
    f"""
    WITH words AS (
        SELECT lang, unnest(string_split(text, ' ')) AS word FROM documents),
    tf AS (SELECT lang, word, CAST(COUNT(*) AS BIGINT) AS tf
           FROM words GROUP BY lang, word),
    df AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY word),
    nl AS (SELECT CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs FROM tf),
    scored AS (
        SELECT t.lang, t.word, t.tf, d.df,
               CAST(t.tf * (nl.n_langs - d.df + 1) AS BIGINT) AS score
        FROM tf t JOIN df d USING (word) CROSS JOIN nl),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY lang
                                     ORDER BY score DESC, word) AS rank
        FROM scored)
    SELECT lang, CAST(rank AS BIGINT) AS rank, word, tf, df, score
    FROM ranked WHERE rank <= {tx.TERMS_TOP_K} ORDER BY lang, rank
    """,
)
def t10_distinctive_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-lang distinctive vocabulary: word-count shuffle, then all
    further aggs run over the O(vocab) rollup; integer idf surrogate
    (ln() is not bit-identical across engines)."""
    return tx.distinctive_terms(_table(spark, sf_dir, "documents"))


@register(
    "h6_revenue_forecast",
    """
    -- TPC-H Q6 shape: single fact scan, every predicate pushed to the
    -- parquet reader, zero joins, fixed-point BIGINT revenue.
    WITH l AS (
        SELECT CAST(round(l_discount * 100) AS BIGINT) AS disc_pct,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS price_e2
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
          AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 4 AND 8
          AND l_quantity < 24)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(price_e2 * disc_pct) AS BIGINT) AS revenue_e4
    FROM l
    """,
)
def h6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure pushdown scan + one-row global agg."""
    tune_session(spark)
    return rel.revenue_forecast(_table(spark, sf_dir, "lineitem"))


@register(
    "h7_large_volume_customers",
    """
    -- TPC-H Q18 shape: HAVING on the big per-order quantity aggregate,
    -- then joins against orders/customer, top-100 by order value. The
    -- engine's rewrite keeps the HAVING pass's sum instead of
    -- re-joining lineitem (one fact shuffle, not two).
    WITH q AS (
        SELECT l_orderkey,
               CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS total_qty
        FROM lineitem GROUP BY l_orderkey
        HAVING SUM(CAST(round(l_quantity) AS BIGINT)) > 150)
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           round(o.o_totalprice, 2) AS o_totalprice, q.total_qty
    FROM q
    JOIN orders o ON o.o_orderkey = q.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY o_totalprice DESC, o.o_orderdate, o.o_orderkey
    LIMIT 100
    """,
)
def h7_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: large-volume customers — HAVING-pruned per-order
    quantity agg (one lineitem shuffle), joins shrink to the qualifying
    orders, TakeOrderedAndProject top-100."""
    tune_session(spark)
    return rel.large_volume_customers(
        _table(spark, sf_dir, "customer"),
        _table(spark, sf_dir, "orders"),
        _table(spark, sf_dir, "lineitem"),
    )


@register(
    "h8_order_count_distribution",
    """
    -- TPC-H Q13 shape: orders-per-customer distribution INCLUDING the
    -- zero bucket (left outer join + double aggregation). The
    -- order-side exclusion rides the join condition, exactly like the
    -- engine's pre-join filter.
    WITH per_customer AS (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o
          ON c.c_custkey = o.o_custkey
         AND o.o_orderpriority NOT LIKE '%URGENT%'
        GROUP BY c.c_custkey)
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM per_customer GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def h8_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: the left-outer count-distribution shape — unmatched
    customers MUST surface as the zero bucket; second agg is O(max
    count) rows."""
    tune_session(spark)
    return rel.order_count_distribution(
        _table(spark, sf_dir, "customer"), _table(spark, sf_dir, "orders")
    )


@register(
    "h9_idle_rich_customers",
    """
    -- TPC-H Q22 shape: above-average balances with no orders — scalar
    -- subquery + anti-join + segment rollup. The boundary is integer
    -- cross-multiplication (cents * n_pos > total_pos_cents), so no
    -- engine's float-avg accumulation order can flip a member.
    WITH cents AS (
        SELECT c_custkey, c_mktsegment,
               CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
        FROM customer),
    s AS (
        SELECT CAST(SUM(bal_cents) AS BIGINT) AS total_pos_cents,
               COUNT(*) AS n_pos
        FROM cents WHERE bal_cents > 0),
    cand AS (
        SELECT c.c_mktsegment, c.bal_cents
        FROM cents c, s
        WHERE c.bal_cents * s.n_pos > s.total_pos_cents
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey))
    SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(bal_cents) AS BIGINT) AS totacctbal_cents
    FROM cand GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def h9_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22: scalar-aggregate broadcast + LEFT ANTI join; the
    qualifying boundary is exact integer arithmetic on cents."""
    tune_session(spark)
    return rel.idle_rich_customers(
        _table(spark, sf_dir, "customer"), _table(spark, sf_dir, "orders")
    )


@register(
    "h10_nation_trade_volume",
    """
    -- TPC-H Q7 shape: supplier-nation x customer-nation trade volume
    -- by order year — the widest join tree in the pack; fixed-point
    -- BIGINT revenue, O(nations^2 x years) output.
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(rev) AS BIGINT) AS revenue_e4
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER) AS l_year,
               CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT)) AS rev
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        WHERE n1.n_name <> n2.n_name) t
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def h10_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: one pass over lineitem; nation force-broadcast (25
    rows forever), supplier/customer joins left to AQE; pair filter and
    year extraction map-side."""
    tune_session(spark)
    return rel.nation_trade_volume(
        _table(spark, sf_dir, "lineitem"),
        _table(spark, sf_dir, "orders"),
        _table(spark, sf_dir, "customer"),
        _table(spark, sf_dir, "supplier"),
        _table(spark, sf_dir, "nation"),
    )


@register(
    "sim5_knn_join",
    f"""
    -- k-NN graph under the IVF constraint: neighbors share a centroid
    -- list (top-2 multi-assignment; shared-list pairs deduped). The
    -- assignment/ranking replicate operators/similarity.py exactly
    -- (deterministic centroids, IEEE left-to-right fold).
    WITH c AS ({_DUCK_NORMS}),
    cents AS (SELECT c.vec_id AS centroid_id, c.embedding AS c_emb, c.norm AS c_norm
              FROM c
              JOIN (SELECT MIN(vec_id) AS vec_id FROM embeddings GROUP BY label) reps
                ON c.vec_id = reps.vec_id),
    assign AS (
        SELECT vec_id, centroid_id FROM (
            SELECT v.vec_id, cents.centroid_id,
                   row_number() OVER (PARTITION BY v.vec_id ORDER BY
                        {_DUCK_DOT.format(a="v.embedding", b="cents.c_emb")}
                        / (v.norm * cents.c_norm) DESC, cents.centroid_id) AS rn
            FROM c v, cents) t
        WHERE rn <= {sim.KNN_ASSIGN}),
    vecs AS (SELECT c.vec_id, c.embedding AS emb, c.norm AS nrm, a.centroid_id
             FROM c JOIN assign a ON a.vec_id = c.vec_id),
    pairs AS (
        SELECT DISTINCT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
               {_DUCK_DOT.format(a="a.emb", b="b.emb")} / (a.nrm * b.nrm) AS cosine
        FROM vecs a JOIN vecs b
          ON a.centroid_id = b.centroid_id AND a.vec_id != b.vec_id),
    ranked AS (
        SELECT vec_id, neighbor_id, cosine,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY cosine DESC, neighbor_id) AS rank
        FROM pairs)
    SELECT vec_id, neighbor_id, rank, round(cosine, 6) AS cosine
    FROM ranked WHERE rank <= {sim.KNN_K} ORDER BY vec_id, rank
    """,
)
def sim5_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN graph for every vector: IVF-bucketed + salted scoring join
    (dd5's shape), one top-k window per query vector."""
    return sim.knn_join(_table(spark, sf_dir, "embeddings"))


@register(
    "e13_daily_uniques",
    """
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY 1 ORDER BY 1
    """,
)
def e13_daily_uniques(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-day distinct users: two-phase distinct agg (shuffle =
    one row per distinct (day, user) pair — e13a is the sketch path)."""
    return ev.daily_uniques(_events(spark, sf_dir))


@register("e13a_daily_uniques_approx")
def e13a_daily_uniques_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E13a: HLL++ sketch variant — the 100 TB distinct-count path
    (fixed-size mergeable sketch per group instead of a row per
    distinct pair). Rows-only driver check; relative error vs exact
    e13 pinned in pytest."""
    return ev.daily_uniques_approx(_events(spark, sf_dir))


@register("st6_streaming_uniques")
def st6_streaming_uniques(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST6: streaming per-day distinct users via HLL sketches — e13a as
    a REAL stream (two file arrivals -> two micro-batches; per-window
    state is one mergeable sketch, so the final estimate equals the
    batch approx bit-for-bit — pinned in tests). Rows-only driver
    check: sketch internals have no SQL rendition."""
    import os

    from file_indexer_spark.streaming import windows as sw

    tune_session(spark)
    base, tag = _stream_workdir("fis_st6", sf_dir)
    src = os.path.join(base, "src")
    ev2 = events_df(spark, sf_dir)
    _land_arrivals(
        src,
        [ev2.filter(F.col("event_id") % 2 == 0), ev2.filter(F.col("event_id") % 2 == 1)],
    )
    stream = sw.read_events_stream(spark, src, max_files_per_trigger=1)
    sink = f"st6_sink_{tag}"
    sw.run_to_memory_sink(sw.windowed_uniques(stream), sink)
    return spark.table(sink).orderBy("day")


@register(
    "w6_sharded_export",
    f"""
    WITH tagged AS (
        SELECT CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
                    % {sp.N_SHARDS} AS BIGINT) AS shard,
               len(string_split(text, ' ')) AS n_tokens,
               source
        FROM documents
    )
    SELECT shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
    FROM tagged
    GROUP BY shard
    ORDER BY shard
    """,
)
def w6_sharded_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W6: the sharded-export WRITE gate — physically materialize sp4's
    layout (parquet partitioned by the content-stable shard key), read
    the partitioned directory back, and recompute the balance report
    from the READ-BACK rows. The oracle is sp4's (the source table is
    unchanged), so a row lost in the write, a shard routed wrong, or a
    partition-column type drift (partition values come back via
    directory-name inference) all hash-mismatch."""
    import hashlib
    import os
    import shutil
    import tempfile

    tune_session(spark)
    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    base = os.path.join(tempfile.gettempdir(), f"fis_w6_{tag}")
    shutil.rmtree(base, ignore_errors=True)
    sp.export_sharded(_table(spark, sf_dir, "documents"), base)

    back = spark.read.parquet(base)
    return (
        back.select(
            F.col("shard").cast("long").alias("shard"),
            F.size(F.split("text", " ")).alias("n_tokens"),
            "source",
        )
        .groupBy("shard")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.countDistinct("source").cast("long").alias("n_sources"),
        )
        .orderBy("shard")
    )


@register(
    "w7_time_travel",
    with_files_cte("SELECT * FROM files ORDER BY path, filename"),
)
def w7_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W7: time-travel gate — commit the files derivation as generation
    1 of a history-keeping FilesTable, MUTATE the live table (upsert a
    changed checksum + delete a row = generations 2 and 3), then return
    ``read_at(1)``. The oracle is the plain files derivation, so any
    leakage of later generations into the snapshot — or any loss in the
    generation-log roundtrip — hash-mismatches."""
    import hashlib
    import os
    import shutil
    import tempfile

    from file_indexer_spark.indexer.files_table import FilesTable

    tune_session(spark)
    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    base = os.path.join(tempfile.gettempdir(), f"fis_w7_{tag}")
    shutil.rmtree(base, ignore_errors=True)

    t = FilesTable(spark, os.path.join(base, "db"), keep_history=True)
    original = files_df(spark, sf_dir)
    t.overwrite(original)
    one_key = original.orderBy("path", "filename").limit(1)
    t.upsert(one_key.withColumn("checksum", F.lit("MUTATED")))
    t.delete(one_key.select("path", "filename"))
    return t.read_at(1).orderBy("path", "filename")


@register(
    "w7b_vacuum_history",
    with_files_cte(
        """
    SELECT CAST(4 AS INTEGER) AS generation, path, filename,
           CASE WHEN file_size % 4 = 1 THEN 'G4'
                WHEN file_size % 4 = 0 THEN 'G2'
                ELSE checksum END AS checksum,
           modification_datetime, file_size, indexed_at
    FROM files WHERE file_size % 4 = 1 OR file_size % 5 <> 0
    UNION ALL
    SELECT CAST(5 AS INTEGER), path, filename,
           CASE WHEN file_size % 4 = 1 THEN 'G4'
                WHEN file_size % 4 = 2 THEN 'G5'
                WHEN file_size % 4 = 0 THEN 'G2'
                ELSE checksum END,
           modification_datetime, file_size, indexed_at
    FROM files WHERE file_size % 4 IN (1, 2) OR file_size % 5 <> 0
    ORDER BY generation, path, filename
    """
    ),
)
def w7b_vacuum_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W7b: time travel under REAL history depth — five generations of
    bucketed partial mutations (overwrite; upsert size%4==0 → 'G2';
    delete size%5==0; upsert size%4==1 → 'G4', which also REINSERTS
    previously-deleted keys; upsert size%4==2 → 'G5'), then
    ``vacuum(retain_generations=2)``, then BOTH retained snapshots
    (generations 4 and 5) read back and union-tagged. The oracle
    replays the generation algebra on the files derivation, so a
    vacuum that drops a still-referenced bucket file, or a manifest
    log that mis-replays partial upserts/deletes/reinserts,
    hash-mismatches. Vacuumed-generation unreadability (read_at(3)
    raising) is pinned in tests/test_indexer_write.py."""
    import hashlib
    import os
    import shutil
    import tempfile

    from file_indexer_spark.indexer.files_table import FilesTable

    tune_session(spark)
    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    base = os.path.join(tempfile.gettempdir(), f"fis_w7b_{tag}")
    shutil.rmtree(base, ignore_errors=True)

    t = FilesTable(spark, os.path.join(base, "db"), keep_history=True)
    original = files_df(spark, sf_dir)
    t.overwrite(original)                                                # gen 1
    t.upsert(
        original.filter(F.col("file_size") % 4 == 0).withColumn(
            "checksum", F.lit("G2")
        )
    )                                                                    # gen 2
    t.delete(
        original.filter(F.col("file_size") % 5 == 0).select("path", "filename")
    )                                                                    # gen 3
    t.upsert(
        original.filter(F.col("file_size") % 4 == 1).withColumn(
            "checksum", F.lit("G4")
        )
    )                                                                    # gen 4
    t.upsert(
        original.filter(F.col("file_size") % 4 == 2).withColumn(
            "checksum", F.lit("G5")
        )
    )                                                                    # gen 5
    t.vacuum(retain_generations=2)
    g4 = t.read_at(4).withColumn("generation", F.lit(4).cast("int"))
    g5 = t.read_at(5).withColumn("generation", F.lit(5).cast("int"))
    return g4.unionByName(g5).orderBy("generation", "path", "filename")


@register(
    "w8_streaming_ingest",
    with_files_cte(
        """
    SELECT path, filename,
           CASE WHEN file_size % 2 = 0 THEN 'S2'
                WHEN file_size % 3 = 0 THEN 'S1'
                ELSE checksum END AS checksum,
           modification_datetime, file_size, indexed_at
    FROM files ORDER BY path, filename
    """
    ),
)
def w8_streaming_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W8: streaming CDC ingestion — a file-source STREAM of change
    batches upserted into the manifest-committed FilesTable via
    ``foreachBatch`` (the Structured Streaming sink pattern for tables
    the engine owns). Two overlapping change arrivals land in pinned
    order (maxFilesPerTrigger=1, mtime-ordered file source), so
    last-writer-wins applies deterministically: size%3==0 → 'S1', then
    size%2==0 → 'S2' (the overlap, e.g. size%6==0, must end at 'S2').
    The oracle replays that CASE algebra on the files derivation, so a
    dropped batch, re-ordered application, or non-atomic upsert
    hash-mismatches. Scale shape: each micro-batch costs one bucketed
    partial upsert (only touched pk_buckets rewrite — two_phase.py's
    merge path), state none."""
    import hashlib
    import os
    import shutil
    import tempfile

    from file_indexer_spark.indexer.files_table import FilesTable

    tune_session(spark)
    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    base = os.path.join(tempfile.gettempdir(), f"fis_w8_{tag}")
    shutil.rmtree(base, ignore_errors=True)
    src = os.path.join(base, "src")

    original = files_df(spark, sf_dir)
    t = FilesTable(spark, os.path.join(base, "db"), buckets=8)
    t.overwrite(original)

    _land_arrivals(
        src,
        [
            original.filter(F.col("file_size") % 3 == 0).withColumn(
                "checksum", F.lit("S1")
            ),
            original.filter(F.col("file_size") % 2 == 0).withColumn(
                "checksum", F.lit("S2")
            ),
        ],
    )
    stream = (
        spark.readStream.format("parquet")
        .schema(original.schema)
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )
    query = (
        stream.writeStream.foreachBatch(lambda batch, _id: t.upsert(batch))
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(base, "ckpt"))
        .start()
    )
    query.awaitTermination()
    return t.read().orderBy("path", "filename")


# shared by dd9 (the extent list) and dd10 (the strip pass applying it)
_DD9_CTES = f"""grams AS (
        SELECT doc_id, n_tokens, u.p AS p, u.h AS h FROM (
            SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
                   unnest(list_transform(
                       range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
                       i -> {{'p': i, 'h': {H.duck_hash60("array_to_string(string_split(text, ' ')[i:i+2], ' ')")}}})) AS u
            FROM documents)),
    marked AS (
        SELECT doc_id, n_tokens, p FROM (
            SELECT doc_id, n_tokens, p, COUNT(*) OVER (PARTITION BY h) AS occ FROM grams)
        WHERE occ >= 2),
    flagged AS (
        SELECT doc_id, n_tokens, p,
               CASE WHEN p > coalesce(lag(p) OVER (PARTITION BY doc_id ORDER BY p), -10) + 3
                    THEN 1 ELSE 0 END AS new_island
        FROM marked),
    islands AS (
        SELECT doc_id, n_tokens, p,
               SUM(new_island) OVER (PARTITION BY doc_id ORDER BY p
                                     ROWS UNBOUNDED PRECEDING) AS island
        FROM flagged)"""


@register(
    "dd9_duplicate_span_extents",
    f"""
    -- Exact-substring dedup extents: gaps-and-islands over positions
    -- of word 3-grams occurring >= 2 times corpus-wide.
    -- span_end clamped to the doc's token count (sub-gram-width docs
    -- use a whole-doc fallback gram whose raw end exceeds the doc)
    WITH {_DD9_CTES}
    SELECT doc_id,
           CAST(MIN(p) AS BIGINT) AS span_start,
           CAST(LEAST(MAX(p) + 2, MAX(n_tokens)) AS BIGINT) AS span_end,
           CAST(LEAST(MAX(p) + 2, MAX(n_tokens)) - MIN(p) + 1 AS BIGINT) AS span_tokens
    FROM islands GROUP BY doc_id, island ORDER BY doc_id, span_start
    """,
)
def dd9_duplicate_span_extents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup extents (the strip-pass instruction list):
    COUNT window on the gram hash marks duplicated positions, one
    gaps-and-islands window per doc merges them into token intervals."""
    return dd.duplicate_span_extents(_table(spark, sf_dir, "documents"))


@register(
    "dd10_strip_spans",
    f"""
    -- The strip pass APPLYING dd9's extents: remove every token inside
    -- a duplicated-span extent, rejoin the survivors, account.
    WITH {_DD9_CTES},
    spansagg AS (
        SELECT doc_id, list({{'s': span_start, 'e': span_end}}) AS spans FROM (
            SELECT doc_id,
                   CAST(MIN(p) AS BIGINT) AS span_start,
                   CAST(LEAST(MAX(p) + 2, MAX(n_tokens)) AS BIGINT) AS span_end
            FROM islands GROUP BY doc_id, island)
        GROUP BY doc_id),
    w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
    stripped AS (
        SELECT d.doc_id, d.words,
               list_filter(
                   list_transform(range(1, len(d.words) + 1),
                                  i -> {{'p': i, 'w': d.words[i]}}),
                   s -> sp.spans IS NULL OR
                        len(list_filter(sp.spans,
                                        x -> s.p >= x.s AND s.p <= x.e)) = 0) AS kept
        FROM w d LEFT JOIN spansagg sp USING (doc_id))
    SELECT doc_id,
           -- a fully-stripped doc is the empty string, not NULL
           COALESCE(array_to_string(list_transform(kept, z -> z.w), ' '), '')
               AS stripped_text,
           CAST(len(words) AS BIGINT) AS n_tokens_before,
           CAST(len(kept) AS BIGINT) AS n_tokens_after,
           CAST(len(words) - len(kept) AS BIGINT) AS n_removed
    FROM stripped ORDER BY doc_id
    """,
)
def dd10_strip_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DD10: Lee et al.-style ExactSubstr strip — dd9's extent list
    applied to the corpus (every duplicated-span token removed,
    originals included, per the paper's semantics) with per-doc
    before/after accounting."""
    return dd.strip_duplicated_spans(_table(spark, sf_dir, "documents"))


# shared by pp1 (batch) and st7 (the same funnel as a stream): both
# emit the identical per-source review table, so one oracle gates both
_PP1_SQL = f"""
    -- End-to-end curation funnel: dd1 keeper rule -> t2 quality
    -- composite >= 0.5 -> ct1 decontamination, per-source accounting.
    WITH m AS (
        SELECT doc_id, source, md5(text) AS content_hash,
               CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
               CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER) AS n_distinct_tokens,
               CAST(len(list_filter(string_split(text, ' '), t -> t IN ({_STOP_SQL}))) AS INTEGER)
                   AS n_stopwords,
               substring(md5(doc_id::VARCHAR), 1, 1) = '{cu.BENCH_HEX}' AS is_bench
        FROM documents),
    keeper AS (
        SELECT *, (doc_id = MIN(doc_id) OVER (PARTITION BY content_hash)) AS keep_dedup
        FROM m),
    sets AS (
        SELECT doc_id, {H.duck_shingle_hashes()} AS shingles,
               substring(md5(doc_id::VARCHAR), 1, 1) = '{cu.BENCH_HEX}' AS is_bench
        FROM documents),
    bench AS (SELECT DISTINCT unnest(shingles) AS h FROM sets WHERE is_bench),
    cand AS (SELECT doc_id, unnest(shingles) AS h FROM sets WHERE NOT is_bench),
    overlap AS (
        SELECT c.doc_id, COUNT(*) AS n_sh,
               SUM(CASE WHEN b.h IS NOT NULL THEN 1 ELSE 0 END) AS n_ov
        FROM cand c LEFT JOIN (SELECT h, h AS hit FROM bench) b USING (h)
        GROUP BY c.doc_id),
    cont AS (
        SELECT doc_id, (CAST(n_ov AS DOUBLE) / CAST(n_sh AS DOUBLE))
                       >= {cu.CONTAMINATION_THRESHOLD} AS contaminated
        FROM overlap),
    staged AS (
        SELECT k.source, k.n_tokens,
               CASE WHEN k.keep_dedup THEN 1 ELSE 0 END AS keep_dedup,
               CASE WHEN k.keep_dedup AND
                         (0.5 * (CAST(k.n_distinct_tokens AS DOUBLE) / CAST(k.n_tokens AS DOUBLE))
                          + 0.3 * (1.0 - CAST(k.n_stopwords AS DOUBLE) / CAST(k.n_tokens AS DOUBLE))
                          + 0.2 * least(CAST(k.n_tokens AS DOUBLE) / 300.0, 1.0)) >= 0.5
                    THEN 1 ELSE 0 END AS keep_quality,
               CASE WHEN k.keep_dedup AND
                         (0.5 * (CAST(k.n_distinct_tokens AS DOUBLE) / CAST(k.n_tokens AS DOUBLE))
                          + 0.3 * (1.0 - CAST(k.n_stopwords AS DOUBLE) / CAST(k.n_tokens AS DOUBLE))
                          + 0.2 * least(CAST(k.n_tokens AS DOUBLE) / 300.0, 1.0)) >= 0.5
                         AND NOT k.is_bench
                         AND NOT coalesce(c.contaminated, FALSE)
                    THEN 1 ELSE 0 END AS keep_final
        FROM keeper k LEFT JOIN cont c ON c.doc_id = k.doc_id)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_raw,
           CAST(SUM(keep_dedup) AS BIGINT) AS n_after_dedup,
           CAST(SUM(keep_quality) AS BIGINT) AS n_after_quality,
           CAST(SUM(keep_final) AS BIGINT) AS n_final,
           CAST(SUM(n_tokens * keep_final) AS BIGINT) AS tokens_final,
           round(CAST(SUM(keep_final) AS DOUBLE) / COUNT(*), 6) AS retention
    FROM staged GROUP BY source ORDER BY source
    """


@register("pp1_curation_pipeline", _PP1_SQL)
def pp1_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed curation funnel (dd1 -> t2 -> ct1) with per-source
    accounting — every stage reuses its standalone operator's exact
    deterministic rule, so the whole funnel hash-matches."""
    return cu.curation_pipeline(_table(spark, sf_dir, "documents"))


@register("st7_streaming_curation", _PP1_SQL)
def st7_streaming_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST7: pp1's funnel applied AT INGESTION as a real stream — dd1
    keeper via streaming ``dropDuplicates`` state, t2 quality map-side,
    ct1 decontamination against a static benchmark broadcast — then
    per-source accounting over the decision sink. The stream reproduces
    the batch table exactly, so the FULL pp1 oracle hash-gates it.

    Arrival order: each content hash's keeper (min doc_id) lands in
    batch 1, re-arrivals in batch 2 — the deterministic rendition of an
    ingestion log's "first copy arrives first" contract, under which
    streaming first-seen == the batch min-doc_id rule (the general
    ordering caveat is documented in streaming/curation.py)."""
    import os

    from pyspark.sql.window import Window

    from file_indexer_spark.streaming import curation as sc

    tune_session(spark)
    base, tag = _stream_workdir("fis_st7", sf_dir)
    src = os.path.join(base, "src")
    docs = _table(spark, sf_dir, "documents")
    ranked = docs.withColumn(
        "rk",
        F.row_number().over(Window.partitionBy(F.md5("text")).orderBy("doc_id")),
    )
    cols = ["doc_id", "source", "text"]
    _land_arrivals(
        src,
        [
            ranked.filter("rk = 1").select(*cols),
            ranked.filter("rk > 1").select(*cols),
        ],
    )
    bench = sc.bench_shingle_set(docs)
    stream = sc.read_source_docs_stream(spark, src, max_files_per_trigger=1)
    sink = f"st7_sink_{tag}"
    sc.run_to_memory_sink(sc.curation_stream(stream, bench), sink)
    return sc.curation_accounting(docs, spark.table(sink))


@register(
    "t11_token_rarity",
    f"""
    WITH words AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
    vocab AS (SELECT word, COUNT(*) AS tf FROM words GROUP BY word),
    ranked AS (
        SELECT word, CAST(dense_rank() OVER (ORDER BY tf DESC, word) AS BIGINT) AS rank
        FROM vocab)
    SELECT w.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           round(CAST(SUM(r.rank) AS DOUBLE) / COUNT(*), 6) AS mean_token_rank,
           CAST(MAX(r.rank) AS BIGINT) AS max_rank,
           CAST(SUM(CASE WHEN r.rank > {tx.RARE_RANK} THEN 1 ELSE 0 END) AS BIGINT)
               AS n_rare_tokens,
           round(CAST(SUM(CASE WHEN r.rank > {tx.RARE_RANK} THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS rare_fraction
    FROM words w JOIN ranked r USING (word)
    GROUP BY w.doc_id ORDER BY w.doc_id
    """,
)
def t11_token_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-rarity quality signal: integer frequency ranks (no libm),
    vocab-only window, rank table broadcast back onto the token stream."""
    return tx.token_rarity(_table(spark, sf_dir, "documents"))


@register(
    "t12_doc_top_terms",
    """
    -- Per-document TF-IDF keyword extraction: integer idf surrogate
    -- (1000*n_docs) // df so no float division can flip a rank;
    -- ties break on word ascending.
    WITH words AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
    tf AS (SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS tf
           FROM words GROUP BY doc_id, word),
    dfx AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY word),
    nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
    scored AS (
        SELECT t.doc_id, t.word, t.tf, d.df,
               CAST(t.tf * ((1000 * n.n_docs) // d.df) AS BIGINT) AS score
        FROM tf t JOIN dfx d USING (word), nd n),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                     ORDER BY score DESC, word) AS rank
        FROM scored)
    SELECT doc_id, CAST(rank AS BIGINT) AS rank, word, tf, df, score
    FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank
    """,
)
def t12_doc_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T12: per-doc top-3 characteristic terms — one word-count
    shuffle, df over the O(vocab) rollup, integer-exact scores."""
    return tx.doc_top_terms(_table(spark, sf_dir, "documents"))


@register(
    "h11_top_revenue_suppliers",
    """
    -- TPC-H Q15 shape: maximum-revenue supplier(s) over a quarter,
    -- ties kept; fixed-point BIGINT revenue.
    WITH rev AS (
        SELECT l_suppkey,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS BIGINT)
                   AS revenue_e4
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey),
    mx AS (SELECT MAX(revenue_e4) AS max_rev FROM rev)
    SELECT s.s_suppkey, s.s_name, r.revenue_e4
    FROM rev r, mx
    JOIN supplier s ON r.l_suppkey = s.s_suppkey
    WHERE r.revenue_e4 = mx.max_rev
    ORDER BY s.s_suppkey
    """,
)
def h11_top_revenue_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: one lineitem shuffle (date pushed), scalar-max
    broadcast, equality join-back keeps ties."""
    tune_session(spark)
    return rel.top_revenue_suppliers(
        _table(spark, sf_dir, "lineitem"), _table(spark, sf_dir, "supplier")
    )


# shared by m7 (frame energy) and m7b (silence spans): recompute every
# int16 sample from the doc_id derivation — sample i = (text byte
# (i mod L) - 96) x (1 on quiet frames, 64 on loud), energy = exact
# integer sum of squares per 160-sample frame.
_M7_SAMPLE = (
    "(ascii(substr(text, CAST(i % L + 1 AS BIGINT), 1)) - 96) * "
    "(CASE WHEN ((i // 160) + doc_id) % 3 = 0 THEN 1 ELSE 64 END)"
)

_M7_CTES = f"""base AS (
        SELECT doc_id, text, length(text) AS L, 4 + doc_id % 4 AS nf
        FROM documents
        WHERE doc_id % 9 <> 0 AND doc_id % 13 <> 0 AND doc_id % 7 <> 0),
    frames AS (
        SELECT doc_id, u.f AS frame_idx, u.energy, u.peak FROM (
            SELECT doc_id,
                   unnest(list_transform(range(0, nf), f -> {{
                       'f': CAST(f AS INTEGER),
                       'energy': CAST(list_sum(list_transform(
                           range(160 * f, 160 * f + 160),
                           i -> CAST(({_M7_SAMPLE}) AS BIGINT)
                                * CAST(({_M7_SAMPLE}) AS BIGINT))) AS BIGINT),
                       'peak': CAST(list_max(list_transform(
                           range(160 * f, 160 * f + 160),
                           i -> abs({_M7_SAMPLE}))) AS INTEGER)}})) AS u
            FROM base))"""


@register(
    "m7_audio_frame_energy",
    f"""
    -- Per-frame audio energy/peak from DECODED PCM16 samples: integer
    -- sum of squares per 160-sample frame (exact in BIGINT), peak
    -- |sample|; three decode-error classes propagate as rows.
    WITH {_M7_CTES}
    SELECT doc_id AS media_id, frame_idx, energy, peak,
           CAST(NULL AS VARCHAR) AS decode_error
    FROM frames
    UNION ALL
    SELECT doc_id, NULL, NULL, NULL,
           CASE WHEN doc_id % 9 = 0 THEN 'null content'
                WHEN doc_id % 13 = 0 THEN 'not PCM1'
                ELSE 'truncated payload' END
    FROM documents WHERE doc_id % 9 = 0 OR doc_id % 13 = 0 OR doc_id % 7 = 0
    ORDER BY media_id, frame_idx
    """,
)
def m7_audio_frame_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M7: the audio-modality analog of m2b/m6 — a REAL container
    format (magic + u32 count + int16 LE samples) decoded by a spec
    parser, vectorized frame analysis (energy, peak) where the blobs
    sit, errors as data. Integer-exact, so the oracle recomputes every
    frame from the derivation."""
    from file_indexer_spark.operators import multimodal as mm

    media = mm.pcm_media_from_docs(_table(spark, sf_dir, "documents"))
    return mm.audio_frame_energy(media).orderBy("media_id", "frame_idx")


from file_indexer_spark.operators.multimodal import (  # noqa: E402
    SILENCE_PEAK as _m7_thr,
)


@register(
    "m7b_silence_spans",
    f"""
    -- Contiguous silent-frame extents (peak < {_m7_thr}): gaps-and-islands
    -- over each clip's quiet frames.
    WITH {_M7_CTES},
    quiet AS (
        SELECT doc_id, frame_idx FROM frames WHERE peak < {_m7_thr}),
    flagged AS (
        SELECT doc_id, frame_idx,
               CASE WHEN frame_idx > coalesce(lag(frame_idx) OVER
                        (PARTITION BY doc_id ORDER BY frame_idx), -10) + 1
                    THEN 1 ELSE 0 END AS new_island
        FROM quiet),
    islands AS (
        SELECT doc_id, frame_idx,
               SUM(new_island) OVER (PARTITION BY doc_id ORDER BY frame_idx
                                     ROWS UNBOUNDED PRECEDING) AS island
        FROM flagged)
    SELECT doc_id AS media_id,
           CAST(MIN(frame_idx) AS BIGINT) AS span_start,
           CAST(MAX(frame_idx) AS BIGINT) AS span_end,
           CAST(COUNT(*) AS BIGINT) AS n_frames
    FROM islands GROUP BY doc_id, island
    ORDER BY media_id, span_start
    """,
)
def m7b_silence_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M7b: silence/trim extents per clip — the dd9 gaps-and-islands
    shape applied to the audio modality; one narrow shuffle of the
    quiet-frame subset."""
    from file_indexer_spark.operators import multimodal as mm

    media = mm.pcm_media_from_docs(_table(spark, sf_dir, "documents"))
    return mm.silence_spans(media)


@register(
    "sp7_zorder_layout",
    """
    -- Z-order (Morton) layout report: 8-bit interleave of
    -- (user_id, day), fixed-width curve-prefix shards (z >> 4: 4x4
    -- key tiles), per-shard tile extents. Pure integer bit algebra in
    -- both engines.
    WITH keyed AS (
        SELECT event_id,
               user_id & 255 AS xk,
               date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) & 255 AS yk
        FROM events),
    curved AS (
        SELECT xk, yk,
               CAST(list_sum(list_transform(range(0, 8), i ->
                   (((xk >> i) & 1) << (2 * i))
                 + (((yk >> i) & 1) << (2 * i + 1)))) AS BIGINT) AS z
        FROM keyed)
    SELECT z >> 4 AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(MIN(xk) AS BIGINT) AS user_min,
           CAST(MAX(xk) AS BIGINT) AS user_max,
           CAST(MIN(yk) AS BIGINT) AS day_min,
           CAST(MAX(yk) AS BIGINT) AS day_max
    FROM curved GROUP BY shard ORDER BY shard
    """,
)
def sp7_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SP7: the multi-dimensional clustering step — Morton-curve value
    + fixed-prefix shard tiles proving both predicate dimensions stay
    bounded per shard (the parquet min/max pruning layout for combined
    user+time predicates; physical write = repartitionByRange(z)).

    The oracle pins the DEFAULTS (bits=8 → `& 255`, n_shards=4096 →
    `z >> 4`); zorder_layout itself validates n_shards is a power of
    two that fits the curve, so a non-default call raises rather than
    silently diverging from this SQL."""
    from file_indexer_spark.operators import sampling as sp

    return sp.zorder_layout(_events(spark, sf_dir))


@register("sim8_kmeans_ml")
def sim8_kmeans_ml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SIM8: multi-iteration Lloyd k-means (pyspark.ml) — the iterative
    refinement the one-shot IVF seeding skips. kmeans|| init is not
    replicable in an external SQL engine → rows-only driver check;
    pytest pins k non-empty clusters, total assignment, and
    SSE <= the one-shot IVF seeding's SSE."""
    return sim.kmeans_clusters(_table(spark, sf_dir, "embeddings"))


@register(
    "dd11_cluster_consolidation",
    f"""
    -- SemDeDup consolidation report: per multi-doc near-dup cluster,
    -- size + kept canonical + chars saved by dropping the rest (A13's
    -- wasted-space accounting on dd7's components).
    WITH RECURSIVE
    {_DD7_PAIRS_CTES},
    edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
              UNION SELECT doc_b, doc_a FROM pairs),
    reach(src, dst) AS (
        SELECT src, dst FROM edges
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
        WHERE e.dst <> r.src
    ),
    labels AS (
        SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
        FROM reach GROUP BY src
    ),
    assigned AS (
        SELECT d.doc_id, coalesce(l.cluster_id, d.doc_id) AS cluster_id,
               d.n_chars
        FROM documents d LEFT JOIN labels l ON l.doc_id = d.doc_id)
    SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS chars_total,
           CAST(SUM(CASE WHEN doc_id <> cluster_id THEN n_chars ELSE 0 END)
                AS BIGINT) AS chars_saved
    FROM assigned GROUP BY cluster_id HAVING COUNT(*) >= 2
    ORDER BY cluster_id
    """,
)
def dd11_cluster_consolidation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DD11: dd7's components rolled into the dedup-win report — one
    join with the pruned (doc_id, n_chars) projection + one cluster_id
    agg; the curation number ('chars_saved') a training pipeline
    quotes after consolidating near-duplicates."""
    docs = _table(spark, sf_dir, "documents")
    return dd.cluster_consolidation(
        docs, dd.dedup_clusters(docs, dd.minhash_lsh_pairs(docs))
    )


@register(
    "m8_video_shot_cuts",
    """
    -- Shot-boundary detection from DECODED video frames: per
    -- consecutive-frame pair the integer SAD (sum of absolute pixel
    -- diffs) and the cut flag; scenes change every 3 frames in the
    -- fixture so intra-scene SAD is exactly 0. The oracle recomputes
    -- every pixel from the doc_id derivation.
    WITH base AS (
        SELECT doc_id, text, length(text) AS L,
               4 + doc_id % 3 AS w, 3 + doc_id % 2 AS h,
               6 + doc_id % 5 AS nf
        FROM documents WHERE doc_id % 17 <> 0 AND doc_id % 19 <> 0),
    sads AS (
        SELECT doc_id, u.f AS frame_idx, u.sad FROM (
            SELECT doc_id,
                   unnest(list_transform(range(1, nf), f -> {
                       'f': CAST(f AS INTEGER),
                       'sad': CAST(list_sum(list_transform(range(0, w * h), p ->
                           abs(ascii(substr(text,
                                   CAST(((f // 3) * 31 + p) % L + 1 AS BIGINT), 1))
                             - ascii(substr(text,
                                   CAST((((f - 1) // 3) * 31 + p) % L + 1 AS BIGINT), 1))
                           ))) AS BIGINT)})) AS u
            FROM base))
    SELECT doc_id AS media_id, frame_idx, sad, sad >= 1 AS is_cut,
           CAST(NULL AS VARCHAR) AS decode_error
    FROM sads
    UNION ALL
    SELECT doc_id, NULL, NULL, NULL,
           CASE WHEN doc_id % 17 = 0 THEN 'null content' ELSE 'not VID1' END
    FROM documents WHERE doc_id % 17 = 0 OR doc_id % 19 = 0
    ORDER BY media_id, frame_idx
    """,
)
def m8_video_shot_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M8: the VIDEO-modality temporal operator — a codec-free
    container (magic + frame count/geometry + grayscale rasters)
    decoded where the blobs sit, vectorized inter-frame SAD, cut flags
    at scene changes; errors as rows. Completes the modality set
    (image m2b/m5/m6*, audio m7*, video m3 sampling + this temporal
    structure pass) with every one hash-gated."""
    from file_indexer_spark.operators import multimodal as mm

    media = mm.video_media_from_docs(_table(spark, sf_dir, "documents"))
    return mm.video_shot_boundaries(media).orderBy("media_id", "frame_idx")


@register(
    "m8b_video_keyframes",
    """
    -- Keyframe extraction: the first frame of every shot (frame 0 +
    -- each SAD-detected cut), md5-fingerprinted raster. The oracle
    -- recomputes BOTH the cut set and every fingerprint byte from the
    -- derivation (ASCII corpus: chr() concatenation's UTF-8 equals
    -- the raster bytes).
    WITH base AS (
        SELECT doc_id, text, length(text) AS L,
               4 + doc_id % 3 AS w, 3 + doc_id % 2 AS h,
               6 + doc_id % 5 AS nf
        FROM documents WHERE doc_id % 17 <> 0 AND doc_id % 19 <> 0),
    sads AS (
        SELECT doc_id, u.f AS frame_idx, u.sad FROM (
            SELECT doc_id,
                   unnest(list_transform(range(1, nf), f -> {
                       'f': CAST(f AS INTEGER),
                       'sad': CAST(list_sum(list_transform(range(0, w * h), p ->
                           abs(ascii(substr(text,
                                   CAST(((f // 3) * 31 + p) % L + 1 AS BIGINT), 1))
                             - ascii(substr(text,
                                   CAST((((f - 1) // 3) * 31 + p) % L + 1 AS BIGINT), 1))
                           ))) AS BIGINT)})) AS u
            FROM base)),
    keys AS (
        SELECT doc_id, 0 AS frame_idx FROM base
        UNION ALL
        SELECT doc_id, frame_idx FROM sads WHERE sad >= 1),
    numbered AS (
        SELECT doc_id, frame_idx,
               CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                                       ORDER BY frame_idx) - 1 AS INTEGER)
                   AS scene_idx
        FROM keys)
    SELECT n.doc_id AS media_id, n.scene_idx,
           CAST(n.frame_idx AS INTEGER) AS frame_idx,
           md5(array_to_string(list_transform(range(0, b.w * b.h), p ->
               chr(ascii(substr(b.text,
                   CAST(((n.frame_idx // 3) * 31 + p) % b.L + 1 AS BIGINT),
                   1)))), '')) AS frame_md5
    FROM numbered n JOIN base b ON n.doc_id = b.doc_id
    ORDER BY media_id, scene_idx
    """,
)
def m8b_video_keyframes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M8b: one representative frame per shot — m8's cut table driving
    the m3-style sampler, fingerprints hash-gated bit-for-bit."""
    from file_indexer_spark.operators import multimodal as mm

    media = mm.video_media_from_docs(_table(spark, sf_dir, "documents"))
    return mm.video_keyframes(media)


# ------------------------------------- bounds companions (round 7)
#
# Driver-checkable tolerance contracts for the rows-only operators:
# each companion computes its operator's VIOLATION SET entirely in
# Spark (sketch/MLlib output joined against its exact deterministic
# twin) and gates it against an EMPTY oracle of the same schema
# (operators/bounds.py). err:"no_oracle" rows become hash-green rows;
# a contract break emits rows and fails the gate loudly. Tests in
# tests/test_bounds.py prove each companion is NON-vacuous (corrupted
# twins produce violations).

def _bounds_oracle() -> str:
    from file_indexer_spark.operators.bounds import EMPTY_VIOLATIONS_SQL

    return EMPTY_VIOLATIONS_SQL


@register(
    "t6a_bounds",
    """
    -- t6a's rank-tolerance contract: expected-empty violation set
    -- (every percentile_approx value between the exact p+/-0.02
    -- percentiles; non-sketch columns exact). Computed in Spark;
    -- the contract is "no rows".
    SELECT CAST(NULL AS VARCHAR) AS scope, CAST(NULL AS VARCHAR) AS metric,
           CAST(NULL AS DOUBLE) AS observed, CAST(NULL AS DOUBLE) AS lo,
           CAST(NULL AS DOUBLE) AS hi
    WHERE FALSE
    """,
)
def t6a_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T6a-BOUNDS: the percentile_approx sketch vs its exact twin t6 —
    rank tolerance ±0.02 per group, exact equality on n_docs/mean/max;
    one key-aligned join over t6a's own plan + an O(groups) explode."""
    from file_indexer_spark.operators import bounds as bd

    docs = _table(spark, sf_dir, "documents")
    return bd.percentile_bounds(
        docs,
        tx.length_percentiles(docs),
        tx.length_percentiles_approx(docs),
        key="source",
        val="n_chars",
        pcols=[("p50_chars", 0.5), ("p90_chars", 0.9), ("p99_chars", 0.99)],
    )


@register(
    "e12a_bounds",
    """
    -- e12a's rank-tolerance contract (see t6a_bounds): expected empty.
    SELECT CAST(NULL AS VARCHAR) AS scope, CAST(NULL AS VARCHAR) AS metric,
           CAST(NULL AS DOUBLE) AS observed, CAST(NULL AS DOUBLE) AS lo,
           CAST(NULL AS DOUBLE) AS hi
    WHERE FALSE
    """,
)
def e12a_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E12a-BOUNDS: inter-arrival gap percentile sketch vs exact e12 —
    rank tolerance ±0.02 per event type, n_gaps exact."""
    from file_indexer_spark.operators import bounds as bd

    events = _events(spark, sf_dir)
    gaps = ev._event_gaps(events)
    return bd.percentile_bounds(
        gaps,
        ev.gap_percentiles(events),
        ev.gap_percentiles_approx(events),
        key="event_type",
        val="gap_us",
        pcols=[("p50_us", 0.5), ("p90_us", 0.9), ("p99_us", 0.99)],
    )


@register(
    "e13a_bounds",
    """
    -- e13a's HLL++ error contract: |approx - exact| <= max(0.2*exact, 2)
    -- per day (4 sigma at rsd=0.05), n_events exact. Expected empty.
    SELECT CAST(NULL AS VARCHAR) AS scope, CAST(NULL AS VARCHAR) AS metric,
           CAST(NULL AS DOUBLE) AS observed, CAST(NULL AS DOUBLE) AS lo,
           CAST(NULL AS DOUBLE) AS hi
    WHERE FALSE
    """,
)
def e13a_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E13a-BOUNDS: the distinct-count sketch vs exact e13 per day."""
    from file_indexer_spark.operators import bounds as bd

    events = _events(spark, sf_dir)
    return bd.hll_bounds(ev.daily_uniques(events), ev.daily_uniques_approx(events))


@register(
    "st6_bounds",
    """
    -- st6's bit-identical twin contract: the streaming HLL merge must
    -- equal the batch sketch e13a EXACTLY (register merges are
    -- lossless). Expected empty.
    SELECT CAST(NULL AS VARCHAR) AS scope, CAST(NULL AS VARCHAR) AS metric,
           CAST(NULL AS DOUBLE) AS observed, CAST(NULL AS DOUBLE) AS lo,
           CAST(NULL AS DOUBLE) AS hi
    WHERE FALSE
    """,
)
def st6_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST6-BOUNDS: the real-stream HLL rollup (two micro-batches,
    availableNow) diffed against the batch e13a sketch column by
    column — sketch-merge losslessness as a driver-checkable gate."""
    from file_indexer_spark.operators import bounds as bd

    stream = QUERIES["st6_streaming_uniques"](spark, sf_dir)
    batch = ev.daily_uniques_approx(_events(spark, sf_dir))
    return bd.twin_mismatch(stream, batch, key="day")


@register(
    "dd6_bounds",
    """
    -- dd6's recall contract vs the deterministic expression-LSH twin
    -- dd3: recall >= 0.9 over >= 20 base pairs. Expected empty.
    SELECT CAST(NULL AS VARCHAR) AS scope, CAST(NULL AS VARCHAR) AS metric,
           CAST(NULL AS DOUBLE) AS observed, CAST(NULL AS DOUBLE) AS lo,
           CAST(NULL AS DOUBLE) AS hi
    WHERE FALSE
    """,
)
def dd6_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DD6-BOUNDS: MLlib MinHashLSH pair recall vs dd3 (both verify
    candidates with the same exact Jaccard, so disagreement beyond the
    floor means the ML path lost planted near-dups). Pair sets reduce
    to one stats row on the executors — nothing collects."""
    from file_indexer_spark.operators import bounds as bd
    from file_indexer_spark.operators import dedup as dd

    docs = _table(spark, sf_dir, "documents")
    return bd.recall_floor(
        dd.minhash_lsh_pairs(docs).select("doc_a", "doc_b"),
        dd.minhash_lsh_ml_pairs(docs).select("doc_a", "doc_b"),
        keys=["doc_a", "doc_b"],
        floor=0.9,
        min_base=20,
        metric="recall_vs_dd3",
    )


@register(
    "sim3_bounds",
    """
    -- sim3's recall contract vs exact sim1 top-k: recall >= 0.5 and
    -- exactly N_QUERIES*TOP_K emitted pairs. Expected empty.
    SELECT CAST(NULL AS VARCHAR) AS scope, CAST(NULL AS VARCHAR) AS metric,
           CAST(NULL AS DOUBLE) AS observed, CAST(NULL AS DOUBLE) AS lo,
           CAST(NULL AS DOUBLE) AS hi
    WHERE FALSE
    """,
)
def sim3_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SIM3-BOUNDS: BRP-LSH neighbor recall vs sim1's exact cosine
    top-k (metrics differ — euclidean bucketing vs cosine ranking — so
    the pinned floor is the majority-overlap 0.5 the pytest gate has
    carried since round 2), plus the exact output-cardinality check."""
    from file_indexer_spark.operators import bounds as bd
    from file_indexer_spark.operators import similarity as sim

    emb = _table(spark, sf_dir, "embeddings")
    probe = sim.brp_lsh_neighbors(emb).select("query_id", "neighbor_id")
    n_expected = float(sim.N_QUERIES * sim.TOP_K)
    n_probe = probe.agg(F.count("*").cast("double").alias("n_probe"))
    return bd.recall_floor(
        sim.cosine_topk(emb).select("query_id", "neighbor_id"),
        probe,
        keys=["query_id", "neighbor_id"],
        floor=0.5,
        min_base=int(n_expected),
        metric="recall_vs_exact_topk",
        extra_checks=[
            (
                n_probe,
                (
                    F.col("n_probe") != n_expected,
                    F.lit("global"),
                    "approx_pair_count",
                    F.col("n_probe"),
                    F.lit(n_expected),
                    F.lit(n_expected),
                ),
            )
        ],
    )


@register(
    "sim8_bounds",
    """
    -- sim8's Lloyd invariants: exactly k non-empty clusters, total
    -- assignment, SSE <= one-shot IVF seeding's SSE (iterating only
    -- improves the objective). Expected empty.
    SELECT CAST(NULL AS VARCHAR) AS scope, CAST(NULL AS VARCHAR) AS metric,
           CAST(NULL AS DOUBLE) AS observed, CAST(NULL AS DOUBLE) AS lo,
           CAST(NULL AS DOUBLE) AS hi
    WHERE FALSE
    """,
)
def sim8_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SIM8-BOUNDS: the kmeans|| invariants as a violation set, with
    both SSEs (Lloyd centers vs one-shot hash seeds) computed
    DISTRIBUTED — k centroids broadcast, per-vector min squared
    distance, one sum — so the gate itself is 100 TB-shaped."""
    from file_indexer_spark.operators import bounds as bd

    return bd.kmeans_bounds(_table(spark, sf_dir, "embeddings"))


@register(
    "st11_update_mode_counts",
    """
    -- st11: the update-mode output class — final state of the
    -- changelog (last emission per key) equals the batch windowed
    -- aggregate. Same rollup as st1's oracle.
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
           CAST(date_trunc('hour', ts) + INTERVAL 1 HOUR AS TIMESTAMP) AS window_end,
           event_type,
           COUNT(*) AS n_events,
           round(SUM(value), 4) AS total_value
    FROM events
    GROUP BY 1, 2, 3
    ORDER BY 1, 3
    """,
)
def st11_update_mode_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST11: UPDATE-mode streaming aggregation (the one output-mode
    class st1-st10 left unexercised at the driver): watermarked hourly
    counts drained via foreachBatch, each micro-batch emitting only the
    keys whose aggregate CHANGED — an upsert changelog. The gate
    reduces the changelog to its final state (last emission per key)
    and hash-matches the batch oracle.

    Arrivals are CHRONOLOGICAL halves (the st8 pattern) — update mode
    honors the watermark, so a time-interleaved split would legally
    drop the second batch's late rows; splitting on the midpoint
    timestamp keeps every arrival ahead of the watermark, making
    stream-equals-batch exact. The boundary hour spans both arrivals
    and re-emits with a grown count (intermediate re-emission is pinned
    in tests/test_streaming.py on a controlled fixture)."""
    import os

    from file_indexer_spark.streaming import windows as sw

    tune_session(spark)
    base, tag = _stream_workdir("fis_st11", sf_dir)
    src = os.path.join(base, "src")
    out = os.path.join(base, "changelog")
    ev2 = events_df(spark, sf_dir)
    bounds = ev2.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")).first()
    mid = bounds["lo"] + (bounds["hi"] - bounds["lo"]) / 2
    _land_arrivals(
        src,
        [ev2.filter(F.col("ts") <= F.lit(mid)), ev2.filter(F.col("ts") > F.lit(mid))],
    )
    stream = sw.read_events_stream(spark, src, max_files_per_trigger=1)
    sw.run_update_mode_to_parquet(sw.windowed_counts(stream), out)
    return sw.last_emission(
        spark, out, ["window_start", "window_end", "event_type"]
    ).orderBy("window_start", "event_type")


@register(
    "m7c_audio_dup_groups",
    f"""
    -- Perceptual audio duplicate groups: per-clip energy-envelope
    -- fingerprint (per-frame integer energy quantized to bit_length,
    -- '-'-joined in frame order) grouped J2-style. The oracle
    -- recomputes EVERY frame energy from the sample derivation;
    -- length(bin(E)) is bit_length for E > 0.
    WITH {_M7_CTES},
    env AS (
        SELECT doc_id,
               array_to_string(list_transform(energies, E ->
                   CAST((CASE WHEN E = 0 THEN 0
                              ELSE length(bin(E)) END) AS VARCHAR)), '-')
                   AS envelope
        FROM (
            SELECT doc_id,
                   list_transform(range(0, nf), f ->
                       CAST(list_sum(list_transform(
                           range(160 * f, 160 * f + 160),
                           i -> CAST(({_M7_SAMPLE}) AS BIGINT)
                                * CAST(({_M7_SAMPLE}) AS BIGINT))) AS BIGINT)
                   ) AS energies
            FROM base) t)
    SELECT envelope, CAST(COUNT(*) AS BIGINT) AS n_clips,
           MIN(doc_id) AS canonical_media_id
    FROM env GROUP BY envelope HAVING COUNT(*) >= 2
    ORDER BY envelope
    """,
)
def m7c_audio_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M7c: audio perceptual duplicate groups (modality symmetry with
    m6d) — loudness-envelope fingerprint, decode partition-local, one
    hash-shuffle on the fingerprint key."""
    from file_indexer_spark.operators import multimodal as mm

    media = mm.pcm_media_from_docs(_table(spark, sf_dir, "documents"))
    return mm.audio_duplicate_groups(media)


@register(
    "sim9_pq_encode",
    f"""
    -- Product quantization: M=8 subspaces x K'=16 md5-sampled
    -- codewords; per subspace the argmin slice-L2 codeword (ties to
    -- the smaller code), '-'-joined codes + summed min d2. Same IEEE
    -- fold, same md5 seed order => bit-exact across engines.
    WITH seeds AS (
        SELECT embedding AS c_emb,
               row_number() OVER (ORDER BY md5(vec_id::VARCHAR), vec_id) - 1
                   AS code
        FROM embeddings ORDER BY md5(vec_id::VARCHAR), vec_id
        LIMIT {sim.PQ_CODEWORDS}),
    pairs AS (
        SELECT v.vec_id, m.m, s.code,
               list_reduce(list_transform(range(8 * m.m + 1, 8 * m.m + 9),
                   i -> (v.embedding[i]::DOUBLE - s.c_emb[i]::DOUBLE)
                      * (v.embedding[i]::DOUBLE - s.c_emb[i]::DOUBLE)),
                   (x, y) -> x + y) AS d2
        FROM embeddings v, range(0, {sim.PQ_SUBSPACES}) m(m), seeds s),
    best AS (
        SELECT vec_id, m, code, d2,
               row_number() OVER (PARTITION BY vec_id, m
                                  ORDER BY d2, code) AS rn
        FROM pairs)
    SELECT vec_id,
           string_agg(code::VARCHAR, '-' ORDER BY m) AS pq_code,
           round(list_reduce(list(d2 ORDER BY m), (x, y) -> x + y), 6)
               AS recon_sse
    FROM best WHERE rn = 1
    GROUP BY vec_id ORDER BY vec_id
    """,
)
def sim9_pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SIM9: product quantization — the 64x-compression storage form an
    IVF-PQ index scans at 100 TB (below sim7's 4x int8). One broadcast
    join against the 128-row codebook, map-side slice-L2, two narrow
    hash aggs; deterministic codebook => full hash gate on a quantizer."""
    return sim.pq_encode(_table(spark, sf_dir, "embeddings"))


_PQ_DIM = sim.EMB_DIM // sim.PQ_SUBSPACES
# per-(row, subspace) slice-L2 against codebook column c_emb, 1-based
# DuckDB slicing, strict left-to-right fold (the sim9 oracle's shape)
_DUCK_SLICE_D2 = (
    f"list_reduce(list_transform(range({_PQ_DIM} * {{m}} + 1, "
    f"{_PQ_DIM} * {{m}} + {_PQ_DIM + 1}), "
    "i -> ({v}[i]::DOUBLE - {c}[i]::DOUBLE)"
    " * ({v}[i]::DOUBLE - {c}[i]::DOUBLE)), (x, y) -> x + y)"
)


@register(
    "sim10_ivfpq_topk",
    f"""
    -- IVF-PQ ADC search: sim2's inverted-list probing composed with
    -- sim9's product-quantized codes. Candidates come only from each
    -- query's nprobe nearest centroid lists; their distances are M
    -- table lookups into the query's precomputed (m, code)-ordered ADC
    -- table, summed by the strict m-ordered fold. Every stage is the
    -- already-hash-gated sim2/sim9 arithmetic => full hash gate on the
    -- composed index.
    WITH c AS ({_DUCK_NORMS}),
    cents AS (SELECT c.vec_id AS centroid_id, c.embedding AS c_emb, c.norm AS c_norm
              FROM c
              JOIN (SELECT MIN(vec_id) AS vec_id FROM embeddings GROUP BY label) reps
                ON c.vec_id = reps.vec_id),
    assign AS (
        SELECT vec_id, centroid_id FROM (
            SELECT v.vec_id, cents.centroid_id,
                   row_number() OVER (PARTITION BY v.vec_id ORDER BY
                        {_DUCK_DOT.format(a="v.embedding", b="cents.c_emb")}
                        / (v.norm * cents.c_norm) DESC, cents.centroid_id) AS rn
            FROM c v, cents) t
        WHERE rn = 1),
    seeds AS (
        SELECT embedding AS c_emb,
               row_number() OVER (ORDER BY md5(vec_id::VARCHAR), vec_id) - 1
                   AS code
        FROM embeddings ORDER BY md5(vec_id::VARCHAR), vec_id
        LIMIT {sim.PQ_CODEWORDS}),
    best AS (
        SELECT vec_id, m, code,
               row_number() OVER (PARTITION BY vec_id, m
                                  ORDER BY d2, code) AS rn
        FROM (
            SELECT v.vec_id, m.m, s.code,
                   {_DUCK_SLICE_D2.format(m="m.m", v="v.embedding", c="s.c_emb")} AS d2
            FROM embeddings v, range(0, {sim.PQ_SUBSPACES}) m(m), seeds s)),
    codes AS (
        SELECT vec_id, list(code ORDER BY m) AS codes
        FROM best WHERE rn = 1 GROUP BY vec_id),
    q AS (SELECT vec_id AS query_id, embedding AS q_emb, norm AS q_norm
          FROM c WHERE vec_id < {sim.N_QUERIES}),
    probes AS (
        SELECT query_id, centroid_id FROM (
            SELECT q.query_id, cents.centroid_id,
                   row_number() OVER (PARTITION BY q.query_id ORDER BY
                        {_DUCK_DOT.format(a="q.q_emb", b="cents.c_emb")}
                        / (q.q_norm * cents.c_norm) DESC, cents.centroid_id) AS rn
            FROM q, cents) t
        WHERE rn <= {sim.NPROBE}),
    qtab AS (
        SELECT query_id, list(qd2 ORDER BY m, code) AS tab FROM (
            SELECT q.query_id, m.m, s.code,
                   {_DUCK_SLICE_D2.format(m="m.m", v="q.q_emb", c="s.c_emb")} AS qd2
            FROM q, range(0, {sim.PQ_SUBSPACES}) m(m), seeds s)
        GROUP BY query_id),
    scored AS (
        SELECT p.query_id, cd.vec_id AS neighbor_id,
               list_reduce(list_transform(range(0, {sim.PQ_SUBSPACES}),
                   m -> t.tab[m * {sim.PQ_CODEWORDS} + cd.codes[m + 1] + 1]),
                   (x, y) -> x + y) AS adc_dist
        FROM probes p
        JOIN assign a ON a.centroid_id = p.centroid_id
        JOIN codes cd ON cd.vec_id = a.vec_id
        JOIN qtab t ON t.query_id = p.query_id
        WHERE cd.vec_id != p.query_id),
    ranked AS (
        SELECT query_id, neighbor_id,
               CAST(row_number() OVER (PARTITION BY query_id
                    ORDER BY adc_dist, neighbor_id) AS INTEGER) AS rank,
               adc_dist
        FROM scored)
    SELECT query_id, neighbor_id, rank, round(adc_dist, 6) AS adc_dist
    FROM ranked WHERE rank <= {sim.TOP_K}
    ORDER BY query_id, rank
    """,
)
def sim10_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SIM10: IVF-PQ — inverted-list pruning (sim2) over product-
    quantized codes (sim9) scanned by asymmetric distance computation:
    the FAISS-shaped index a 100 TB vector corpus actually serves.
    Corpus codes never reshuffle; probes + ADC tables broadcast."""
    return sim.ivfpq_topk(_table(spark, sf_dir, "embeddings"))


@register(
    "w10_compaction_roundtrip",
    with_files_cte(
        """
    -- OPTIMIZE gate: after fragmented commits + compact(1), content is
    -- byte-identical to the mutation algebra AND every live data dir
    -- holds exactly one parquet file (the engine measures the real
    -- max; the oracle pins the literal 1 — a compaction that skips a
    -- dir or loses a row hash-mismatches).
    SELECT path, filename,
           CASE WHEN file_size % 3 = 0 THEN 'C2' ELSE checksum END AS checksum,
           modification_datetime, file_size, indexed_at,
           CAST(1 AS BIGINT) AS max_files_per_dir
    FROM files ORDER BY path, filename
    """
    ),
)
def w10_compaction_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W10: the small-file maintenance gate — fragment a bucketed table
    (16-task staging writes), mutate it, OPTIMIZE to one file per
    bucket dir, and hash-gate BOTH the surviving content and the
    physical file-count contract. The fixture asserts it actually
    fragmented first (a pre-compacted table would make the gate
    vacuous — the h9 lesson)."""
    import glob
    import hashlib
    import os
    import shutil
    import tempfile

    from file_indexer_spark.indexer.files_table import FilesTable

    tune_session(spark)
    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    base = os.path.join(tempfile.gettempdir(), f"fis_w10_{tag}")
    shutil.rmtree(base, ignore_errors=True)

    t = FilesTable(spark, os.path.join(base, "db"), buckets=8)
    original = files_df(spark, sf_dir)
    t.overwrite(original.repartition(16))
    t.upsert(
        original.filter(F.col("file_size") % 3 == 0)
        .withColumn("checksum", F.lit("C2"))
        .repartition(16)
    )

    def files_per_dir() -> list[int]:
        m = t._load_manifest()
        return [
            len(glob.glob(os.path.join(t.location, rel, "*.parquet")))
            for rel in m["entries"].values()
        ]

    if max(files_per_dir()) <= 1:
        raise RuntimeError("w10 fixture failed to fragment — gate would be vacuous")
    t.compact(files_per_bucket=1)
    audit = max(files_per_dir())
    return (
        t.read()
        .withColumn("max_files_per_dir", F.lit(audit).cast("long"))
        .orderBy("path", "filename")
    )


# ------------------------------------- cross-modal duplicates (round 8)

from file_indexer_spark.operators import crossmodal as xm  # noqa: E402


@register(
    "x1_cross_modal_dup_assets",
    f"""
    -- x1: duplicate-asset groups across ALL modalities in one J2-shaped
    -- table with A13 wasted-unit accounting per group. Each branch is
    -- the already-hash-gated derivation of its modality's fingerprint
    -- (dd7 components / m6c ahash64 / m7c envelope / m8b frame md5s),
    -- grouped and unioned; all accounting integer-exact.
    WITH RECURSIVE
    {_DD7_PAIRS_CTES},
    edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
              UNION SELECT doc_b, doc_a FROM pairs),
    reach(src, dst) AS (
        SELECT src, dst FROM edges
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
        WHERE e.dst <> r.src
    ),
    labels AS (
        SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
        FROM reach GROUP BY src
    ),
    assigned AS (
        SELECT d.doc_id, coalesce(l.cluster_id, d.doc_id) AS cluster_id,
               d.n_chars
        FROM documents d LEFT JOIN labels l ON l.doc_id = d.doc_id),
    text_groups AS (
        SELECT 'text' AS modality, cluster_id::VARCHAR AS group_key,
               CAST(COUNT(*) AS BIGINT) AS n_assets,
               cluster_id AS canonical_asset_id,
               'chars' AS unit,
               CAST(SUM(CASE WHEN doc_id <> cluster_id THEN n_chars ELSE 0 END)
                    AS BIGINT) AS wasted_units
        FROM assigned GROUP BY cluster_id HAVING COUNT(*) >= 2),
    {_M6C_CTES},
    image_groups AS (
        SELECT 'image' AS modality, ahash64 AS group_key,
               CAST(COUNT(*) AS BIGINT) AS n_assets,
               MIN(media_id) AS canonical_asset_id,
               'pixels' AS unit,
               CAST(SUM(width * height)
                    - min_by(width * height, media_id) AS BIGINT)
                   AS wasted_units
        FROM fp GROUP BY ahash64 HAVING COUNT(*) >= 2),
    a_base AS (
        SELECT doc_id, text, length(text) AS L, 4 + doc_id % 4 AS nf
        FROM documents
        WHERE doc_id % 9 <> 0 AND doc_id % 13 <> 0 AND doc_id % 7 <> 0),
    a_env AS (
        SELECT doc_id, nf,
               array_to_string(list_transform(energies, E ->
                   CAST((CASE WHEN E = 0 THEN 0
                              ELSE length(bin(E)) END) AS VARCHAR)), '-')
                   AS envelope
        FROM (
            SELECT doc_id, nf,
                   list_transform(range(0, nf), f ->
                       CAST(list_sum(list_transform(
                           range(160 * f, 160 * f + 160),
                           i -> CAST(({_M7_SAMPLE}) AS BIGINT)
                                * CAST(({_M7_SAMPLE}) AS BIGINT))) AS BIGINT)
                   ) AS energies
            FROM a_base) t),
    audio_groups AS (
        SELECT 'audio' AS modality, envelope AS group_key,
               CAST(COUNT(*) AS BIGINT) AS n_assets,
               MIN(doc_id) AS canonical_asset_id,
               'samples' AS unit,
               CAST(SUM(nf * 160) - min_by(nf * 160, doc_id) AS BIGINT)
                   AS wasted_units
        FROM a_env GROUP BY envelope HAVING COUNT(*) >= 2),
    v_base AS (
        SELECT doc_id, text, length(text) AS L,
               4 + doc_id % 3 AS w, 3 + doc_id % 2 AS h,
               6 + doc_id % 5 AS nf
        FROM documents WHERE doc_id % 17 <> 0 AND doc_id % 19 <> 0),
    v_fp AS (
        SELECT doc_id, nf * w * h AS n_pixels,
               printf('%dx%d:', w, h) || array_to_string(
                   list_transform(range(0, nf), f ->
                       md5(array_to_string(list_transform(range(0, w * h), p ->
                           chr(ascii(substr(text,
                               CAST(((f // 3) * 31 + p) % L + 1 AS BIGINT),
                               1)))), ''))), '-') AS fingerprint
        FROM v_base),
    video_groups AS (
        SELECT 'video' AS modality, fingerprint AS group_key,
               CAST(COUNT(*) AS BIGINT) AS n_assets,
               MIN(doc_id) AS canonical_asset_id,
               'pixels' AS unit,
               CAST(SUM(n_pixels) - min_by(n_pixels, doc_id) AS BIGINT)
                   AS wasted_units
        FROM v_fp GROUP BY fingerprint HAVING COUNT(*) >= 2)
    SELECT * FROM text_groups
    UNION ALL SELECT * FROM image_groups
    UNION ALL SELECT * FROM audio_groups
    UNION ALL SELECT * FROM video_groups
    ORDER BY modality, group_key
    """,
)
def x1_cross_modal_dup_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1: the cross-modal duplicate-asset report — dd7 text
    components, m6d image groups, m7c audio groups, and whole-video
    fingerprint groups in ONE table with wasted-unit accounting (A13
    corpus-wide). Each branch keeps its own 100 TB shape; the union
    adds no cross-modality shuffle."""
    return xm.duplicate_assets(_table(spark, sf_dir, "documents"))


@register(
    "st12_late_data_accounting",
    """
    -- st12: the late-data DROP contract. Three arrivals (two
    -- chronological halves split at the floor-second midpoint + a
    -- straggler replay of event_id%5==0): Spark's watermark commits
    -- one planned batch BEHIND the data (the wm enforced in batch N
    -- is computed from batches 0..N-2 — measured, then gated here,
    -- not assumed), so the replay batch's enforcement watermark is
    -- max(first-half ts) - 4h; a replayed row is DROPPED iff its
    -- hour-window end <= that, and DOUBLE-COUNTED otherwise.
    -- n_events pins the kept set (the STREAM's actual final state —
    -- a drop-rule drift re-counts a window and hash-fails),
    -- dropped_late_rows the per-window drop count, and dropped_total
    -- the corpus-wide A13-style number. Spark's own
    -- numRowsDroppedByWatermark metric proved to UNDERCOUNT at
    -- sf0.01 (355 of 984; final state said 984), so it is a sanity
    -- ceiling in the engine, not a gated column.
    WITH mid AS (
        SELECT min(ts) + to_seconds(
                   ((epoch_us(max(ts)) - epoch_us(min(ts))) // 1000000) // 2
               ) AS m
        FROM events),
    wm AS (
        SELECT max(ts) - INTERVAL 4 HOUR AS w
        FROM events WHERE ts <= (SELECT m FROM mid)),
    base AS (
        SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
               CAST(date_trunc('hour', ts) + INTERVAL 1 HOUR AS TIMESTAMP)
                   AS window_end,
               event_id
        FROM events),
    kept AS (
        SELECT window_start, window_end,
               CAST(COUNT(*) + SUM(CASE WHEN event_id % 5 = 0
                                        AND window_end > (SELECT w FROM wm)
                                   THEN 1 ELSE 0 END) AS BIGINT) AS n_events
        FROM base GROUP BY 1, 2),
    drops AS (
        SELECT window_start, CAST(COUNT(*) AS BIGINT) AS dropped
        FROM base
        WHERE event_id % 5 = 0 AND window_end <= (SELECT w FROM wm)
        GROUP BY 1)
    SELECT k.window_start, k.window_end, k.n_events,
           COALESCE(d.dropped, 0) AS dropped_late_rows,
           CAST((SELECT COUNT(*) FROM base
                 WHERE event_id % 5 = 0
                   AND window_end <= (SELECT w FROM wm)) AS BIGINT)
               AS dropped_total
    FROM kept k LEFT JOIN drops d USING (window_start)
    ORDER BY k.window_start
    """,
)
def st12_late_data_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST12: late-data accounting — the last unobserved streaming
    contract. A replay of already-seen rows arrives AFTER the
    watermark advanced; the gate hash-pins (a) the final per-window
    state (kept replays double-count, dropped ones don't), (b) the
    per-window batch derivation of the dropped set, and (c) Spark's
    own engine-observed drop total, all against one DuckDB derivation.
    State stays O(open windows); the changelog is O(windows x
    batches)."""
    import os

    from file_indexer_spark.streaming import windows as sw

    tune_session(spark)
    base, tag = _stream_workdir("fis_st12", sf_dir)
    src = os.path.join(base, "src")
    out = os.path.join(base, "changelog")
    ev2 = events_df(spark, sf_dir)
    bounds = ev2.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")).first()
    delta = bounds["hi"] - bounds["lo"]
    half_s = (delta.days * 86400 + delta.seconds) // 2  # floor-second mid
    mid = bounds["lo"] + __import__("datetime").timedelta(seconds=half_s)
    stragglers = ev2.filter(F.col("event_id") % 5 == 0)
    first_half = ev2.filter(F.col("ts") <= F.lit(mid))
    _land_arrivals(
        src,
        [
            first_half,
            ev2.filter(F.col("ts") > F.lit(mid)),
            stragglers,
        ],
    )
    stream = sw.read_events_stream(spark, src, max_files_per_trigger=1)
    q = sw.run_update_mode_to_parquet(sw.windowed_total_counts(stream), out)
    observed = sw.dropped_by_watermark_total(q)

    final = sw.last_emission(spark, out, ["window_start", "window_end"])
    # enforcement watermark for the replay batch: max ts of BATCH 0
    # minus the delay (Spark's one-planned-batch watermark lag)
    max_first = first_half.agg(F.max("ts")).first()[0]
    wm = max_first - __import__("datetime").timedelta(hours=4)
    dropped = (
        stragglers.select(
            F.date_trunc("hour", "ts").alias("window_start"),
            (F.date_trunc("hour", "ts") + F.expr("INTERVAL 1 HOUR")).alias(
                "window_end"
            ),
        )
        .filter(F.col("window_end") <= F.lit(wm))
        .groupBy("window_start")
        .agg(F.count("*").cast("long").alias("dropped_late_rows"))
    )
    total = dropped.agg(F.sum("dropped_late_rows")).first()[0] or 0
    # Spark's numRowsDroppedByWatermark UNDERCOUNTS (pre-shuffle
    # filtering isn't metered), so it can't be the gated number — but
    # an observed count EXCEEDING the derivation would mean the drop
    # rule drifted, and that must fail loudly rather than hash-pass.
    if observed > total:
        raise RuntimeError(
            f"st12: engine reported {observed} watermark-dropped rows, "
            f"derivation predicts {total} — drop semantics drifted"
        )
    return (
        final.join(dropped, ["window_start"], "left")
        .select(
            "window_start",
            "window_end",
            F.col("n_events").cast("long").alias("n_events"),
            F.coalesce("dropped_late_rows", F.lit(0)).cast("long").alias(
                "dropped_late_rows"
            ),
            F.lit(int(total)).cast("long").alias("dropped_total"),
        )
        .orderBy("window_start")
    )
