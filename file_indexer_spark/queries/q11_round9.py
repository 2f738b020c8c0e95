"""Registered queries — round 9: streaming near-dup ingestion (st13),
cross-modal fingerprint append (x3), FilesTable schema evolution (w11),
streaming ANN index ingestion (sim13).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from file_indexer_spark.operators import crossmodal as xm  # noqa: F401
from file_indexer_spark.operators import dedup as dd  # noqa: F401
from file_indexer_spark.registry_core import (  # noqa: F401
    ORACLES,
    QUERIES,
    _events,
    _files,
    _land_arrivals,
    _stream_workdir,
    _table,
    register,
)
from file_indexer_spark.session import tune_session  # noqa: F401
from file_indexer_spark.tables import (  # noqa: F401
    events_df,
    files_df,
    load_table,
    with_files_cte,
)


# st13 shares dd7's oracle VERBATIM: after draining a 3-arrival
# chronological stream through the foreachBatch near-dup ingest, the
# stored assignment state must equal dd7 recomputed from scratch over
# the whole corpus — the hash gate proves the probe→refresh ingest loop
# is lossless across micro-batches (including cross-batch pairs and
# late cluster merges, which greedy drop-on-arrival gets wrong).
@register("st13_streaming_neardup_ingest", ORACLES["dd7_dedup_clusters"])
def st13_streaming_neardup_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST13: near-dup dedup AT INGESTION — the streaming rendition of
    the dd12/dd13 incremental family. Documents arrive chronologically
    in three micro-batches (a large base drop + two ingest batches);
    each batch probes the materialized LSH band index, refreshes only
    the touched clusters, appends its signatures, and logs keep/drop
    decisions. The gate returns the final stored assignment."""
    import os

    from file_indexer_spark.streaming import neardup as snd

    tune_session(spark)
    base, _ = _stream_workdir("fis_st13", sf_dir)
    src = os.path.join(base, "src")
    state = os.path.join(base, "state")
    ckpt = os.path.join(base, "ckpt")
    docs = _table(spark, sf_dir, "documents")
    hi = docs.agg(F.max("doc_id")).first()[0]
    c1, c2 = int(hi * 8 // 10), int(hi * 9 // 10)
    cols = ["doc_id", "text"]
    _land_arrivals(
        src,
        [
            docs.filter(F.col("doc_id") <= c1).select(*cols),
            docs.filter((F.col("doc_id") > c1) & (F.col("doc_id") <= c2)).select(*cols),
            docs.filter(F.col("doc_id") > c2).select(*cols),
        ],
    )
    stream = snd.read_docs_stream(spark, src, max_files_per_trigger=1)
    snd.ingest_neardup_stream(spark, stream, state, ckpt)
    return (
        snd.final_assignments(spark, state)
        .select("doc_id", "cluster_id", "is_canonical")
        .orderBy("doc_id")
    )


# x3 shares x1's oracle VERBATIM: after appending an ingest batch to
# the materialized fingerprint state (media rows decoded from the batch
# blobs only; text clusters refreshed through the stored LSH index),
# the report over the stored tables must equal x1 recomputed over the
# full corpus — the hash gate proves the append is lossless.
@register("x3_dup_assets_append", ORACLES["x1_cross_modal_dup_assets"])
def x3_dup_assets_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3: cross-modal fingerprint APPEND — completes the compute-once
    family's symmetry (ANN has sim12, dedup has dd12/dd13). The ingest
    batch (doc_id % 10 == 7) decodes only its own blobs; its media
    member rows are parquet APPENDS, the text members are refreshed via
    the stored band index (dd12 probe + dd13 refresh) into a fresh
    version, and the report re-runs over re-reads — the base corpus is
    never re-decoded or re-signed."""
    import os

    tune_session(spark)
    docs = _table(spark, sf_dir, "documents")
    new = docs.filter(F.col("doc_id") % 10 == 7)
    base = docs.filter(F.col("doc_id") % 10 != 7)
    workdir, _ = _stream_workdir("fis_x3", sf_dir)

    def p(name: str, version: str | None = None) -> str:
        return os.path.join(workdir, name if version is None else f"{name}/{version}")

    state0 = xm.fingerprint_state(base)
    for name in ("image_members", "audio_members", "video_members",
                 "lsh_bands", "lsh_shingle_sets"):
        state0[name].write.mode("overwrite").parquet(p(name))
    state0["text_members"].write.mode("overwrite").parquet(p("text_members", "v0"))

    stored = {
        name: spark.read.parquet(p(name))
        for name in ("image_members", "audio_members", "video_members",
                     "lsh_bands", "lsh_shingle_sets")
    }
    stored["text_members"] = spark.read.parquet(p("text_members", "v0"))
    # text refresh consumes the PRE-append index state; write it first
    xm.fingerprint_state_append(stored, new)["text_members"].write.mode(
        "overwrite"
    ).parquet(p("text_members", "v1"))
    # media + index: batch-only slices, appended to the stored dirs
    xm._image_members(new).write.mode("append").parquet(p("image_members"))
    xm._audio_members(new).write.mode("append").parquet(p("audio_members"))
    xm._video_members(new).write.mode("append").parquet(p("video_members"))
    batch_lsh = dd.lsh_index_tables(new)
    batch_lsh["bands"].write.mode("append").parquet(p("lsh_bands"))
    batch_lsh["shingle_sets"].write.mode("append").parquet(p("lsh_shingle_sets"))

    return xm.duplicate_assets_from_tables(
        {
            "text_members": spark.read.parquet(p("text_members", "v1")),
            "image_members": spark.read.parquet(p("image_members")),
            "audio_members": spark.read.parquet(p("audio_members")),
            "video_members": spark.read.parquet(p("video_members")),
        }
    )


@register(
    "w12_pruned_point_lookup",
    with_files_cte(
        """
    -- w12: manifest-pruned key probe — the Spark answer to the
    -- reference's embedded point query. The probe set is the 5
    -- smallest PKs; the engine hashes them to their buckets and opens
    -- ONLY those data dirs. `pruned` audits the PHYSICAL read (from
    -- inputFiles(): distinct data dirs opened <= 5 probe keys, out of
    -- 16 populated buckets) — a full-scan engine reads 16 dirs and
    -- hash-fails.
    , probe AS (
        SELECT path, filename FROM files ORDER BY path, filename LIMIT 5)
    SELECT f.path, f.filename, f.checksum, f.modification_datetime,
           f.file_size, f.indexed_at, TRUE AS pruned
    FROM files f JOIN probe USING (path, filename)
    ORDER BY f.path, f.filename
    """
    ),
)
def w12_pruned_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W12: pruned point/batch reads over the bucketed FilesTable —
    `read_for_keys` hashes the probe keys to their PK buckets and opens
    only those dirs (the write path's manifest pruning, exposed to
    reads). At 100 TB / 4096 buckets a point lookup opens one dir
    instead of scanning the fact table."""
    import os

    from file_indexer_spark.indexer.files_table import FilesTable

    tune_session(spark)
    base, _ = _stream_workdir("fis_w12", sf_dir)
    t = FilesTable(spark, os.path.join(base, "db"), buckets=16)
    original = files_df(spark, sf_dir)
    t.overwrite(original)
    # non-vacuity: more populated buckets than probe keys, so a
    # full-scan engine would open MORE dirs than the pruned bound
    # (sf fixtures carry ~20 distinct paths — most but not all of the
    # 16 buckets populate)
    m = t._load_manifest()
    if len(m["entries"]) <= 5:
        raise RuntimeError("w12 fixture under-populated — gate would be vacuous")
    probe = original.orderBy("path", "filename").limit(5).select("path", "filename")
    out = t.read_for_keys(probe)
    n_dirs = len({os.path.dirname(f) for f in out.inputFiles()})
    return (
        out.withColumn("pruned", F.lit(n_dirs <= 5))
        .orderBy("path", "filename")
    )


# x4 shares x1's oracle VERBATIM: after draining a 3-arrival
# chronological stream through the foreachBatch cross-modal ingest
# (batch media decoded batch-locally; text clusters refreshed through
# the stored LSH index), the report over the stored member tables must
# equal x1 recomputed over the full corpus — the streaming rendition
# of x2/x3, closing the family's symmetry with st13/sim13.
@register("x4_streaming_crossmodal_ingest", ORACLES["x1_cross_modal_dup_assets"])
def x4_streaming_crossmodal_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: cross-modal fingerprint ingestion AT STREAM TIME — documents
    plus their derived media arrive chronologically in three
    micro-batches; each batch appends per-row-pure media member rows
    (its own blobs only), probes + refreshes the text clusters (dd12 →
    dd13), and lands its LSH rows — every write a replay-idempotent
    per-version dir. The gate drains the stream and returns the
    duplicate-asset report from the stored tables alone."""
    import os

    from file_indexer_spark.streaming import crossmodal as sxm

    tune_session(spark)
    base, _ = _stream_workdir("fis_x4", sf_dir)
    src = os.path.join(base, "src")
    state = os.path.join(base, "state")
    ckpt = os.path.join(base, "ckpt")
    docs = _table(spark, sf_dir, "documents")
    hi = docs.agg(F.max("doc_id")).first()[0]
    c1, c2 = int(hi * 8 // 10), int(hi * 9 // 10)
    cols = ["doc_id", "text", "n_chars"]
    _land_arrivals(
        src,
        [
            docs.filter(F.col("doc_id") <= c1).select(*cols),
            docs.filter((F.col("doc_id") > c1) & (F.col("doc_id") <= c2)).select(*cols),
            docs.filter(F.col("doc_id") > c2).select(*cols),
        ],
    )
    stream = sxm.read_docs_stream(spark, src, max_files_per_trigger=1)
    sxm.ingest_crossmodal_stream(spark, stream, state, ckpt)
    return sxm.duplicate_assets_report(spark, state)


# sim13's oracle is sim12's family: the composed IVF-PQ search with the
# quantizer CTEs filtered to the BOOTSTRAP arrival slice (the first
# micro-batch trains the quantizer, then it is FROZEN — FAISS
# train()-then-add() run from a stream). The searched codes and the
# query set span the full table; the filter computes the same 80%
# vec_id cut the Spark gate lands as arrival 1.
from file_indexer_spark.queries.q10_pq_crossmodal import _ivfpq_oracle  # noqa: E402


@register(
    "sim13_streaming_ann_ingest",
    _ivfpq_oracle("vec_id <= (SELECT MAX(vec_id) * 8 // 10 FROM embeddings)"),
)
def sim13_streaming_ann_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SIM13: streaming ANN index INGESTION — the st13 of the ANN
    family. Embeddings arrive chronologically in three micro-batches
    (a large bootstrap drop + two ingest batches); the first batch
    trains and freezes the quantizer, each later batch broadcast-
    encodes only itself (sim12's encode leg) and appends its coded
    rows. The gate drains the stream, then answers the query batch
    from the stored index alone — hash-checked against the composed
    DuckDB search with the quantizer frozen to the bootstrap slice,
    proving stream-ingest == bootstrap-build + one big add()."""
    import os

    from file_indexer_spark.operators import similarity as sim
    from file_indexer_spark.streaming import ann as sann

    tune_session(spark)
    base, _ = _stream_workdir("fis_sim13", sf_dir)
    src = os.path.join(base, "src")
    state = os.path.join(base, "state")
    ckpt = os.path.join(base, "ckpt")
    emb = _table(spark, sf_dir, "embeddings")
    hi = emb.agg(F.max("vec_id")).first()[0]
    c1, c2 = int(hi * 8 // 10), int(hi * 9 // 10)
    cols = ["vec_id", "embedding", "label"]
    _land_arrivals(
        src,
        [
            emb.filter(F.col("vec_id") <= c1).select(*cols),
            emb.filter((F.col("vec_id") > c1) & (F.col("vec_id") <= c2)).select(*cols),
            emb.filter(F.col("vec_id") > c2).select(*cols),
        ],
    )
    stream = sann.read_embeddings_stream(spark, src, max_files_per_trigger=1)
    sann.ingest_ann_stream(spark, stream, state, ckpt)
    queries = emb.filter(F.col("vec_id") < sim.N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return sann.search(spark, state, queries)


@register(
    "w11_schema_evolution",
    with_files_cte(
        """
    -- w11: ADD COLUMN as a metadata-only commit. After evolving the
    -- schema and upserting ONLY the file_size%3==0 slice with the new
    -- column set, the table must hold every original row (untouched
    -- rows null-fill the new column — their immutable data dirs were
    -- never rewritten), and the pre-evolution generation must still
    -- present its original 6-column contract (pinned as an audit
    -- column; a schema-evolution that rewrote history would change it).
    SELECT path, filename, checksum, modification_datetime, file_size,
           indexed_at,
           CASE WHEN file_size % 3 = 0 THEN 'bulk' END AS category,
           CAST(6 AS BIGINT) AS pre_evolution_ncols
    FROM files ORDER BY path, filename
    """
    ),
)
def w11_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W11: FilesTable schema evolution (Delta-parity maintenance) —
    the schema is a per-generation manifest property: add_column
    commits a new generation without touching a data dir, old dirs
    read through the evolved schema (absent columns null-fill),
    read_at() replays pre-evolution generations under their own column
    set, and pre-evolution writers keep working (conform null-fills)."""
    import os

    from file_indexer_spark.indexer.files_table import FilesTable

    tune_session(spark)
    base, _ = _stream_workdir("fis_w11", sf_dir)
    t = FilesTable(spark, os.path.join(base, "db"), buckets=8, keep_history=True)
    original = files_df(spark, sf_dir)
    t.overwrite(original)                                   # gen 1
    t.add_column("category", "string")                      # gen 2
    t.upsert(                                               # gen 3
        original.filter(F.col("file_size") % 3 == 0).withColumn(
            "category", F.lit("bulk")
        )
    )
    pre_cols = len(t.read_at(1).columns)
    return (
        t.read()
        .withColumn("pre_evolution_ncols", F.lit(pre_cols).cast("long"))
        .orderBy("path", "filename")
    )
