"""Cross-modal duplicate-asset report (x1): ONE J2-shaped table of
duplicate groups across every modality the engine fingerprints —
text near-dup components (dd7/dd11), resolution-invariant image groups
(m6d), audio loudness-envelope groups (m7c), and whole-video
fingerprint groups — with the reference's wasted-space accounting
(A13, file_indexer/db.py duplicate stats) applied corpus-wide in each
modality's native unit.

A training-data curation run reads exactly this table to answer "how
much redundant material does the corpus carry, and which asset do I
keep per group": every group names its canonical keeper (min asset id,
the J2/dd11 rule) and the units reclaimed by dropping the rest.

Scale shape: each modality branch is its operator's own plan (already
100 TB-shaped: partition-local decode, one hash-shuffle on the
fingerprint key) plus a per-group aggregation; the final union is a
no-shuffle concatenation and the presentation sort is the only added
exchange. Nothing crosses modalities except the union — group keys
are namespaced by the ``modality`` column, never joined.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from file_indexer_spark.operators import dedup as dd
from file_indexer_spark.operators import multimodal as mm

VIDEO_FP_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("fingerprint", T.StringType(), True),
        T.StructField("n_pixels", T.LongType(), True),
        T.StructField("decode_error", T.StringType(), True),
    ]
)


def video_fingerprint(media: DataFrame) -> DataFrame:
    """Whole-video content fingerprint: ``{w}x{h}:`` + the '-'-joined
    md5 of every frame's raster in frame order (m8b's frame
    fingerprint rule applied to ALL frames, not just keyframes). Two
    videos share the fingerprint iff they are pixel-identical at the
    same geometry — the video analog of m6c/m7c's perceptual keys,
    exact rather than perceptual because temporal resampling is out of
    scope for the gate corpus.

    Scale shape: mapInPandas where the blobs sit — decode and hashing
    are partition-local, output is ONE narrow row per video.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, c in zip(pdf["media_id"], pdf["content"]):
                blob = None if c is None else bytes(c)
                if blob is None:
                    rows.append((int(mid), None, None, "null content"))
                    continue
                if not blob.startswith(mm.VID_MAGIC):
                    rows.append((int(mid), None, None, "not VID1"))
                    continue
                if len(blob) < 4 + mm._VID_HEADER_SIZE:
                    rows.append((int(mid), None, None, "bad header"))
                    continue
                nf, w, h = struct.unpack_from(mm._VID_HEADER_FMT, blob, 4)
                need = nf * w * h
                payload = blob[4 + mm._VID_HEADER_SIZE :]
                if len(payload) < need or nf < 1:
                    rows.append((int(mid), None, None, "truncated payload"))
                    continue
                digests = [
                    hashlib.md5(payload[f * w * h : (f + 1) * w * h]).hexdigest()
                    for f in range(nf)
                ]
                fp = f"{w}x{h}:" + "-".join(digests)
                rows.append((int(mid), fp, int(need), None))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "fingerprint", "n_pixels", "decode_error"],
            )

    return media.mapInPandas(batches, schema=VIDEO_FP_SCHEMA)


_X1_COLS = [
    "modality",
    "group_key",
    "n_assets",
    "canonical_asset_id",
    "unit",
    "wasted_units",
]


def _grouped(
    members: DataFrame,
    key: str,
    asset_id: str,
    units: str,
    modality: str,
    unit: str,
    min_group_size: int,
) -> DataFrame:
    """J2's groupBy-HAVING on a fingerprint key + A13's accounting:
    wasted = total units minus the canonical (min-id) member's — the
    units reclaimed by keeping one copy per group."""
    return (
        members.groupBy(F.col(key).alias("group_key"))
        .agg(
            F.count("*").cast("long").alias("n_assets"),
            F.min(asset_id).alias("canonical_asset_id"),
            (F.sum(units) - F.expr(f"min_by({units}, {asset_id})"))
            .cast("long")
            .alias("wasted_units"),
        )
        .filter(F.col("n_assets") >= min_group_size)
        .select(
            F.lit(modality).alias("modality"),
            F.col("group_key").cast("string").alias("group_key"),
            "n_assets",
            "canonical_asset_id",
            F.lit(unit).alias("unit"),
            "wasted_units",
        )
    )


def _image_members(docs: DataFrame) -> DataFrame:
    """Per-asset image fingerprint rows — a PURE per-row decode (m6d's
    canonical ahash), so an ingest batch's rows are computed from the
    batch's blobs alone and appended."""
    return (
        mm.image_ahash_canonical(mm.ppm_multires_media_from_docs(docs))
        .filter(F.col("decode_error").isNull())
        .select(
            "media_id",
            "ahash64",
            (F.col("width") * F.col("height")).cast("long").alias("units"),
        )
    )


def _audio_members(docs: DataFrame) -> DataFrame:
    return (
        mm.audio_envelope(mm.pcm_media_from_docs(docs))
        .filter(F.col("decode_error").isNull())
        .select(
            "media_id",
            "envelope",
            (F.col("n_frames") * mm.AUDIO_FRAME).cast("long").alias("units"),
        )
    )


def _video_members(docs: DataFrame) -> DataFrame:
    return (
        video_fingerprint(mm.video_media_from_docs(docs))
        .filter(F.col("decode_error").isNull())
        .select("media_id", "fingerprint", F.col("n_pixels").cast("long").alias("units"))
    )


def fingerprint_tables(
    docs: DataFrame, pairs: DataFrame | None = None
) -> dict[str, DataFrame]:
    """The compute-once decode layer behind x1: one NARROW member table
    per modality (asset id, fingerprint key, accounting units). At
    100 TB these are materialized once per corpus snapshot — every blob
    is decoded exactly once — and each downstream report (x1,
    incremental re-runs, per-modality audits) is a cheap agg over the
    narrow tables instead of a corpus re-decode. x2 gates the parquet
    round-trip of exactly this split.

    ``pairs`` overrides the near-dup pair list (round-13: callers that
    already hold the LSH index tables pass
    :func:`~file_indexer_spark.operators.dedup.lsh_pairs_from_tables`
    so the corpus is signed once, not twice — row-for-row the same
    pairs by construction)."""
    if pairs is None:
        pairs = dd.minhash_lsh_pairs(docs)
    text = dd.dedup_clusters(docs, pairs).join(
        docs.select("doc_id", "n_chars"), "doc_id"
    )
    return {
        "text_members": text,
        "image_members": _image_members(docs),
        "audio_members": _audio_members(docs),
        "video_members": _video_members(docs),
    }


def fingerprint_state(docs: DataFrame) -> dict[str, DataFrame]:
    """The x3 maintenance state: the x1/x2 member tables PLUS the text
    LSH index (dd12's band + shingle-set tables). The media member
    tables are per-row pure, so batch appends need nothing else; the
    text members carry corpus-global cluster labels, and the index is
    what lets an ingest batch refresh them without re-signing the
    corpus (the dd12/dd13 machinery).

    Round-13 (guide §5 / VERDICT r12 item 7): the text member pairs
    derive from the SAME lsh index frames stored in the state — the
    previous shape ran the shingle+minhash signing machinery twice per
    state build (once inside minhash_lsh_pairs, once for the stored
    index). Row-for-row identical output (lsh_pairs_from_tables'
    equivalence argument)."""
    lsh = dd.lsh_index_tables(docs)
    state = fingerprint_tables(docs, pairs=dd.lsh_pairs_from_tables(lsh))
    state["lsh_bands"] = lsh["bands"]
    state["lsh_shingle_sets"] = lsh["shingle_sets"]
    return state


def fingerprint_state_append(
    state: dict[str, DataFrame], new_docs: DataFrame
) -> dict[str, DataFrame]:
    """x3: fold a document/media ingest batch into the materialized
    fingerprint state — the compute-once family's append operation
    (ANN has sim12, dedup has dd12/dd13; this completes the symmetry
    for the cross-modal report).

    Per batch: the media branches decode ONLY the batch's blobs (pure
    per-row rows, appended); the text branch probes the stored LSH
    index for near-dup pairs with >= 1 new side (dd12) and refreshes
    only the touched clusters (dd13) — the stored corpus is never
    re-decoded or re-signed. The returned state's member tables are
    provably identical to :func:`fingerprint_state` recomputed over
    base ∪ batch (dd12/dd13's exactness arguments; the media branches
    are per-row pure), which is why the x3 gate can hash-check the
    post-append report against x1's full-corpus oracle VERBATIM.

    Physical write discipline at scale (the registry gate performs
    it): media member tables and the LSH index are parquet APPENDS;
    the text member table is rewritten to a fresh version (labels can
    change on merge) — its touched-cluster slice plus an anti-join
    passthrough, the dd13 shape.
    """
    index = {"bands": state["lsh_bands"], "shingle_sets": state["lsh_shingle_sets"]}
    new_pairs = dd.incremental_lsh_pairs(index, new_docs)
    refreshed = dd.incremental_cluster_refresh(
        state["text_members"].select("doc_id", "cluster_id"), new_pairs, new_docs
    )
    chars = (
        state["text_members"]
        .select("doc_id", "n_chars")
        .unionByName(new_docs.select("doc_id", "n_chars"))
    )
    new_lsh = dd.lsh_index_tables(new_docs)
    return {
        "text_members": refreshed.join(chars, "doc_id"),
        "image_members": state["image_members"].unionByName(_image_members(new_docs)),
        "audio_members": state["audio_members"].unionByName(_audio_members(new_docs)),
        "video_members": state["video_members"].unionByName(_video_members(new_docs)),
        "lsh_bands": state["lsh_bands"].unionByName(new_lsh["bands"]),
        "lsh_shingle_sets": state["lsh_shingle_sets"].unionByName(
            new_lsh["shingle_sets"]
        ),
    }


def duplicate_assets_from_tables(
    tables: dict[str, DataFrame], min_group_size: int = 2
) -> DataFrame:
    """The report phase of x1, decoupled from decoding: consume the
    :func:`fingerprint_tables` member tables (live frames or parquet
    re-reads — x2) and emit the cross-modal duplicate-group report.
    Per-modality hash aggs + a no-shuffle union; nothing here ever
    touches a blob."""
    text = (
        tables["text_members"]
        .groupBy("cluster_id")
        .agg(
            F.count("*").cast("long").alias("n_assets"),
            F.sum(
                F.when(~F.col("is_canonical"), F.col("n_chars")).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("wasted_units"),
        )
        .filter(F.col("n_assets") >= min_group_size)
        .select(
            F.lit("text").alias("modality"),
            F.col("cluster_id").cast("string").alias("group_key"),
            "n_assets",
            F.col("cluster_id").alias("canonical_asset_id"),
            F.lit("chars").alias("unit"),
            "wasted_units",
        )
    )
    image = _grouped(
        tables["image_members"], "ahash64", "media_id", "units",
        "image", "pixels", min_group_size,
    )
    audio = _grouped(
        tables["audio_members"], "envelope", "media_id", "units",
        "audio", "samples", min_group_size,
    )
    video = _grouped(
        tables["video_members"], "fingerprint", "media_id", "units",
        "video", "pixels", min_group_size,
    )
    return (
        text.unionByName(image)
        .unionByName(audio)
        .unionByName(video)
        .select(*_X1_COLS)
        .orderBy("modality", "group_key")
    )


def duplicate_assets(docs: DataFrame, min_group_size: int = 2) -> DataFrame:
    """x1: the cross-modal duplicate-asset report — every modality's
    duplicate groups in one table, each with its canonical keeper and
    wasted-unit accounting. Text groups key on the dd7 near-dup
    component (canonical = cluster label = min doc_id; wasted =
    dd11's chars_saved); image groups on the canonical ahash64 (m6d;
    wasted pixels of the non-canonical copies — scaled copies waste
    their FULL resolution); audio on the loudness envelope (m7c;
    wasted samples); video on the whole-video fingerprint (wasted
    pixels across frames). All accounting is integer-exact, so the
    whole report carries a full DuckDB oracle.

    Composed as decode layer + report layer
    (:func:`fingerprint_tables` → :func:`duplicate_assets_from_tables`)
    so the expensive blob decode is a materialization boundary."""
    return duplicate_assets_from_tables(fingerprint_tables(docs), min_group_size)
