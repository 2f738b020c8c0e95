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
    whole report carries a full DuckDB oracle."""
    text = (
        dd.cluster_consolidation(
            docs, dd.dedup_clusters(docs, dd.minhash_lsh_pairs(docs))
        )
        .filter(F.col("n_docs") >= min_group_size)
        .select(
            F.lit("text").alias("modality"),
            F.col("cluster_id").cast("string").alias("group_key"),
            F.col("n_docs").alias("n_assets"),
            F.col("cluster_id").alias("canonical_asset_id"),
            F.lit("chars").alias("unit"),
            F.col("chars_saved").alias("wasted_units"),
        )
    )
    image = _grouped(
        mm.image_ahash_canonical(mm.ppm_multires_media_from_docs(docs))
        .filter(F.col("decode_error").isNull())
        .withColumn("units", (F.col("width") * F.col("height")).cast("long")),
        "ahash64",
        "media_id",
        "units",
        "image",
        "pixels",
        min_group_size,
    )
    audio = _grouped(
        mm.audio_envelope(mm.pcm_media_from_docs(docs))
        .filter(F.col("decode_error").isNull())
        .withColumn("units", (F.col("n_frames") * mm.AUDIO_FRAME).cast("long")),
        "envelope",
        "media_id",
        "units",
        "audio",
        "samples",
        min_group_size,
    )
    video = _grouped(
        video_fingerprint(mm.video_media_from_docs(docs)).filter(
            F.col("decode_error").isNull()
        ),
        "fingerprint",
        "media_id",
        "n_pixels",
        "video",
        "pixels",
        min_group_size,
    )
    return (
        text.unionByName(image)
        .unionByName(audio)
        .unionByName(video)
        .select(*_X1_COLS)
        .orderBy("modality", "group_key")
    )
