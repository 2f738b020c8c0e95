"""Multimodal-column plumbing: opaque ``binary`` payloads with typed
metadata, decoded/transformed by Arrow-batched pandas stages.

Design (the piece that must be right at 100 TB):
  * media travels as an opaque BinaryType column + a typed metadata
    struct — never decoded until a stage needs pixels/samples;
  * decode / feature-extract / frame-sample are ``mapInPandas`` stages:
    Arrow moves each batch across the Python boundary once, the UDF is
    vectorized over the batch, and output schemas are declared up front
    so downstream Catalyst stages stay fully typed;
  * partitioning: blobs are processed where they sit — no shuffle is
    introduced by any stage here; size-skew is handled upstream by
    ``repartitionByRange`` on byte_len if needed.

Two decode paths, both gate-checked:
  * FAKE_MEDIA_FORMAT — a deterministic 12-byte header (width, height,
    channels, little-endian u32) + payload — exercises every Spark-side
    contract (schemas, batch shapes, null handling for corrupt blobs);
  * REAL format — binary PPM (P6), parsed by a pure-Python spec decoder
    (no codec library needed), with Pillow as the import-gated fallback
    for other formats on codec-equipped clusters. Registered as m2b
    with a full DuckDB oracle.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FAKE_HEADER = struct.Struct("<III")  # width, height, channels

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("content", T.BinaryType(), True),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("payload_bytes", T.LongType(), True),
        T.StructField("decode_error", T.StringType(), True),
    ]
)


def encode_fake_media(width: int, height: int, channels: int, payload: bytes) -> bytes:
    """Build a FAKE_MEDIA_FORMAT blob (test fixture helper)."""
    return FAKE_HEADER.pack(width, height, channels) + payload


def _decode_fake(content: bytes | None) -> tuple:
    if content is None:
        return (None, None, None, None, "null content")
    if len(content) < FAKE_HEADER.size:
        return (None, None, None, None, "truncated header")
    w, h, c = FAKE_HEADER.unpack_from(content)
    return (int(w), int(h), int(c), len(content) - FAKE_HEADER.size, None)


def decode_media(media: DataFrame) -> DataFrame:
    """Decode stage: (media_id, media_type, content) → typed metadata.

    Corrupt/missing blobs yield a ``decode_error`` row instead of
    failing the task (the D6 error-isolation pattern, executor-side).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [_decode_fake(c) for c in pdf["content"]]
            out = pd.DataFrame(
                decoded,
                columns=["width", "height", "channels", "payload_bytes", "decode_error"],
            )
            out.insert(0, "media_type", pdf["media_type"].values)
            out.insert(0, "media_id", pdf["media_id"].values)
            yield out

    return media.mapInPandas(batches, schema=DECODED_SCHEMA)


PPM_MAGIC = b"P6"


def encode_ppm(width: int, height: int, pixels: bytes, maxval: int = 255) -> bytes:
    """Build a binary PPM (P6) blob — a REAL, spec-defined image format
    (netpbm) that needs no codec library, so the real-decode contract
    is exercisable in this container."""
    return b"P6\n%d %d\n%d\n" % (width, height, maxval) + pixels


def _parse_ppm(content: bytes | None) -> tuple:
    """Parse a binary PPM (P6) header. Pure Python, full spec:
    whitespace-separated width/height/maxval with ``#`` comments, one
    whitespace byte before the raster, 3 samples/pixel. Returns
    ``(w, h, raster_offset, None)`` or ``(None, None, None, error)``."""
    if content is None:
        return (None, None, None, "null content")
    if not content.startswith(PPM_MAGIC):
        return (None, None, None, "not a PPM")
    n = len(content)
    i, tokens = 2, []
    while len(tokens) < 3 and i < n:
        while i < n and content[i : i + 1].isspace():
            i += 1
        if i < n and content[i : i + 1] == b"#":
            while i < n and content[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < n and not content[j : j + 1].isspace():
            j += 1
        if j > i:
            tokens.append(content[i:j])
        i = j
    if len(tokens) < 3:
        return (None, None, None, "bad header")
    try:
        w, h, maxval = (int(t) for t in tokens)
    except ValueError:
        return (None, None, None, "bad header")
    if w <= 0 or h <= 0:
        return (None, None, None, "bad geometry")
    if not 0 < maxval < 256:
        return (None, None, None, "unsupported maxval")
    i += 1  # exactly one whitespace byte separates header and raster
    if n - i < w * h * 3:
        return (None, None, None, "truncated payload")
    return (w, h, i, None)


def _decode_ppm(content: bytes | None) -> tuple:
    """DECODED_SCHEMA metadata tuple for a PPM blob; errors become
    ``decode_error`` (see :func:`_parse_ppm`)."""
    w, h, _off, err = _parse_ppm(content)
    if err is not None:
        return (None, None, None, None, err)
    return (w, h, 3, w * h * 3, None)


def decode_image_real(media: DataFrame) -> DataFrame:
    """Real-image decode stage (m2b): binary PPM (P6) decoded by the
    pure-Python spec parser above; any other format falls through to
    Pillow when installed, else yields a per-row ``decode_error`` (this
    container ships no codec libraries — reference
    file_indexer/indexer.py's hash-anything contract says errors are
    data, not task failures).

    Same Spark contract as ``decode_media``: mapInPandas, Arrow
    batches, DECODED_SCHEMA, corrupt blobs → error rows.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            import io

            import PIL.Image as _pil
        except ImportError:
            _pil = None
        rows = []
        for pdf in it:
            rows.clear()
            for c in pdf["content"]:
                if c is not None and not bytes(c[:2]) == PPM_MAGIC and _pil is not None:
                    try:
                        img = _pil.open(io.BytesIO(bytes(c)))
                        rows.append(
                            (img.width, img.height, len(img.getbands()), len(c), None)
                        )
                    except Exception as exc:  # corrupt blob → error row
                        rows.append((None, None, None, None, f"PIL: {exc}"))
                else:
                    rows.append(_decode_ppm(None if c is None else bytes(c)))
            out = pd.DataFrame(
                rows,
                columns=["width", "height", "channels", "payload_bytes", "decode_error"],
            )
            out.insert(0, "media_type", pdf["media_type"].values)
            out.insert(0, "media_id", pdf["media_id"].values)
            yield out

    return media.mapInPandas(batches, schema=DECODED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_index", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), True),
    ]
)


def sample_frames(media: DataFrame, frame_size: int, every_k: int = 2) -> DataFrame:
    """Frame-sampling stage: treat the payload as fixed-size frames,
    emit every k-th frame as its own row (1→N mapInPandas — the batch
    shape a video pipeline uses; no shuffle, frames stay partition-local).
    """

    header_size = FAKE_HEADER.size  # plain int: Struct objects can't pickle

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                if content is None:
                    continue
                payload = content[header_size:]
                n = len(payload) // frame_size
                for i in range(0, n, every_k):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(bytes(payload[i * frame_size:(i + 1) * frame_size]))
            yield pd.DataFrame({"media_id": ids, "frame_index": idxs, "frame": frames})

    return media.mapInPandas(batches, schema=FRAME_SCHEMA)


def resize_media(media: DataFrame, target_width: int, target_height: int) -> DataFrame:
    """Resize stage: nearest-neighbor downsample of FAKE_MEDIA_FORMAT
    blobs to (target_width, target_height), emitting re-encoded blobs.

    The Spark contract is the real thing — mapInPandas, binary in /
    binary out, corrupt blobs pass through as nulls with the error
    recorded — only the pixel math is the fake codec's (payload treated
    as a row-major width*height*channels byte grid; real clusters swap
    in PIL/libvips inside the same batch function).
    """

    header_size = FAKE_HEADER.size

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _struct

        hdr = _struct.Struct("<III")  # rebuilt per worker: Struct objects can't pickle
        out_ids, out_types, out_content, out_err = [], [], [], []
        for pdf in it:
            for mid, mtype, content in zip(pdf["media_id"], pdf["media_type"], pdf["content"]):
                err = None
                blob = None
                if content is None or len(content) < header_size:
                    err = "undecodable"
                else:
                    w, h, c = hdr.unpack_from(content)
                    payload = content[header_size:]
                    if len(payload) < w * h * c or w == 0 or h == 0:
                        err = "payload/geometry mismatch"
                    else:
                        rows = []
                        for ty in range(target_height):
                            sy = ty * h // target_height
                            for tx in range(target_width):
                                sx = tx * w // target_width
                                base = (sy * w + sx) * c
                                rows.append(payload[base:base + c])
                        blob = hdr.pack(target_width, target_height, c) + b"".join(rows)
                out_ids.append(mid)
                out_types.append(mtype)
                out_content.append(blob)
                out_err.append(err)
            yield pd.DataFrame(
                {
                    "media_id": out_ids,
                    "media_type": out_types,
                    "content": out_content,
                    "resize_error": out_err,
                }
            )
            out_ids, out_types, out_content, out_err = [], [], [], []

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("media_type", T.StringType(), False),
            T.StructField("content", T.BinaryType(), True),
            T.StructField("resize_error", T.StringType(), True),
        ]
    )
    return media.mapInPandas(batches, schema=schema)


FEATURE_DIM = 64

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
    ]
)


def extract_features(media: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Feature-extraction stage: blob → fixed-dim float vector.

    Deterministic fake featurizer (chunked byte means over the payload,
    L2-normalized) standing in for a real image/audio encoder — the
    output column is schema-compatible with the ``embeddings`` table
    (``array<float>``), so extracted features flow straight into
    sim1/sim2/dd5. Vectorized numpy over each Arrow batch; a model-
    backed encoder slots into the same mapInPandas signature (load the
    model once per python worker, outside the loop).
    """
    header_size = FAKE_HEADER.size

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        def chunk_means(payload: "np.ndarray") -> "np.ndarray":
            # np.array_split boundaries (first n%dim chunks get one
            # extra element), summed in one reduceat instead of a
            # 64-iteration Python loop per row.
            n = len(payload)
            q, r = divmod(n, dim)
            sizes = np.full(dim, q, dtype=np.int64)
            sizes[:r] += 1
            if q == 0:  # n < dim → empty chunks; reduceat can't express
                chunks = np.array_split(payload, dim)
                return np.array(
                    [c.mean() if len(c) else 0.0 for c in chunks], dtype=np.float32
                )
            idx = np.zeros(dim, dtype=np.int64)
            np.cumsum(sizes[:-1], out=idx[1:])
            return (np.add.reduceat(payload, idx) / sizes).astype(np.float32)

        for pdf in it:
            ids, vecs = [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                ids.append(mid)
                if content is None or len(content) <= header_size:
                    vecs.append(None)
                    continue
                payload = np.frombuffer(
                    content, dtype=np.uint8, offset=header_size
                ).astype(np.float64)
                v = chunk_means(payload)
                norm = float(np.linalg.norm(v))
                vecs.append((v / norm if norm else v).tolist())
            yield pd.DataFrame({"media_id": ids, "embedding": vecs})

    return media.mapInPandas(batches, schema=FEATURES_SCHEMA)


def binary_metadata(docs: DataFrame) -> DataFrame:
    """m1: treat each document's text as an opaque binary blob and
    aggregate blob metadata per source — the metadata-over-binary query
    shape (content hash, byte sizes) computed entirely JVM-side
    (``sha2``/``encode``), no Python in the loop."""
    blobs = docs.select(
        "source",
        F.encode(F.col("text"), "utf-8").alias("content"),
    ).select(
        "source",
        F.length("content").cast("long").alias("byte_len"),
        F.sha2(F.col("content"), 256).alias("digest"),
    )
    return (
        blobs.groupBy("source")
        .agg(
            F.count("*").alias("n_blobs"),
            F.sum("byte_len").cast("long").alias("total_bytes"),
            F.max("byte_len").cast("long").alias("max_bytes"),
            F.countDistinct("digest").alias("distinct_digests"),
        )
        .orderBy("source")
    )


def fake_media_from_docs(docs: DataFrame) -> DataFrame:
    """Deterministic FAKE_MEDIA_FORMAT corpus derived from ``documents``
    — the registry's gate fixture (the same derivation is expressed in
    DuckDB SQL for the m2/m3 oracles, so decode/frame outputs can be
    hash-checked end-to-end):

      * doc_id % 11 == 0 → NULL content            (null-blob error path)
      * doc_id %  7 == 0 → 2-byte blob             (truncated-header path)
      * otherwise        → header(4 + id%13, 3 + id%7, 1 + id%4)
                           + utf-8 text payload
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _struct

        hdr = _struct.Struct("<III")
        for pdf in it:
            ids, types, blobs = [], [], []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                did = int(did)
                ids.append(did)
                types.append("image")
                if did % 11 == 0:
                    blobs.append(None)
                elif did % 7 == 0:
                    blobs.append(b"\x01\x02")
                else:
                    blobs.append(
                        hdr.pack(4 + did % 13, 3 + did % 7, 1 + did % 4)
                        + text.encode("utf-8")
                    )
            yield pd.DataFrame({"media_id": ids, "media_type": types, "content": blobs})

    return docs.select("doc_id", "text").mapInPandas(batches, schema=MEDIA_SCHEMA)


def ppm_media_from_docs(docs: DataFrame) -> DataFrame:
    """Deterministic REAL-format (binary PPM / P6) corpus derived from
    ``documents`` — the m2b gate fixture. Same derivation idea as
    :func:`fake_media_from_docs` but the blobs are spec-valid PPM files
    the pure-Python decoder parses for real, plus three error classes:

      * doc_id % 11 == 0 → NULL content              ('null content')
      * doc_id %  7 == 0 → JPEG-ish magic bytes      ('not a PPM')
      * doc_id %  5 == 0 → valid header, half raster ('truncated payload')
      * otherwise        → P6, w = 1 + id%8, h = 1 + id%5, raster =
                           utf-8 text tiled to w*h*3 bytes
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, types, blobs = [], [], []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                did = int(did)
                ids.append(did)
                types.append("image")
                if did % 11 == 0:
                    blobs.append(None)
                    continue
                if did % 7 == 0:
                    blobs.append(b"\xff\xd8\xff\xe0 not really a jpeg")
                    continue
                w, h = 1 + did % 8, 1 + did % 5
                need = w * h * 3
                raw = text.encode("utf-8")
                raster = (raw * (need // max(len(raw), 1) + 1))[:need]
                if did % 5 == 0:
                    raster = raster[: need // 2]
                blobs.append(encode_ppm(w, h, raster))
            yield pd.DataFrame({"media_id": ids, "media_type": types, "content": blobs})

    return docs.select("doc_id", "text").mapInPandas(batches, schema=MEDIA_SCHEMA)


AHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_pixels", T.IntegerType(), True),
        T.StructField("ahash", T.LongType(), True),
        T.StructField("decode_error", T.StringType(), True),
    ]
)


def image_ahash_legacy63(media: DataFrame) -> DataFrame:
    """m6 (GATE-LEGACY — prefer :func:`image_ahash`, the canonical
    resolution-invariant 64-bit hash): perceptual average-hash (aHash)
    fingerprint from DECODED pixels at NATIVE resolution — the
    codec-free image near-dup signal (group or band the hash exactly
    like dd1/dd4 group text hashes).

    Retained verbatim for the m6/m6b driver-gate continuity; its
    63-pixel signed-long cap (below) is the documented footgun that
    motivated the canonical path: on unpooled images with more than 63
    pixels, files identical only in their first 63 pixels collide.

    Per valid image: grayscale each pixel as the INTEGER sum r+g+b
    (0..765 — no /3, so no rounding rule to align between engines);
    bit i of the hash is set iff ``gray_i * n_pixels >= total_gray``
    (the integer-exact rendition of "pixel above mean"), LSB-first in
    raster order. Every operation is integer arithmetic on decoded
    bytes, so the DuckDB oracle recomputes the hash bit-for-bit from
    the fixture derivation. Decode errors propagate as rows (the D6
    pattern), never failures.

    Scale shape: mapInPandas over the blobs where they sit (Arrow
    batches, partition-local, no shuffle); the hash is O(pixels) per
    image and the output is one narrow row per blob.

    Contract note: the fingerprint holds the FIRST 63 pixel bits (a
    signed-long constraint, mirrored exactly in the oracle) — an
    image with more pixels than that contributes only its first 63 to
    the hash. Real pipelines pool to a fixed grid first (a resize, m5,
    composed before this stage); pick a grid of <= 63 cells (e.g. 7x8)
    so every cell participates, or widen the column to two longs for
    canonical 64-bit aHash.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, c in zip(pdf["media_id"], pdf["content"]):
                blob = None if c is None else bytes(c)
                w, h, off, err = _parse_ppm(blob)
                if err is not None:
                    rows.append((int(mid), None, None, None, None, err))
                    continue
                n = w * h
                raster = blob[off : off + n * 3]
                grays = [
                    raster[3 * i] + raster[3 * i + 1] + raster[3 * i + 2]
                    for i in range(n)
                ]
                total = sum(grays)
                ahash = 0
                for i, g in enumerate(grays):
                    if i >= 63:  # keep the fingerprint in a signed long
                        break
                    if g * n >= total:
                        ahash |= 1 << i
                rows.append((int(mid), w, h, n, ahash, None))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height", "n_pixels", "ahash", "decode_error",
                ],
            )

    return media.mapInPandas(batches, schema=AHASH_SCHEMA)


def ppm_multires_media_from_docs(docs: DataFrame) -> DataFrame:
    """m6c gate fixture: a mixed-RESOLUTION PPM corpus where scaled
    copies of the same image exist under different media_ids.

    Per document two spec-valid P6 blobs:

      * ``media_id = 2*doc_id``   — base image, ``w0 = 4 + id%5``,
        ``h0 = 4 + id%3``, raster byte j = utf-8 text byte ``j mod L``
        (the same tiling rule as :func:`ppm_media_from_docs`);
      * ``media_id = 2*doc_id+1`` — the SAME image pixel-replicated by
        ``s = 2 + id%2`` (2x or 3x): pixel (x, y) = base(x//s, y//s).

    The pair is a scaled copy, so a resolution-invariant fingerprint
    must collide on it; distinct documents have distinct rasters, so
    cross-doc collisions stay rare.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, types, blobs = [], [], []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                did = int(did)
                w0, h0 = 4 + did % 5, 4 + did % 3
                s = 2 + did % 2
                # empty-text guard (the m7/m8 hardening): an empty doc
                # would tile a zero-length raster into a spec-invalid
                # PPM and hash-mismatch the m6c/m6d oracle
                raw = text.encode("utf-8") or b"\x00"
                need = w0 * h0 * 3
                base = (raw * (need // max(len(raw), 1) + 1))[:need]
                ids.append(2 * did)
                types.append("image")
                blobs.append(encode_ppm(w0, h0, base))
                up = bytearray()
                for y in range(h0 * s):
                    for x in range(w0 * s):
                        p = (y // s) * w0 + (x // s)
                        up += base[3 * p : 3 * p + 3]
                ids.append(2 * did + 1)
                types.append("image")
                blobs.append(encode_ppm(w0 * s, h0 * s, bytes(up)))
            yield pd.DataFrame({"media_id": ids, "media_type": types, "content": blobs})

    return docs.select("doc_id", "text").mapInPandas(batches, schema=MEDIA_SCHEMA)


AHASH64_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("ahash64", T.StringType(), True),
        T.StructField("decode_error", T.StringType(), True),
    ]
)

AHASH_GRID = 8  # canonical 8x8 aHash grid


def image_ahash_canonical(media: DataFrame, grid: int = AHASH_GRID) -> DataFrame:
    """m6c: CANONICAL resolution-invariant aHash — the m5 fixed-grid
    pooling composed with the m6 bit rule, full 64 bits.

    Per valid image: nearest-neighbor-sample a ``grid x grid`` lattice
    (``sx = tx*w//grid``, ``sy = ty*h//grid`` — exactly m5's resize
    rule), grayscale each sample as integer r+g+b, and set bit
    ``i = ty*grid+tx`` (LSB-first) iff ``gray_i * grid^2 >=
    sum(grays)``. The fingerprint is emitted as a 16-char zero-padded
    hex STRING, clearing m6's 63-bit signed-long cap.

    Resolution invariance is exact, not approximate: for a pixel-
    replicated s-times upscale, the lattice sample index is
    ``((a*s)//grid)//s == a//grid`` (floor-division composition), so a
    scaled copy samples the identical source pixels and produces the
    identical 64 bits — which is why this perceptual operator can be
    hash-gated against a DuckDB oracle on the mixed-resolution fixture.

    Scale shape: identical to m6 — mapInPandas where the blobs sit,
    O(grid^2) work per image after the O(1) header parse (the grid
    sampling never touches more than 64 pixels regardless of
    resolution), one narrow row out per blob, no shuffle.
    """

    cells = grid * grid

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, c in zip(pdf["media_id"], pdf["content"]):
                blob = None if c is None else bytes(c)
                w, h, off, err = _parse_ppm(blob)
                if err is not None:
                    rows.append((int(mid), None, None, None, err))
                    continue
                grays = []
                for ty in range(grid):
                    sy = ty * h // grid
                    for tx in range(grid):
                        sx = tx * w // grid
                        p = off + 3 * (sy * w + sx)
                        grays.append(blob[p] + blob[p + 1] + blob[p + 2])
                total = sum(grays)
                bits = 0
                for i, g in enumerate(grays):
                    if g * cells >= total:
                        bits |= 1 << i
                rows.append(
                    (int(mid), w, h, f"{bits:0{cells // 4}x}", None)
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "width", "height", "ahash64", "decode_error"],
            )

    return media.mapInPandas(batches, schema=AHASH64_SCHEMA)


def image_duplicate_groups_canonical(
    media: DataFrame, min_group_size: int = 2
) -> DataFrame:
    """m6d: perceptual duplicate groups over the CANONICAL fingerprint
    — resolution-invariant, so the group key is ``ahash64`` alone
    (unlike m6b's (w, h, ahash), scaled copies land in one group).
    One hash-shuffle on the 16-char key over the O(images) fingerprint
    table; decode stays partition-local."""
    hashed = image_ahash_canonical(media).filter(F.col("decode_error").isNull())
    return (
        hashed.groupBy("ahash64")
        .agg(
            F.count("*").cast("long").alias("n_images"),
            F.min("media_id").alias("canonical_media_id"),
        )
        .filter(F.col("n_images") >= min_group_size)
        .orderBy("ahash64")
    )


def image_duplicate_groups_legacy63(media: DataFrame, min_group_size: int = 2) -> DataFrame:
    """m6b (GATE-LEGACY — prefer :func:`image_duplicate_groups`, which
    groups on the canonical resolution-invariant ahash64): perceptual
    duplicate groups over the native-resolution 63-bit fingerprint,
    exactly the shape of the reference's checksum duplicate-groups (J2)
    applied to image content: images sharing (width, height, ahash)
    form a group; the min media_id is the canonical keeper. Small
    images collide aggressively (few hash bits), and >63-pixel images
    group on their first 63 pixels only — the two reasons the
    canonical path is the default.

    One hash-shuffle on the (w, h, ahash) key over the O(images)
    fingerprint table; everything upstream is the partition-local
    decode."""
    hashed = image_ahash_legacy63(media).filter(F.col("decode_error").isNull())
    return (
        hashed.groupBy("width", "height", "ahash")
        .agg(
            F.count("*").cast("long").alias("n_images"),
            F.min("media_id").alias("canonical_media_id"),
        )
        .filter(F.col("n_images") >= min_group_size)
        .orderBy("width", "height", "ahash")
    )


def image_ahash(media: DataFrame, grid: int = AHASH_GRID) -> DataFrame:
    """The DEFAULT image fingerprint: the canonical resolution-invariant
    64-bit aHash (8x8 lattice pooling + integer above-mean bits as hex
    — see :func:`image_ahash_canonical`). The native-resolution 63-bit
    variant survives as :func:`image_ahash_legacy63` for the m6/m6b
    gate fixtures only."""
    return image_ahash_canonical(media, grid=grid)


def image_duplicate_groups(media: DataFrame, min_group_size: int = 2) -> DataFrame:
    """The DEFAULT perceptual duplicate grouping: keyed on the canonical
    ahash64 alone, so scaled copies of one image land in one group (see
    :func:`image_duplicate_groups_canonical`). The native-resolution
    (w, h, ahash)-keyed variant survives as
    :func:`image_duplicate_groups_legacy63` for gate continuity."""
    return image_duplicate_groups_canonical(media, min_group_size=min_group_size)


# ------------------------------------------------ audio (PCM) pillar

PCM_MAGIC = b"PCM1"
AUDIO_FRAME = 160          # samples per analysis frame
SILENCE_PEAK = 100         # frames with peak |sample| below this are silent


def encode_pcm(samples: "list[int] | bytes", n_samples: int | None = None) -> bytes:
    """Minimal raw-audio container: magic + u32 LE sample count +
    little-endian int16 samples (spec-defined, codec-free — the audio
    analog of the PPM image path)."""
    import numpy as np

    arr = np.asarray(samples, dtype="<i2")
    n = int(n_samples if n_samples is not None else arr.size)
    return PCM_MAGIC + struct.pack("<I", n) + arr.tobytes()


def pcm_media_from_docs(docs: DataFrame) -> DataFrame:
    """m7 gate fixture: deterministic PCM16 audio derived from
    ``documents`` — sample ``i`` is ``(text_byte(i mod L) - 96)``
    scaled ×1 on "quiet" frames (``(frame + doc_id) % 3 == 0``) and
    ×64 on loud ones, ``4 + doc_id % 4`` frames of 160 samples. Three
    error classes (precedence: null, bad magic, truncated):

      * doc_id % 9  == 0 → NULL content          ('null content')
      * doc_id % 13 == 0 → RIFF-ish wrong magic  ('not PCM1')
      * doc_id % 7  == 0 → header says n, half the raster
                                                 ('truncated payload')
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            ids, types, blobs = [], [], []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                did = int(did)
                ids.append(did)
                types.append("audio")
                if did % 9 == 0:
                    blobs.append(None)
                    continue
                if did % 13 == 0:
                    blobs.append(b"RIFF not really a wav")
                    continue
                # \x00 pad: corpus text is never empty (asserted by the
                # oracle derivation), but a real-world empty doc must
                # degrade to a silent clip, not an executor IndexError
                raw = text.encode("utf-8") or b"\x00"
                L = len(raw)
                n = AUDIO_FRAME * (4 + did % 4)
                idx = np.arange(n)
                base = (
                    np.frombuffer(raw, dtype=np.uint8)[idx % L].astype(np.int32)
                    - 96
                )
                scale = np.where((idx // AUDIO_FRAME + did) % 3 == 0, 1, 64)
                samples = (base * scale).astype("<i2")
                if did % 7 == 0:
                    blobs.append(
                        PCM_MAGIC
                        + struct.pack("<I", n)
                        + samples[: n // 2].tobytes()
                    )
                else:
                    blobs.append(encode_pcm(samples, n))
            yield pd.DataFrame({"media_id": ids, "media_type": types, "content": blobs})

    return docs.select("doc_id", "text").mapInPandas(batches, schema=MEDIA_SCHEMA)


FRAME_ENERGY_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), True),
        T.StructField("energy", T.LongType(), True),
        T.StructField("peak", T.IntegerType(), True),
        T.StructField("decode_error", T.StringType(), True),
    ]
)


def _parse_pcm(content: bytes | None) -> tuple:
    """(samples_int16_ndarray, None) or (None, error)."""
    import numpy as np

    if content is None:
        return (None, "null content")
    if not content.startswith(PCM_MAGIC):
        return (None, "not PCM1")
    if len(content) < 8:
        return (None, "bad header")
    (n,) = struct.unpack_from("<I", content, 4)
    payload = content[8:]
    if len(payload) < 2 * n:
        return (None, "truncated payload")
    return (np.frombuffer(payload[: 2 * n], dtype="<i2"), None)


def audio_frame_energy(media: DataFrame) -> DataFrame:
    """m7: per-frame audio analysis from DECODED samples — energy
    (integer sum of squares, exact in BIGINT: |s| ≤ 2^15 so a frame
    sums to < 2^38) and peak |sample| per 160-sample frame. The
    codec-free audio feature pass (VAD/loudness pre-filters in a
    training pipeline read exactly this table); decode errors
    propagate as rows, D6-style.

    Scale shape: mapInPandas over blobs where they sit (vectorized
    numpy per Arrow batch), no shuffle; output is n_frames narrow rows
    per clip.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            rows = []
            for mid, c in zip(pdf["media_id"], pdf["content"]):
                blob = None if c is None else bytes(c)
                samples, err = _parse_pcm(blob)
                if err is not None:
                    rows.append((int(mid), None, None, None, err))
                    continue
                # frame analysis drops a trailing partial frame — a
                # structurally valid clip whose sample count isn't a
                # frame multiple must degrade, not fail the executor
                whole = len(samples) - len(samples) % AUDIO_FRAME
                frames = samples[:whole].astype(np.int64).reshape(-1, AUDIO_FRAME)
                energy = (frames * frames).sum(axis=1)
                peak = np.abs(frames).max(axis=1)
                rows.extend(
                    (int(mid), int(f), int(e), int(p), None)
                    for f, (e, p) in enumerate(zip(energy, peak))
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "frame_idx", "energy", "peak", "decode_error"],
            )

    return media.mapInPandas(batches, schema=FRAME_ENERGY_SCHEMA)


def silence_spans(media: DataFrame, peak_below: int = SILENCE_PEAK) -> DataFrame:
    """m7b: contiguous silent-frame extents per clip — gaps-and-islands
    over the quiet frames of :func:`audio_frame_energy` (the
    trim/segment signal an audio curation pass applies). One narrow
    shuffle of the O(frames) quiet subset onto media_id for the
    windows; the decode stays partition-local."""
    from pyspark.sql.window import Window

    quiet = (
        audio_frame_energy(media)
        .filter(F.col("decode_error").isNull() & (F.col("peak") < peak_below))
        .select("media_id", "frame_idx")
    )
    w = Window.partitionBy("media_id").orderBy("frame_idx")
    flagged = quiet.withColumn(
        "new_island",
        F.when(
            F.lag("frame_idx").over(w).isNull()
            | (F.col("frame_idx") > F.lag("frame_idx").over(w) + 1),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    running = Window.partitionBy("media_id").orderBy("frame_idx").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        flagged.withColumn("island", F.sum("new_island").over(running))
        .groupBy("media_id", "island")
        .agg(
            F.min("frame_idx").cast("long").alias("span_start"),
            F.max("frame_idx").cast("long").alias("span_end"),
            F.count("*").cast("long").alias("n_frames"),
        )
        .drop("island")
        .orderBy("media_id", "span_start")
    )


ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("envelope", T.StringType(), True),
        T.StructField("decode_error", T.StringType(), True),
    ]
)


def audio_envelope(media: DataFrame) -> DataFrame:
    """m7c (part 1): per-clip ENERGY-ENVELOPE fingerprint — each
    160-sample frame's integer energy coarse-quantized to its
    bit_length (the integer floor(log2)+1, 0 for a silent frame) and
    the per-frame levels joined '-' in frame order. The audio analog
    of m6c's canonical aHash: loudness SHAPE survives, sample-level
    detail doesn't, and every step is integer-exact so the DuckDB
    oracle recomputes the fingerprint from the raw derivation
    (length(bin(energy)) == bit_length for energy > 0).

    Scale shape: mapInPandas where the blobs sit — decode, frame
    energies, and the fingerprint are all partition-local; output is
    ONE narrow row per clip."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            rows = []
            for mid, c in zip(pdf["media_id"], pdf["content"]):
                blob = None if c is None else bytes(c)
                samples, err = _parse_pcm(blob)
                if err is not None:
                    rows.append((int(mid), None, None, err))
                    continue
                # same partial-frame truncation as audio_frame_energy
                whole = len(samples) - len(samples) % AUDIO_FRAME
                frames = samples[:whole].astype(np.int64).reshape(-1, AUDIO_FRAME)
                energy = (frames * frames).sum(axis=1)
                env = "-".join(str(int(e).bit_length()) for e in energy)
                rows.append((int(mid), int(len(energy)), env, None))
            yield pd.DataFrame(
                rows, columns=["media_id", "n_frames", "envelope", "decode_error"]
            )

    return media.mapInPandas(batches, schema=ENVELOPE_SCHEMA)


def audio_duplicate_groups(media: DataFrame, min_group_size: int = 2) -> DataFrame:
    """m7c (part 2): perceptual audio duplicate groups — J2's shape on
    the envelope fingerprint, completing the modality symmetry (m6d
    groups images by canonical content hash; this groups clips whose
    loudness envelopes match level-for-level). One hash-shuffle on the
    fingerprint key over the O(clips) envelope table."""
    env = audio_envelope(media).filter(F.col("decode_error").isNull())
    return (
        env.groupBy("envelope")
        .agg(
            F.count("*").cast("long").alias("n_clips"),
            F.min("media_id").alias("canonical_media_id"),
        )
        .filter(F.col("n_clips") >= min_group_size)
        .orderBy("envelope")
    )


# ------------------------------------------------ video pillar

VID_MAGIC = b"VID1"
_VID_HEADER_FMT = "<III"  # n_frames, width, height (after magic)
_VID_HEADER_SIZE = struct.calcsize(_VID_HEADER_FMT)


def encode_video(width: int, height: int, frames: "list[bytes]") -> bytes:
    """Minimal raw-video container: magic + u32 (n_frames, w, h) LE +
    concatenated single-channel w*h rasters — the codec-free video
    analog of the PPM/PCM paths. (Format string, not a Struct object:
    Struct instances can't pickle into UDF closures.)"""
    return (
        VID_MAGIC
        + struct.pack(_VID_HEADER_FMT, len(frames), width, height)
        + b"".join(frames)
    )


def video_media_from_docs(docs: DataFrame) -> DataFrame:
    """m8 gate fixture: deterministic grayscale video derived from
    ``documents`` — ``6 + doc_id % 5`` frames of ``(4 + doc_id % 3) ×
    (3 + doc_id % 2)`` pixels, where SCENES change every 3 frames:
    frame f's pixel p is text byte ``((f//3)*31 + p) mod L``, so
    frames inside a scene are IDENTICAL and the inter-frame difference
    is zero except at scene cuts. Error classes: doc_id % 17 == 0 →
    NULL content; doc_id % 19 == 0 → wrong magic."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, types, blobs = [], [], []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                did = int(did)
                ids.append(did)
                types.append("video")
                if did % 17 == 0:
                    blobs.append(None)
                    continue
                if did % 19 == 0:
                    blobs.append(b"AVI? not a video")
                    continue
                raw = text.encode("utf-8") or b"\x00"
                L = len(raw)
                w, h, nf = 4 + did % 3, 3 + did % 2, 6 + did % 5
                frames = []
                for f in range(nf):
                    s = f // 3
                    frames.append(
                        bytes(raw[(s * 31 + p) % L] for p in range(w * h))
                    )
                blobs.append(encode_video(w, h, frames))
            yield pd.DataFrame({"media_id": ids, "media_type": types, "content": blobs})

    return docs.select("doc_id", "text").mapInPandas(batches, schema=MEDIA_SCHEMA)


SHOT_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), True),
        T.StructField("sad", T.LongType(), True),
        T.StructField("is_cut", T.BooleanType(), True),
        T.StructField("decode_error", T.StringType(), True),
    ]
)


def video_shot_boundaries(media: DataFrame, cut_threshold: int = 1) -> DataFrame:
    """m8: shot-boundary detection from DECODED frames — per
    consecutive-frame pair, the integer sum of absolute pixel
    differences (SAD) and a cut flag (``sad >= cut_threshold``). The
    temporal-structure operator the image/audio passes don't exercise;
    a video curation pipeline samples around exactly these cuts
    (keyframe extraction) or drops static spans.

    Pure integer arithmetic on decoded bytes → the oracle recomputes
    every SAD from the fixture derivation. Scale shape: one
    mapInPandas where the blobs sit (numpy vectorized diff over the
    frame stack), no shuffle; n_frames−1 narrow rows per clip; decode
    errors propagate as rows (D6)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            rows = []
            for mid, c in zip(pdf["media_id"], pdf["content"]):
                blob = None if c is None else bytes(c)
                if blob is None:
                    rows.append((int(mid), None, None, None, "null content"))
                    continue
                if not blob.startswith(VID_MAGIC):
                    rows.append((int(mid), None, None, None, "not VID1"))
                    continue
                if len(blob) < 4 + _VID_HEADER_SIZE:
                    rows.append((int(mid), None, None, None, "bad header"))
                    continue
                nf, w, h = struct.unpack_from(_VID_HEADER_FMT, blob, 4)
                need = nf * w * h
                payload = blob[4 + _VID_HEADER_SIZE :]
                if len(payload) < need or nf < 1:
                    rows.append((int(mid), None, None, None, "truncated payload"))
                    continue
                stack = (
                    np.frombuffer(payload[:need], dtype=np.uint8)
                    .astype(np.int64)
                    .reshape(nf, w * h)
                )
                sad = np.abs(np.diff(stack, axis=0)).sum(axis=1)
                rows.extend(
                    (int(mid), int(f + 1), int(s), bool(s >= cut_threshold), None)
                    for f, s in enumerate(sad)
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "frame_idx", "sad", "is_cut", "decode_error"],
            )

    return media.mapInPandas(batches, schema=SHOT_SCHEMA)


KEYFRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("scene_idx", T.IntegerType(), True),
        T.StructField("frame_idx", T.IntegerType(), True),
        T.StructField("frame_md5", T.StringType(), True),
    ]
)


def video_keyframes(media: DataFrame, cut_threshold: int = 1) -> DataFrame:
    """m8b: keyframe extraction — the FIRST frame of every shot (frame
    0 plus each detected cut), fingerprinted with md5 of its raster
    bytes. The consumer of m8's cut table: a video training pipeline
    stores exactly this row set (one representative frame per shot)
    instead of the full frame stack — the m3 frame-sampler keyed by
    temporal structure rather than a fixed stride.

    Cuts are recomputed from the decoded stack with the same SAD rule
    as :func:`video_shot_boundaries` (not assumed from the fixture's
    scene period), so the DuckDB oracle must agree bit-for-bit on
    which frames are shots AND on every fingerprint byte. Undecodable
    blobs are skipped (m8 carries their error rows). mapInPandas where
    the blobs sit; no shuffle before the presentation sort.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import numpy as np

        for pdf in it:
            rows = []
            for mid, c in zip(pdf["media_id"], pdf["content"]):
                blob = None if c is None else bytes(c)
                if blob is None or not blob.startswith(VID_MAGIC):
                    continue
                if len(blob) < 4 + _VID_HEADER_SIZE:
                    continue
                nf, w, h = struct.unpack_from(_VID_HEADER_FMT, blob, 4)
                need = nf * w * h
                payload = blob[4 + _VID_HEADER_SIZE :]
                if len(payload) < need or nf < 1:
                    continue
                stack = (
                    np.frombuffer(payload[:need], dtype=np.uint8)
                    .astype(np.int64)
                    .reshape(nf, w * h)
                )
                sad = np.abs(np.diff(stack, axis=0)).sum(axis=1)
                keyframes = [0] + [
                    int(f + 1) for f, s in enumerate(sad) if s >= cut_threshold
                ]
                for i, f in enumerate(keyframes):
                    raster = payload[f * w * h : (f + 1) * w * h]
                    rows.append(
                        (int(mid), i, f, hashlib.md5(raster).hexdigest())
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "scene_idx", "frame_idx", "frame_md5"]
            )

    return media.mapInPandas(batches, schema=KEYFRAME_SCHEMA).orderBy(
        "media_id", "scene_idx"
    )
