"""Multimodal plumbing: decode and frame-sample stages over the fake
media format (real codecs are stubbed; the Spark-side contract is what
these tests pin down)."""

from __future__ import annotations

import pytest

from file_indexer_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image/fake", mm.encode_fake_media(640, 480, 3, b"x" * 100)),
        (2, "image/fake", mm.encode_fake_media(32, 32, 1, b"")),
        (3, "video/fake", mm.encode_fake_media(16, 16, 3, b"abcdefgh" * 4)),  # 8 frames of 4B
        (4, "image/fake", b"\x01\x02"),  # truncated header
        (5, "image/fake", None),  # null content
    ]
    return spark.createDataFrame(rows, mm.MEDIA_SCHEMA)


def test_decode_media_schema_and_values(media):
    out = {r["media_id"]: r for r in mm.decode_media(media).collect()}
    assert len(out) == 5
    assert (out[1]["width"], out[1]["height"], out[1]["channels"]) == (640, 480, 3)
    assert out[1]["payload_bytes"] == 100
    assert out[1]["decode_error"] is None
    assert out[2]["payload_bytes"] == 0
    assert out[4]["decode_error"] == "truncated header"
    assert out[4]["width"] is None
    assert out[5]["decode_error"] == "null content"


def test_decode_is_distributed_not_collected(media):
    # mapInPandas keeps the declared schema through Catalyst
    df = mm.decode_media(media.repartition(4))
    assert [f.name for f in df.schema.fields] == [f.name for f in mm.DECODED_SCHEMA.fields]
    assert df.filter("decode_error IS NULL").count() == 3


def test_sample_frames_every_other(media):
    frames = mm.sample_frames(media.filter("media_id = 3"), frame_size=4, every_k=2).collect()
    # 32-byte payload / 4 = 8 frames, every 2nd => indices 0,2,4,6
    assert [r["frame_index"] for r in sorted(frames, key=lambda r: r["frame_index"])] == [0, 2, 4, 6]
    by_idx = {r["frame_index"]: bytes(r["frame"]) for r in frames}
    assert by_idx[0] == b"abcd"
    assert by_idx[2] == b"abcd"  # payload repeats every 8 bytes


def test_real_decoder_is_gated():
    import file_indexer_spark.operators.multimodal as m

    with pytest.raises(NotImplementedError):
        m.decode_image_real(None)
